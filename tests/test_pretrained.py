"""ImageNet warm-start mechanics (models/pretrained.py): the offline-
testable half of the networked parity kit. The reference always starts
from official checkpoints (MT4MTLKD/Spatial_transformer/models/
backbone.py:26-41); here a synthetic torch resnet18 .pth flows through
resolve -> convert -> merge into a live train state."""

import os
import sys

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_convert import TorchResNet18  # noqa: E402 (torchvision-layout twin)

from computervision_codes_tpu.models.pretrained import (
    PTDICT,
    load_backbone_variables,
    resolve_checkpoint,
    warm_start_backbone,
    _merge,
)
from computervision_codes_tpu.models.spatial_cnn import SpatialCNN
from computervision_codes_tpu.train import build_sgd
from computervision_codes_tpu.train.trainer import create_train_state


@pytest.fixture(scope="module")
def resnet18_pth(tmp_path_factory):
    tm = TorchResNet18()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    root = tmp_path_factory.mktemp("pretrain")
    path = str(root / PTDICT["resnet18"])
    torch.save(tm.state_dict(), path)
    return str(root), path


def test_resolve_checkpoint_dir_and_file(resnet18_pth):
    root, path = resnet18_pth
    assert resolve_checkpoint("resnet18", root) == path
    assert resolve_checkpoint("resnet18", path) == path
    with pytest.raises(FileNotFoundError) as e:
        resolve_checkpoint("resnet18", path + ".missing")
    assert "download.pytorch.org" in str(e.value)  # fetch hint


def test_warm_start_spatial_cnn(resnet18_pth):
    _, path = resnet18_pth
    model = SpatialCNN(network="resnet18", loss_type="ivt")
    img = jnp.zeros((1, 32, 56, 3), jnp.float32)
    state = create_train_state(model, build_sgd(1e-2), jax.random.PRNGKey(0),
                               (img,))
    logs = []
    new = warm_start_backbone(state, "resnet18", path, log=logs.append)

    want = load_backbone_variables("resnet18", path)
    got = new.params["backbone"]["conv1"]["kernel"]
    np.testing.assert_array_equal(np.asarray(got),
                                  want["params"]["conv1"]["kernel"])
    # BN running stats landed in the live batch_stats collection
    np.testing.assert_array_equal(
        np.asarray(new.batch_stats["backbone"]["bn1"]["mean"]),
        want["batch_stats"]["bn1"]["mean"])
    # non-backbone params untouched, ImageNet fc head skipped
    head = [k for k in new.params if k != "backbone"]
    for k in head:
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(new.params[k])[0]),
            np.asarray(jax.tree.leaves(state.params[k])[0]))
    assert logs and "tensors loaded" in logs[0]


def test_merge_rejects_shape_mismatch():
    dst = {"a": {"w": np.zeros((2, 3))}}
    with pytest.raises(ValueError, match="shape mismatch"):
        _merge(dst, {"a": {"w": np.zeros((3, 2))}})


def test_merge_skips_unknown_keys():
    dst = {"a": {"w": np.zeros(2)}}
    merged, loaded, skipped = _merge(dst, {"a": {"w": np.ones(2)},
                                           "head": {"k": np.ones(1)}})
    assert loaded == ["/a/w"] and skipped == ["/head"]
    np.testing.assert_array_equal(merged["a"]["w"], 1.0)


def test_warm_start_frozen_bn_q2l(resnet18_pth):
    """The Q2L teacher's ResNet backbone uses FrozenBatchNorm (a 'frozen'
    collection): warm start must auto-detect it and land BN affine+stats
    there instead of batch_stats."""
    from computervision_codes_tpu.models.q2l import Q2L

    _, path = resnet18_pth
    model = Q2L(backbone="resnet18", loss_type="i", teacher_dim=24)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    state = create_train_state(model, build_sgd(1e-2),
                               jax.random.PRNGKey(0), (img,))
    assert state.frozen and "backbone" in state.frozen
    new = warm_start_backbone(state, "resnet18", path, log=lambda m: None)

    from computervision_codes_tpu.models.pretrained import (
        load_backbone_variables)

    want = load_backbone_variables("resnet18", path, frozen_bn=True)
    np.testing.assert_array_equal(
        np.asarray(new.frozen["backbone"]["bn1"]["mean"]),
        want["frozen"]["bn1"]["mean"])
    np.testing.assert_array_equal(
        np.asarray(new.params["backbone"]["conv1"]["kernel"]),
        want["params"]["conv1"]["kernel"])
    # transformer params untouched
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(new.params["transformer"])[0]),
        np.asarray(jax.tree.leaves(state.params["transformer"])[0]))
