"""TERL tail-enhanced MoCo: query/key encoders, CAM heads, contrastive queue.

Re-design of TERL/6_baseline_learnT/models/moco.py (:85-405) for XLA:

  * the key encoder is NOT a second module — the same ``MoCoEncoder`` is
    applied with an EMA copy of the query parameters carried in train state
    (functional momentum update, reference :156-173);
  * the queue + 4 label queues + pointer + class prototypes are an explicit
    ``MoCoQueue`` pytree threaded through the train step (reference device
    buffers :137-149);
  * ``valid_q`` (reference :284-292) selects (sample, positive-tail-triplet)
    anchors with data-dependent ``torch.where`` and runs the disentangle
    conv over ALL 100 cam channels before indexing. Here anchors are
    padded to a fixed count with a validity mask (host-side selection,
    static shapes) and the disentangle conv runs ONLY on gathered anchors —
    identical math, ~100x less compute;
  * batch-shuffle BN (reference :223-270) is a no-op: the reference stubs
    it to gpu_idx=0 (identity) and Swin has no BatchNorm; under a sharded
    ``data`` axis the leakage it guards against does not exist;
  * ``concat_all_gather`` (reference :409-421, stubbed to identity) becomes
    a real ``jax.lax.all_gather`` over the data axis when the train step
    runs under shard_map — see parallel/mesh.py.

The head/tail split heads (--ht, reference :111-118,272-282) are supported
via ``ht_masks``.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import struct

from ..data import bank as bank_mod
from .swin import VARIANTS as SWIN_VARIANTS, SwinTransformer, swin_feature_dim

TASK_SIZES = {"i": 6, "v": 10, "t": 15, "ivt": 100}


class MoCoEncoder(nn.Module):
    """Swin backbone + (optionally MLP) projection head + CAM heads."""

    backbone: str = "swin_T_224_1k"
    moco_dim: int = 128
    mlp: bool = True
    ht: bool = False
    drop_rate: float = 0.0
    num_triplet: int = 100  # 100 - len(drop_classes) under --drop_classes
    fused_train: bool = False  # Pallas-forward/reference-backward Swin
    # train path (ops/swin_train; blocks self-gate on dropout == 0)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False,
                 ht_masks: Optional[Dict[str, Tuple]] = None) -> Dict:
        bb = SwinTransformer(num_classes=0, dropout=self.drop_rate,
                             fused_train=self.fused_train,
                             dtype=self.dtype, name="backbone",
                             **SWIN_VARIANTS[self.backbone])
        out = bb(images, train=train)
        fmap = out["feature_map"]  # (B, h, w, C)
        pooled = out["pooled"]

        # projection head (reference keeps the swin head at moco_dim;
        # --mlp replaces it with a 2-layer MLP)
        x = pooled
        if self.mlp:
            x = nn.Dense(pooled.shape[-1], dtype=self.dtype, name="mlp_fc1")(x)
            x = nn.relu(x)
        mlp_feat = nn.Dense(self.moco_dim, dtype=self.dtype, name="head")(x)

        sizes = dict(TASK_SIZES, ivt=self.num_triplet)
        cams, logits = {}, {}
        for task, width in sizes.items():
            if self.ht:
                cam_h = nn.Conv(width, (1, 1), dtype=self.dtype,
                                name=f"cam_{task}_head")(fmap)
                cam_t = nn.Conv(width, (1, 1), dtype=self.dtype,
                                name=f"cam_{task}_tail")(fmap)
                hm = jnp.asarray(ht_masks[task][0], self.dtype)
                tm = jnp.asarray(ht_masks[task][1], self.dtype)
                cam = cam_h * hm + cam_t * tm
                logit = jnp.mean(cam_h, axis=(1, 2)) * hm + \
                    jnp.mean(cam_t, axis=(1, 2)) * tm
            else:
                cam = nn.Conv(width, (1, 1), dtype=self.dtype,
                              name=f"cam_{task}")(fmap)
                logit = jnp.mean(cam, axis=(1, 2))
            cams[task] = cam
            logits[task] = logit

        return {"fmap": fmap, "feature": pooled, "mlp_feat": mlp_feat,
                "cams": cams, "logits": logits}


class CamDisentangle(nn.Module):
    """1x1 conv over concat(fmap, one CAM channel) (reference cam_disen)."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, fmap: jnp.ndarray, cam_slice: jnp.ndarray) -> jnp.ndarray:
        x = jnp.concatenate([fmap, cam_slice[..., None]], axis=-1)
        return nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                       name="conv")(x)


def select_tail_anchors(tail_labels: np.ndarray, max_anchors: int
                        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side static-shape anchor selection.

    tail_labels (B, 100) multi-hot tail-triplet labels. Returns
    (sample_idx (A,), class_idx (A,), valid (A,)) padded to max_anchors —
    the reference's ``torch.where(labels[0] == 1)`` (moco.py:285).
    """
    b_idx, c_idx = np.nonzero(tail_labels)
    n = min(len(b_idx), max_anchors)
    sample = np.zeros(max_anchors, np.int32)
    cls = np.zeros(max_anchors, np.int32)
    valid = np.zeros(max_anchors, np.float32)
    sample[:n] = b_idx[:n]
    cls[:n] = c_idx[:n]
    valid[:n] = 1.0
    return sample, cls, valid


def anchor_features(disen: CamDisentangle, disen_params, enc_out: Dict,
                    sample_idx: jnp.ndarray, class_idx: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Disentangled features for (sample, tail-class) anchors.

    Returns (pooled (A, C), maps (A, h, w, C)) — the maps feed the cam_ivt
    head for the tail-CE loss (reference moco.py:361 ``y_tail``).
    """
    fmap = enc_out["fmap"][sample_idx]  # (A, h, w, C)
    cam = enc_out["cams"]["ivt"]
    cam_slice = cam[sample_idx, :, :, :][
        jnp.arange(sample_idx.shape[0]), :, :, class_idx]  # (A, h, w)
    maps = disen.apply(disen_params, fmap, cam_slice)
    return jnp.mean(maps, axis=(1, 2)), maps


class TERLModel(nn.Module):
    """Query-path assembly: MoCoEncoder + CamDisentangle in one param tree.

    The key path applies THIS SAME module with an EMA copy of the params
    (carried in the train state), so encoder_k and cam_disen_k (reference
    :131-135) are simply the EMA tree — no duplicate module definitions.
    """

    backbone: str = "swin_T_224_1k"
    moco_dim: int = 128
    mlp: bool = True
    ht: bool = False
    drop_rate: float = 0.0
    num_triplet: int = 100
    fused_train: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = MoCoEncoder(self.backbone, self.moco_dim, self.mlp,
                                   self.ht, self.drop_rate, self.num_triplet,
                                   self.fused_train, self.dtype)
        self.disen = CamDisentangle(swin_feature_dim(self.backbone)
                                    if self.backbone in SWIN_VARIANTS else 512,
                                    self.dtype)

    def __call__(self, images, train: bool = False, ht_masks=None):
        return self.encoder(images, train=train, ht_masks=ht_masks)

    def encode(self, images, train: bool = False, ht_masks=None):
        return self.encoder(images, train=train, ht_masks=ht_masks)

    def disentangle(self, enc_out, sample_idx, class_idx):
        """(A,) anchor gather -> (pooled (A, C), maps (A, h, w, C)).

        The caller computes y_tail from the maps via ``apply_cam_ivt`` with
        the encoder's cam_ivt parameters (reference moco.py:361).
        """
        fmap = enc_out["fmap"][sample_idx]
        cam = enc_out["cams"]["ivt"]
        cam_slice = cam[sample_idx, :, :, :][
            jnp.arange(sample_idx.shape[0]), :, :, class_idx]
        maps = self.disen(fmap, cam_slice)
        return jnp.mean(maps, axis=(1, 2)), maps


def apply_cam_ivt(encoder_params, maps: jnp.ndarray,
                  ht_mask=None) -> jnp.ndarray:
    """Apply the encoder's cam_ivt 1x1 conv to anchor maps -> (A, n_ivt).

    Under --ht there is no single cam_ivt head (NOTE: the reference's y_tail
    also calls self.cam_ivt in ht mode, moco.py:361, which does not exist
    there — --ht + --mlp would crash the reference); here the head/tail
    convs are combined with the class masks like the forward path.
    """
    if "cam_ivt" in encoder_params:
        width = encoder_params["cam_ivt"]["kernel"].shape[-1]
        out = nn.Conv(width, (1, 1)).apply(
            {"params": encoder_params["cam_ivt"]}, maps)
        return jnp.mean(out, axis=(1, 2))
    hm, tm = ht_mask
    width = encoder_params["cam_ivt_head"]["kernel"].shape[-1]
    conv = nn.Conv(width, (1, 1))
    out_h = conv.apply({"params": encoder_params["cam_ivt_head"]}, maps)
    out_t = conv.apply({"params": encoder_params["cam_ivt_tail"]}, maps)
    return (jnp.mean(out_h, axis=(1, 2)) * jnp.asarray(hm)
            + jnp.mean(out_t, axis=(1, 2)) * jnp.asarray(tm))


# ---------------------------------------------------------------------------
# Functional queue state
# ---------------------------------------------------------------------------

@struct.dataclass
class MoCoQueue:
    feats: jnp.ndarray      # (K, dim) L2-normalized keys
    l_ivt: jnp.ndarray      # (K,) int32 tail triplet class ids
    l_i: jnp.ndarray        # (K,) int32
    l_v: jnp.ndarray
    l_t: jnp.ndarray
    ptr: jnp.ndarray        # () int32
    proto_i: jnp.ndarray    # (6, dim)
    proto_v: jnp.ndarray    # (10, dim)
    proto_t: jnp.ndarray    # (15, dim)


def init_queue(rng: jax.Array, k: int, dim: int) -> MoCoQueue:
    r1, r2, r3, r4 = jax.random.split(rng, 4)
    feats = jax.random.normal(r1, (k, dim))
    feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

    def zeros():  # distinct buffers — a shared one breaks donation
        return jnp.zeros(k, jnp.int32)

    return MoCoQueue(
        feats=feats, l_ivt=zeros(), l_i=zeros(), l_v=zeros(), l_t=zeros(),
        ptr=jnp.zeros((), jnp.int32),
        proto_i=jax.random.uniform(r2, (6, dim)),
        proto_v=jax.random.uniform(r3, (10, dim)),
        proto_t=jax.random.uniform(r4, (15, dim)),
    )


def enqueue(queue: MoCoQueue, keys: jnp.ndarray, lab_ivt: jnp.ndarray,
            valid: jnp.ndarray) -> MoCoQueue:
    """Ring-buffer write of valid anchors (reference :176-221 semantics:
    truncate at the end of the buffer, pointer wraps after)."""
    bank = jnp.asarray(bank_mod.load_bank(), jnp.int32)
    k = queue.feats.shape[0]
    order = jnp.cumsum(valid.astype(jnp.int32)) - 1  # rank among valid
    pos = queue.ptr + order
    ok = (valid > 0) & (pos < k)
    pos = jnp.where(ok, pos, k)  # out-of-bounds -> dropped by mode='drop'
    new_feats = queue.feats.at[pos].set(keys, mode="drop")
    n = jnp.sum(ok.astype(jnp.int32))
    return queue.replace(
        feats=new_feats,
        l_ivt=queue.l_ivt.at[pos].set(lab_ivt, mode="drop"),
        l_i=queue.l_i.at[pos].set(bank[lab_ivt, 1], mode="drop"),
        l_v=queue.l_v.at[pos].set(bank[lab_ivt, 2], mode="drop"),
        l_t=queue.l_t.at[pos].set(bank[lab_ivt, 3], mode="drop"),
        ptr=(queue.ptr + n) % k,
    )


def update_prototypes(queue: MoCoQueue) -> MoCoQueue:
    """Per-class queue means; keep the previous prototype for empty classes
    (reference :348-359)."""

    def protos(labels, num_class, prev):
        onehot = jax.nn.one_hot(labels, num_class)  # (K, C)
        counts = onehot.sum(axis=0)  # (C,)
        sums = onehot.T @ queue.feats  # (C, dim)
        mean = sums / jnp.maximum(counts[:, None], 1.0)
        return jnp.where(counts[:, None] > 0, mean, prev)

    return queue.replace(
        proto_i=protos(queue.l_i, 6, queue.proto_i),
        proto_v=protos(queue.l_v, 10, queue.proto_v),
        proto_t=protos(queue.l_t, 15, queue.proto_t),
    )


def moco_logits(q: jnp.ndarray, k: jnp.ndarray,
                queue: MoCoQueue) -> jnp.ndarray:
    """(A, 1+K): positive-pair column then queue negatives (reference :380-383)."""
    l_pos = jnp.sum(q * k, axis=-1, keepdims=True)
    l_neg = q @ queue.feats.T
    return jnp.concatenate([l_pos, l_neg], axis=-1)


def prototype_logits(feats: jnp.ndarray, queue: MoCoQueue) -> Dict[str, jnp.ndarray]:
    return {"i": feats @ queue.proto_i.T,
            "v": feats @ queue.proto_v.T,
            "t": feats @ queue.proto_t.T}


def l2_normalize(x: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    """Gradient-safe L2 normalize (torch F.normalize parity at |x| >> eps).

    torch's eps=1e-12 floor makes the backward pass scale like 1/eps for
    near-zero vectors: with a from-scratch CAM-disentangle the anchor
    features CAN be near zero, and the resulting ~1e12 gradient explodes
    training to NaN within a step (observed on synthetic data,
    scripts/terl_efficacy.py; the reference never trips this because it
    always starts from pretrained backbones). The squared-norm floor keeps
    the gradient bounded by 1/eps with a sane eps while being exactly
    x/|x| whenever |x| >= eps."""
    sq = jnp.sum(jnp.square(x), axis=-1, keepdims=True)
    return x / jnp.sqrt(jnp.maximum(sq, eps * eps))


def momentum_update(params_q, params_k, m: float):
    """EMA of the key parameters (reference :156-173)."""
    return jax.tree.map(lambda kp, qp: kp * m + qp * (1.0 - m),
                        params_k, params_q)


def queue_positive_mask(anchor_labels: jnp.ndarray,
                        queue_labels: jnp.ndarray) -> jnp.ndarray:
    """(A, K) 0/1 mask of queue entries sharing the anchor's class id
    (the KCL ``torch.eq(labels, queue_label)`` broadcast, loss.py:92)."""
    return (anchor_labels[:, None] == queue_labels[None, :]).astype(jnp.float32)
