"""TERL tail-enhanced contrastive training step (one jitted graph).

Re-design of the TERL/6_baseline_learnT/run.py train_loop (:234-383) +
MoCo.forward (models/moco.py:310-405) as a single pure step:

  loss = loss_cls_ivt + loss_cls1                     (ASL direct + comp-max)
       + w_con   * KCL(moco logits vs queue labels)
       + w_proto * ASL(prototype logits vs one-hot component labels)
       + w_tail  * ASL(y_tail vs one-hot tail triplet)        [post-warmup]
  warmup (epoch < w_epoch): loss = loss_cls1 + w_con * KCL

XLA notes:
  * anchors (positive tail-triplet occurrences) are padded to a fixed count
    with a validity mask computed on host (models/moco.select_tail_anchors);
    the reference `continue`s on batches with no tails (run.py:249-251) —
    here the masked losses are exactly 0 for empty batches, same math;
  * the key encoder/disentangle are the EMA parameter tree in the state;
  * queue/prototype updates are functional state transitions.

Deviation (documented): the reference computes the key anchors' CAM slice
from the QUERY image's feature map (moco.py:371 uses ``src[0]`` not
``src_k[0]`` — an apparent bug); here the key path consistently uses the
key feature map.
"""

from __future__ import annotations

import functools

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import struct
from flax.training import train_state

from ..data import bank as bank_mod
from ..losses.asl import asymmetric_loss
from ..losses.kcl import kcl_loss
from ..models import moco as moco_mod
from ..models.moco import MoCoQueue, TERLModel


class TERLTrainState(train_state.TrainState):
    key_params: Any = None
    queue: MoCoQueue = None
    rng: jax.Array = struct.field(default=None)

    def next_rng(self):
        new, step = jax.random.split(self.rng)
        return self.replace(rng=new), step


def create_terl_state(model: TERLModel, tx, rng, example_images,
                      queue_size: int = 16384,
                      ht_masks=None) -> TERLTrainState:
    from ..models.swin import swin_feature_dim

    # the queue stores pooled disentangled features (backbone channels) —
    # the reference runs with moco_dim == num_channels (runT.sh: SwinT dim
    # 768, SwinB dim 1024)
    want = swin_feature_dim(model.backbone)
    if model.moco_dim != want:
        raise ValueError(f"moco_dim must equal the backbone feature dim "
                         f"({want} for {model.backbone}), got {model.moco_dim}")
    variables = model.init(rng, example_images,
                           ht_masks=ht_masks)  # encoder params
    enc_out = model.apply(variables, example_images, ht_masks=ht_masks,
                          method=TERLModel.encode)
    v2 = model.init(rng, enc_out, jnp.zeros(1, jnp.int32),
                    jnp.zeros(1, jnp.int32), method=TERLModel.disentangle)
    params = {**variables["params"], **v2["params"]}
    queue = moco_mod.init_queue(jax.random.fold_in(rng, 7),
                                queue_size, model.moco_dim)
    return TERLTrainState.create(
        apply_fn=model.apply, params=params, tx=tx,
        # a REAL copy: key_params must not alias params (donation would see
        # the same buffer twice; EMA must also not mutate through aliasing)
        key_params=jax.tree.map(lambda x: jnp.array(x, copy=True), params),
        queue=queue, rng=jax.random.fold_in(rng, 3))


def make_terl_train_step(model: TERLModel, w_con: float = 1.0,
                         w_proto: float = 1.0, w_tail: float = 1.0,
                         w_epoch: int = 1, moco_m: float = 0.999,
                         moco_t: float = 0.07, kcl_k: int = 7,
                         use_mlp: bool = True, ht_masks=None,
                         class_map=None, sam_rho: float = 0.0):
    """Returns step(state, batch, epoch) -> (state, metrics).

    batch: image1/image2 (B,H,W,3), label_{i,v,t,ivt} (B,C),
    tail_ivt (B,100), anchor_sample/anchor_class (A,), anchor_valid (A,).

    ``class_map`` (V,) maps remapped triplet ids back to original 100-space
    ids when training with --drop_classes (reference run.py:208-211); the
    queue stores ORIGINAL ids so KCL positive masks stay consistent.

    ``sam_rho`` > 0 swaps plain backprop for two-step SAM gradients
    (train/optim.py; the reference ships the wrapper in imbsam.py:5-41
    but never drives it) — the queue enqueue uses the key features from
    the perturbed second pass, which is the same data either way since
    the key path is EMA-parameterized and stop-gradiented.
    """
    import numpy as np

    from .optim import sam_gradients

    from ..data.bank import component_projection

    n_ivt = model.num_triplet
    cm_np = np.arange(100) if class_map is None else np.asarray(class_map)
    # component projections restricted to the surviving triplet rows
    projs = {k: jnp.asarray(component_projection(k)[cm_np])
             for k in ("i", "v", "t")}
    class_map = jnp.asarray(cm_np, jnp.int32)
    asl = lambda lg, tg, w=None: asymmetric_loss(  # TERL ASL config
        lg, tg, gamma_neg=2, gamma_pos=0, clip=0, eps=1e-5,
        reduction="mean_terl", sample_weight=w)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TERLTrainState, batch: Dict, epoch: jnp.ndarray):
        state, rng = state.next_rng()
        drop_rng, kcl_rng = jax.random.split(rng)
        queue = moco_mod.update_prototypes(state.queue)
        s_idx = batch["anchor_sample"]
        c_idx = batch["anchor_class"]
        valid = batch["anchor_valid"]
        bank = jnp.asarray(bank_mod.load_bank(), jnp.int32)

        def loss_fn(params):
            enc_out = state.apply_fn(
                {"params": params}, batch["image1"], train=True,
                ht_masks=ht_masks, method=TERLModel.encode,
                rngs={"dropout": drop_rng})
            logits = enc_out["logits"]

            # direct heads (ASL over i/v/t)
            loss_cls1 = sum(asl(logits[k], batch[f"label_{k}"])
                            for k in ("i", "v", "t"))
            # component-max ivt -> i/v/t + direct ivt (remap-aware)
            comp = {
                k: jnp.max(jnp.where(projs[k] > 0,
                                     logits["ivt"][..., None], -jnp.inf),
                           axis=-2)
                for k in ("i", "v", "t")
            }
            loss_cls_ivt = sum(asl(comp[k], batch[f"label_{k}"])
                               for k in ("i", "v", "t"))
            loss_cls_ivt = loss_cls_ivt + asl(logits["ivt"],
                                              batch["label_ivt"])

            metrics = {"loss_cls1": loss_cls1, "loss_cls_ivt": loss_cls_ivt}
            if not use_mlp:
                total = loss_cls1 + loss_cls_ivt
                metrics["loss"] = total
                return total, (metrics, None)

            # query anchors
            q_pooled, q_maps = state.apply_fn(
                {"params": params}, enc_out, s_idx, c_idx,
                method=TERLModel.disentangle)
            y_tail = moco_mod.apply_cam_ivt(
                params["encoder"], q_maps,
                ht_mask=ht_masks["ivt"] if ht_masks else None)
            q = moco_mod.l2_normalize(q_pooled)

            # key anchors (EMA params, stop-gradient)
            k_enc = state.apply_fn(
                {"params": state.key_params}, batch["image2"], train=False,
                ht_masks=ht_masks, method=TERLModel.encode)
            k_pooled, _ = state.apply_fn(
                {"params": state.key_params}, k_enc, s_idx, c_idx,
                method=TERLModel.disentangle)
            k_pooled = jax.lax.stop_gradient(k_pooled)
            k = moco_mod.l2_normalize(k_pooled)

            lab_ivt = class_map[c_idx]  # original 100-space ids
            cl = moco_mod.moco_logits(q, k, queue)
            pos_mask = moco_mod.queue_positive_mask(lab_ivt, queue.l_ivt)
            loss_con = kcl_loss(kcl_rng, cl, pos_mask, k=kcl_k,
                                temperature=moco_t, anchor_valid=valid)

            # prototype CE over stacked (q, k) anchors
            both = jnp.concatenate([q_pooled, k_pooled], axis=0)
            both_valid = jnp.concatenate([valid, valid], axis=0)
            pl = moco_mod.prototype_logits(both, queue)
            lab2 = jnp.concatenate([lab_ivt, lab_ivt], axis=0)
            loss_proto = sum(
                asl(pl[t], jax.nn.one_hot(bank[lab2, col], pl[t].shape[-1]),
                    both_valid)
                for t, col in (("i", 1), ("v", 2), ("t", 3)))

            # y_tail lives in the (possibly remapped) head space
            loss_tail = asl(y_tail, jax.nn.one_hot(c_idx, n_ivt), valid)

            warm = loss_cls1 + w_con * loss_con
            full = (loss_cls1 + loss_cls_ivt + w_con * loss_con +
                    w_proto * loss_proto + w_tail * loss_tail)
            total = jnp.where(epoch < w_epoch, warm, full)
            metrics.update(loss_con=loss_con, loss_proto=loss_proto,
                           loss_tail=loss_tail, loss=total)
            return total, (metrics, (k, lab_ivt, valid))

        if sam_rho > 0:
            grads, (metrics, enq) = sam_gradients(
                loss_fn, state.params, rho=sam_rho, has_aux=True)
        else:
            grads, (metrics, enq) = jax.grad(
                loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        # momentum update + enqueue AFTER the optimizer step
        new_key = moco_mod.momentum_update(state.params, state.key_params,
                                           moco_m)
        if enq is not None:
            k, lab_ivt, valid = enq
            queue = moco_mod.enqueue(queue, k, lab_ivt, valid)
        state = state.replace(key_params=new_key, queue=queue)
        return state, metrics

    return step


def make_terl_eval_step(model: TERLModel, ht_masks=None):
    @jax.jit
    def step(state: TERLTrainState, images):
        enc_out = model.apply({"params": state.params}, images,
                              train=False, ht_masks=ht_masks,
                              method=TERLModel.encode)
        probs = {k: jax.nn.sigmoid(v) for k, v in enc_out["logits"].items()}
        return probs, enc_out["feature"]

    return step
