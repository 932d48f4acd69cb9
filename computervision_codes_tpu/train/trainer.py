"""Jitted train/eval step factories for the framework's training tracks.

One generic trainer replaces the reference's six copy-pasted driver loops
(SURVEY.md §1 L5). Each factory closes over a model + config and returns
pure (state, batch) -> (state, metrics) functions suitable for jit/pjit;
the CLI drivers own the epoch/evaluation loop, metrics, and checkpoints.

Loss parity notes:
  * spatial step = reference Spatial_cnn/run.py:145-224 loss mix
    (loss_type branches; for 'all': rates[0]*hard + rates[1]*softKL +
    rates[2]*mseKD with sigmoid-activated teacher preds);
  * tcn step = Temporal_tenco/run.py:182-235 (FPN fusion loss).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..losses import (
    bce_with_logits,
    distill_kl,
    mse_feature_kd,
    tcn_multitask_loss,
)
from .state import TrainState


def create_train_state(model, optimizer, rng, example_inputs,
                       init_kwargs=None) -> TrainState:
    init_kwargs = init_kwargs or {}
    variables = model.init(rng, *example_inputs, **init_kwargs)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=optimizer,
        batch_stats=variables.get("batch_stats"),
        frozen=variables.get("frozen"),
        rng=jax.random.fold_in(rng, 1),
    )


def count_params(params) -> int:
    """Total parameter count (reference 'Total params %.2fM', run.py:506)."""
    return sum(int(np.prod(p.shape)) if hasattr(p, "shape") else 0
               for p in jax.tree.leaves(params))


# ---------------------------------------------------------------------------
# Spatial (frame-level) track
# ---------------------------------------------------------------------------

def make_spatial_train_step(model, loss_type: str = "all",
                            rates: Sequence[float] = (1.0, 0.0, 0.1),
                            temperature: float = 4.0,
                            pos_weights: Optional[Dict[str, Any]] = None,
                            sam_rho: float = 0.0, qat: bool = False):
    """``sam_rho`` > 0 computes the gradient with two-step SAM
    (train/optim.py:sam_gradients) instead of plain backprop — the
    ascent-perturbed second pass re-runs the same loss_fn, so BN moments
    come from the perturbed evaluation (the reference's SAM wrapper,
    imbsam.py:5-41, behaves the same: the second backward recomputes BN).

    ``qat`` trains through weight fake-quant (models/qat.py): the forward
    sees the int8 quantize->dequantize image of every backbone conv
    kernel (the exact serving-PTQ policy) with straight-through
    gradients — after training, int8 serving reproduces the train-time
    forward's weights exactly."""
    from .optim import sam_gradients

    pos_weights = pos_weights or {}

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        state, rng = state.next_rng()

        def loss_fn(params):
            if qat:
                from ..models.qat import qat_params

                params = qat_params(params)
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            if state.frozen is not None:
                variables["frozen"] = state.frozen
            out, mutated = state.apply_fn(
                variables,
                batch["image"],
                batch.get("teacher_feat_i"),
                batch.get("teacher_feat_v"),
                batch.get("teacher_feat_t"),
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            logits = out["logits"]
            hard = {
                k: bce_with_logits(logits[k], batch[f"label_{k}"],
                                   pos_weight=pos_weights.get(k))
                for k in ("i", "v", "t", "ivt")
            }
            metrics = {f"hard_loss_{k}": v for k, v in hard.items()}
            if loss_type in ("i", "v", "t", "ivt"):
                loss = hard[loss_type]
            else:  # 'all': multi-teacher KD mix (Spatial_cnn/run.py:155-192)
                hard_loss = hard["i"] + hard["v"] + hard["t"] + hard["ivt"]
                loss = rates[0] * hard_loss
                metrics.update(hard_loss=hard_loss)
                # zero-rate terms are skipped at TRACE time: a no-KD run
                # (--rates 1 0 0) never touches the teacher tensors, so it
                # costs nothing and — unlike the reference, where
                # 0 * loss still backprops — cannot be poisoned by a
                # non-finite teacher artifact (0 * nan = nan)
                if rates[1]:
                    soft = sum(
                        distill_kl(logits[k],
                                   jax.nn.sigmoid(batch[f"teacher_pred_{k}"]),
                                   temperature)
                        for k in ("i", "v", "t")
                    ) / 3.0
                    loss = loss + rates[1] * soft
                    metrics.update(soft_loss=soft)
                if rates[2]:
                    kd = sum(
                        mse_feature_kd(out["kd"][k],
                                       batch[f"teacher_feat_{k}"])
                        for k in ("i", "v", "t")
                    ) / 3.0
                    loss = loss + rates[2] * kd
                    metrics.update(kd_loss=kd)
            metrics["loss"] = loss
            return loss, (metrics, mutated)

        if sam_rho > 0:
            grads, (metrics, mutated) = sam_gradients(
                loss_fn, state.params, rho=sam_rho, has_aux=True)
        else:
            grads, (metrics, mutated) = jax.grad(
                loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(
            grads=grads, batch_stats=mutated.get("batch_stats"))
        return state, metrics

    return step


def make_spatial_eval_step(model, qat: bool = False):
    # apply through the MODEL ARGUMENT, not state.apply_fn — the state
    # binds the TRAIN model's apply, and eval may use a differently
    # configured twin of the same param tree (e.g. Q2L(quant_eval=True)
    # behind the driver's --quant_eval). ``qat`` evaluates the fake-quant
    # weights — the model that will actually be served.
    @jax.jit
    def step(state: TrainState, images: jnp.ndarray):
        variables = state.variables()
        if qat:
            from ..models.qat import qat_params

            variables = dict(variables, params=qat_params(
                variables["params"]))
        out = model.apply(variables, images, train=False)
        probs = {k: jax.nn.sigmoid(v) for k, v in out["logits"].items()}
        return probs, out["feature"]

    return step


# ---------------------------------------------------------------------------
# Temporal TCN track
# ---------------------------------------------------------------------------

def make_tcn_train_step(model, comp_weight: float = 0.1,
                        pos_weights: Optional[Dict] = None,
                        apply_mask: bool = True):
    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        state, rng = state.next_rng()

        def loss_fn(params):
            out = state.apply_fn({"params": params}, batch["features"],
                                 train=True, apply_mask=apply_mask,
                                 rngs={"dropout": rng})
            labels = {k: batch[f"label_{k}"] for k in ("ivt", "i", "v", "t")}
            parts = tcn_multitask_loss(out, labels, comp_weight=comp_weight,
                                       pos_weights=pos_weights,
                                       frame_mask=batch.get("frame_mask"))
            return parts["total"], parts

        grads, parts = jax.grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        return state, {f"loss_{k}": v for k, v in parts.items()}

    return step


def make_tcn_eval_step(model):
    @jax.jit
    def step(state: TrainState, features: jnp.ndarray):
        out = model.apply({"params": state.params}, features, train=False)
        # reference eval uses pyramid level 0 (Temporal_tenco/run.py:252-264)
        return {k: jax.nn.sigmoid(out[k][0]) for k in ("ivt", "i", "v", "t")}

    return step
