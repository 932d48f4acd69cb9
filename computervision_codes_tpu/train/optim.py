"""Optimizers: torch-parity SGD and sharpness-aware (SAM / ImbSAM) steps.

* ``build_sgd``: optax chain matching torch.optim.SGD(lr, momentum,
  weight_decay) — L2 decay added to the gradient before momentum
  (MT4MTLKD/Spatial_cnn/run.py:344).
* ``sam_gradients`` / ``imbsam_gradients``: functional re-design of the
  reference's in-place two/three-step SAM wrappers
  (TERL/6_baseline_learnT/imbsam.py:5-41 SAM, :49-96 ImbSAM). Instead of
  mutating parameters between backward passes, each variant computes the
  final gradient with pure function evaluations at perturbed parameters —
  one jitted graph, no optimizer-state juggling:

    SAM:    g1 = ∇L(w);  ε = ρ g1/|g1|;  g = ∇L(w + ε)
    ImbSAM: g_head = ∇L_head(w);  g_t = ∇L_tail(w);  ε = ρ g_t/|g_t|;
            g = ∇L_tail(w + ε) + g_head

The reference's plain ``SGD`` wrapper (imbsam.py:43-47) corresponds to just
using ``build_sgd`` directly.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax


def build_sgd(learning_rate, weight_decay: float = 0.0,
              momentum: float = 0.0) -> optax.GradientTransformation:
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.sgd(learning_rate,
                           momentum=momentum if momentum else None))
    return optax.chain(*parts)


_SWIN_EARLY = ("patch_embed", "patch_norm", "stage0_block", "stage1_block",
               "merge0", "merge1")


def freeze_swin_early(tx: optax.GradientTransformation
                      ) -> optax.GradientTransformation:
    """TERL ``--fix_backbone``: freeze the Swin patch embed and stages 0-1.

    The reference sets requires_grad=False on every backbone parameter
    whose torch name contains 'patch', 'layers.0' or 'layers.1'
    (TERL/6_baseline_learnT/models/backbone.py:203-206) — i.e. the patch
    embed (+its norm) and the first two stages including their
    PatchMerging downsamples. Here the same partition is an
    optax.multi_transform: frozen leaves get set_to_zero (no update, no
    weight decay — matching requires_grad=False), everything else runs
    through ``tx`` unchanged. Labels are computed from the param paths at
    init, so no example params are needed up front.
    """

    def labels(params):
        def label(path, _):
            keys = [getattr(p, "key", None) for p in path]
            if "backbone" in keys:
                nxt = keys[keys.index("backbone") + 1:]
                if nxt and any(str(nxt[0]).startswith(f)
                               for f in _SWIN_EARLY):
                    return "frozen"
            return "train"

        return jax.tree_util.tree_map_with_path(label, params)

    return optax.multi_transform({"train": tx,
                                  "frozen": optax.set_to_zero()}, labels)


def _global_norm(tree) -> jnp.ndarray:
    return optax.global_norm(tree)


def _perturb(params, grads, rho: float):
    norm = _global_norm(grads) + 1e-16
    scale = rho / norm
    return jax.tree.map(lambda p, g: p + g * scale, params, grads)


def sam_gradients(loss_fn: Callable, params, rho: float = 0.05,
                  has_aux: bool = False) -> Tuple:
    """Two-step SAM gradient. ``loss_fn(params) -> loss`` (or (loss, aux))."""
    grad_fn = jax.grad(loss_fn, has_aux=has_aux)
    if has_aux:
        g1, aux = grad_fn(params)
        g2, aux2 = grad_fn(_perturb(params, g1, rho))
        return g2, aux2
    g1 = grad_fn(params)
    return grad_fn(_perturb(params, g1, rho))


def imbsam_gradients(loss_head_fn: Callable, loss_tail_fn: Callable, params,
                     rho: float = 0.05):
    """Three-step ImbSAM: sharpness-aware only for the tail loss."""
    g_head = jax.grad(loss_head_fn)(params)
    g_tail = jax.grad(loss_tail_fn)(params)
    g_tail_sharp = jax.grad(loss_tail_fn)(_perturb(params, g_tail, rho))
    return jax.tree.map(lambda a, b: a + b, g_tail_sharp, g_head)
