"""Fused-forward / reference-backward Swin half-blocks for TRAINING.

The eval path's fused kernels (ops/window_mhsa, ops/mlp_block) are
forward-only Pallas programs; training needs gradients. Writing fused
BACKWARD kernels is a poor trade here: the backward is GEMM-dominated
(dW1/dW2, dX GEMMs) where XLA already runs at peak, and the weight-grad
accumulator refs alone (c x 4c f32 x2) exceed Mosaic's 16 MiB scoped
VMEM at SwinL stage 3+. Instead each half-block is a ``jax.custom_vjp``
whose FORWARD is the Pallas kernel (``res_add=False`` so the module can
place DropPath between the branch and the residual, reference
swin_transformer.py:253-255) and whose BACKWARD is XLA autodiff of the
numerically-matching reference function at the saved inputs. Under
``jax.checkpoint`` (remat) the replayed forward is the fast kernel too,
so BOTH forward passes of a train step ride the VMEM-resident kernels
while gradients stay exactly the reference's (forward/backward outputs
agree to kernel-parity tolerance, tests/test_ops_kernels.py).

Re-designs the training path of
MT4MTLKD/Spatial_transformer/models/swin_transformer.py:164-290.
"""

from __future__ import annotations

import functools

import jax

from .mlp_block import mlp_block_fused, mlp_block_reference
from .window_mhsa import window_mhsa_fused, window_mhsa_reference


@functools.lru_cache(maxsize=None)
def make_attn_branch(window: int, num_heads: int, use_mask: bool = True):
    """attn branch f(x, ...params..., bias[, mask]) -> proj(attn(LN(x)))
    (NO residual): Pallas forward, reference-autodiff backward. The
    unshifted variant (``use_mask=False``) takes no mask argument and
    runs the kernel's maskless fast path (no per-window zero-mask DMA)."""

    def ref(x, gamma, beta, wqkv, bqkv, wproj, bproj, bias, mask=None):
        return window_mhsa_reference(x, gamma, beta, wqkv, bqkv, wproj,
                                     bproj, bias, mask, window=window,
                                     num_heads=num_heads, res_add=False)

    if use_mask:
        @jax.custom_vjp
        def f(x, gamma, beta, wqkv, bqkv, wproj, bproj, bias, mask):
            return window_mhsa_fused(x, gamma, beta, wqkv, bqkv, wproj,
                                     bproj, bias, mask, window=window,
                                     num_heads=num_heads, res_add=False)
    else:
        @jax.custom_vjp
        def f(x, gamma, beta, wqkv, bqkv, wproj, bproj, bias):
            return window_mhsa_fused(x, gamma, beta, wqkv, bqkv, wproj,
                                     bproj, bias, None, window=window,
                                     num_heads=num_heads, res_add=False)

    def fwd(*args):
        return f(*args), args

    def bwd(args, ct):
        _, vjp = jax.vjp(ref, *args)
        return vjp(ct)

    f.defvjp(fwd, bwd)
    return f


@functools.lru_cache(maxsize=None)
def make_mlp_branch():
    """MLP branch f(x, gamma, beta, w1, b1, w2, b2) -> mlp(LN(x)) (NO
    residual): Pallas forward, reference-autodiff backward."""

    def ref(x, gamma, beta, w1, b1, w2, b2):
        return mlp_block_reference(x, gamma, beta, w1, b1, w2, b2,
                                   res_add=False)

    @jax.custom_vjp
    def f(x, gamma, beta, w1, b1, w2, b2):
        return mlp_block_fused(x, gamma, beta, w1, b1, w2, b2,
                               res_add=False)

    def fwd(*args):
        return f(*args), args

    def bwd(args, ct):
        _, vjp = jax.vjp(ref, *args)
        return vjp(ct)

    f.defvjp(fwd, bwd)
    return f
