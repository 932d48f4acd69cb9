"""Fused ResNet stem: maxpool3x3/s2(relu(conv7x7/s2(x) + bias)) in ONE
Pallas kernel.

Why: the student's e2e ceiling is the stem (docs/BENCH.md round-3
roofline — the 7x7/s2 conv runs at ~40% MXU because C_in=3 starves the
systolic array) plus the maxpool's HBM round-trip (the conv's
(H/2, W/2, 64) output — 3.7 MB/frame at 256x448 — is written to HBM and
read back by reduce_window). This kernel:

  * takes the 2x2 space-to-depth view of the padded input (the
    models/resnet._s2d_conv1 reparametrization: conv7x7/s2 over 3ch ==
    conv4x4/s1 VALID over 12ch — identical multiply-adds);
  * builds the 16-tap im2col patches IN VMEM (never materialized to HBM)
    and runs ONE (rows*W2, 192) @ (192, 64) GEMM per row chunk — K=192
    instead of the channel-starved K=12/147;
  * applies bias + ReLU and the 3x3/s2 maxpool on the VMEM-resident conv
    output, so only the pooled (H/4, W/4, 64) map ever touches HBM.

Row chunks are a GRID axis, not an in-kernel loop: Mosaic allocates
scoped VMEM for the peak across a kernel body, and a static Python loop
keeps every iteration's im2col/accumulator live (the 256x448 serving
shape allocated 18.38 MiB against the 16 MiB stack regardless of chunk
size). One chunk per grid step bounds the footprint to a single chunk's
intermediates (~10 MiB at chunk=16) and the stack is reused across
steps. The top pool-padding row (conv row -1) is handled uniformly: the
first chunk computes conv rows [0, 2k] and predication shifts them down
one slot behind a zero row; later chunks compute [2p0-1, 2p0+2k-1]
directly.

Maxpool padding note: torch pads the pool with -inf, but the pool input
is post-ReLU (>= 0) and every edge window contains at least one real
cell, so zero-padding is EXACT — the kernel prepends a zero row/column
to the conv output instead of special-casing edges.

Weights arrive BN-FOLDED (the serving config: models/quantized._qconv
float-stem dict) — w (7,7,3,64) already multiplied by the BN affine,
bias the folded BN bias. Serving-path integration:
quantized_resnet_apply(fused_stem=True) / InferenceSession.create.

Re-designs the stem of MT4MTLKD/Spatial_cnn/network.py:95-118
(torchvision resnet conv1+bn1+relu+maxpool) as a single TPU program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pool_cols(rowp, pr, cw, pw, dtype):
    """3-tap/stride-2 column max over rowp (pr, cw+1, 64) that already
    carries the zero pool-pad column at index 0."""
    cbody = rowp[:, :2 * pw].reshape(pr, pw, 2, 64)
    cpair = jnp.maximum(cbody[:, :, 0], cbody[:, :, 1])
    cthird = jnp.concatenate(
        [cbody[:, 1:, 0], rowp[:, 2 * pw:2 * pw + 1]], axis=1)
    return jnp.maximum(cpair, cthird)


def _kernel_single(xs_ref, w_ref, b_ref, o_ref, *, h2, w2, pool_rows):
    """Whole image in one step (small shapes — tests, thumbnails)."""
    cw = w2 - 3
    pw = cw // 2
    xs = xs_ref[0]
    bias = b_ref[...].astype(jnp.float32)
    rows = 2 * pool_rows  # conv rows 0 .. 2*pool_rows-1 == ch-1
    taps = []
    for dy in range(4):
        for dx in range(4):
            sl = xs[dy:dy + rows, dx:dx + cw, :]
            taps.append(sl.reshape(rows * cw, 12))
    patches = jnp.concatenate(taps, axis=-1)  # (rows*cw, 192)
    conv = jax.lax.dot_general(
        patches, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    conv = jax.nn.relu(conv + bias).astype(xs.dtype).reshape(rows, cw, 64)
    # padded conv P: zero row 0 (pool top pad), then conv rows 0..ch-1
    p = jnp.concatenate([jnp.zeros((1, cw, 64), xs.dtype), conv], axis=0)
    p = jnp.concatenate([jnp.zeros((rows + 1, 1, 64), xs.dtype), p], axis=1)
    body = p[:2 * pool_rows].reshape(pool_rows, 2, cw + 1, 64)
    pair = jnp.maximum(body[:, 0], body[:, 1])
    # rows 2l+2 without a strided slice (Mosaic lowers stride-2 row
    # slices as a gather it cannot handle): odd half of p[1:]
    third = p[1:2 * pool_rows + 1].reshape(pool_rows, 2, cw + 1, 64)[:, 1]
    rowp = jnp.maximum(pair, third)  # (pool_rows, cw+1, 64)
    o_ref[0] = _pool_cols(rowp, pool_rows, cw, pw, xs.dtype)


def _kernel_grid(xs_ref, w_ref, b_ref, o_ref, *, h2, w2, chunk):
    """One row chunk per grid step: pool rows [j*chunk, (j+1)*chunk)."""
    cw = w2 - 3
    pw = cw // 2
    j = pl.program_id(1)
    p0 = j * chunk
    bias = b_ref[...].astype(jnp.float32)
    nrows = 2 * chunk + 1  # conv rows this chunk contributes to the pool
    # conv row window: s .. s+nrows-1, where s = 2*p0-1 except the first
    # chunk, which starts at 0 (its row -1 is the zero pool pad).
    # Indexing form matters to Mosaic: a mixed [0, pl.ds(...)] ref load
    # desugars to a gather it cannot lower, and value-level
    # lax.dynamic_slice is an unimplemented primitive — a full-slice on
    # the leading dim ([:, pl.ds(...)]) lowers to a plain dynamic ref
    # load (probed on-chip).
    s = jnp.maximum(2 * p0 - 1, 0)
    xs = xs_ref[:, pl.ds(s, nrows + 3)][0]
    taps = []
    for dy in range(4):
        for dx in range(4):
            sl = xs[dy:dy + nrows, dx:dx + cw, :]
            taps.append(sl.reshape(nrows * cw, 12))
    patches = jnp.concatenate(taps, axis=-1)  # (nrows*cw, 192)
    conv = jax.lax.dot_general(
        patches, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    conv = jax.nn.relu(conv + bias).astype(xs.dtype).reshape(nrows, cw, 64)
    # padded-conv block P[l] == pooled-coordinate row 2*p0 + l:
    #   j == 0: P = [zero, conv[0 .. nrows-2]]   (zero = conv row -1)
    #   j  > 0: P = conv                          (rows 2p0-1 .. 2p0+2k-1)
    # — predicated select (value-level dynamic_slice does not lower on
    # Mosaic; the select is one VPU pass over the chunk)
    shifted = jnp.concatenate(
        [jnp.zeros((1, cw, 64), xs.dtype), conv[:-1]], axis=0)
    p = jnp.where(j == 0, shifted, conv)
    # zero pool-pad COLUMN; right/bottom need none
    # ((W/2 + 2 - 3)//2 + 1 == W/4 uses cols -1 .. W/2-1 only)
    p = jnp.concatenate([jnp.zeros((nrows, 1, 64), xs.dtype), p], axis=1)
    body = p[:2 * chunk].reshape(chunk, 2, cw + 1, 64)
    pair = jnp.maximum(body[:, 0], body[:, 1])   # P rows 2l, 2l+1
    # P rows 2l+2, stride-2-free (see _kernel_single)
    third = p[1:2 * chunk + 1].reshape(chunk, 2, cw + 1, 64)[:, 1]
    rowp = jnp.maximum(pair, third)              # (chunk, cw+1, 64)
    o_ref[0] = _pool_cols(rowp, chunk, cw, pw, xs.dtype)


def _pick_chunk(pool_rows: int, target: int = 16) -> int:
    """Largest divisor of pool_rows <= target (VMEM-bounded grid chunk)."""
    for c in range(min(target, pool_rows), 0, -1):
        if pool_rows % c == 0:
            return c
    return pool_rows


@functools.partial(jax.jit, static_argnames=("chunk",))
def stem_pool_fused(x, w, bias, chunk: int | None = None):
    """x (B, H, W, 3) normalized frames (H, W divisible by 4);
    w (7, 7, 3, 64) BN-folded stem kernel; bias (64,).
    Returns (B, H/4, W/4, 64) == maxpool3x3/s2/p1(relu(conv7x7/s2/p3 + b)).
    """
    # Mosaic's scoped-VMEM accounting jumps past the 16 MiB stack once the
    # batch grid axis grows (B<=8 compiles at 256x448, B>=32 allocates
    # ~27.5M regardless of row chunk or dimension_semantics — measured
    # on-chip). The grid serializes over batch anyway, so split the batch
    # host-side and lax.map the bounded-call; exact and allocation-safe.
    b = x.shape[0]
    if b > 8:
        split = _pick_chunk(b, 8)
        if split < 4:  # few usable divisors (prime, or e.g. 22 -> 2):
            # pad to the next multiple of 8 — 1-7 wasted frames beat a
            # long chain of tiny sequential pallas_calls. split < 4
            # implies b % 4 != 0, so pad > 0 and the recursion ends.
            pad = (-b) % 8
            xp = jnp.concatenate([x, jnp.zeros((pad, *x.shape[1:]),
                                               x.dtype)], axis=0)
            return stem_pool_fused(xp, w, bias, chunk=chunk)[:b]
        xs = x.reshape(b // split, split, *x.shape[1:])
        out = jax.lax.map(
            lambda xc: _stem_pool_call(xc, w, bias, chunk=chunk), xs)
        return out.reshape(b, *out.shape[2:])
    return _stem_pool_call(x, w, bias, chunk=chunk)


def _stem_pool_call(x, w, bias, chunk: int | None = None):
    b, h, wd, c = x.shape
    if h % 4 or wd % 4:
        raise ValueError(f"fused stem needs H, W divisible by 4, got "
                         f"{(h, wd)}")
    pool_rows, pool_cols = h // 4, wd // 4
    if chunk is None:
        chunk = _pick_chunk(pool_rows)
    else:
        chunk = _pick_chunk(pool_rows, chunk)
    oc = w.shape[-1]
    # host-side (XLA, fuses into the preceding normalize): pad + s2d view
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    h2, w2 = h // 2 + 3, wd // 2 + 3
    xs = xp.reshape(b, h2, 2, w2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(b, h2, w2, 4 * c)
    # tap-major GEMM weights: rows ordered (dy, dx, (py, px, c))
    kpad = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
    k2 = kpad.reshape(4, 2, 4, 2, c, oc).transpose(0, 2, 1, 3, 4, 5)
    k2 = k2.reshape(16 * 4 * c, oc).astype(x.dtype)

    n_chunks = pool_rows // chunk
    if n_chunks == 1:
        kernel = functools.partial(_kernel_single, h2=h2, w2=w2,
                                   pool_rows=pool_rows)
        grid = (b,)
        out_spec = pl.BlockSpec((1, pool_rows, pool_cols, oc),
                                lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        in_idx = lambda i: (i, 0, 0, 0)  # noqa: E731
        w_idx = lambda i: (0, 0)  # noqa: E731
        b_idx = lambda i: (0,)  # noqa: E731
    else:
        kernel = functools.partial(_kernel_grid, h2=h2, w2=w2, chunk=chunk)
        grid = (b, n_chunks)
        out_spec = pl.BlockSpec((1, chunk, pool_cols, oc),
                                lambda i, j: (i, j, 0, 0),
                                memory_space=pltpu.VMEM)
        in_idx = lambda i, j: (i, 0, 0, 0)  # noqa: E731
        w_idx = lambda i, j: (0, 0)  # noqa: E731
        b_idx = lambda i, j: (0,)  # noqa: E731
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, pool_rows, pool_cols, oc),
                                       x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h2, w2, 4 * c), in_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16 * 4 * c, oc), w_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((oc,), b_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        interpret=jax.default_backend() != "tpu",
    )(xs, k2, bias.astype(jnp.float32))


def stem_pool_reference(x, w, bias):
    """XLA reference: conv7x7/s2/p3 + bias + relu + maxpool3x3/s2/p1."""
    import flax.linen as nn

    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = jax.nn.relu(y + bias.astype(jnp.float32)).astype(x.dtype)
    return nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
