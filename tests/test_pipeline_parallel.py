"""Pipeline parallelism (parallel/pipeline.py): the GPipe schedule over the
mesh model axis must reproduce the sequential layer loop exactly.
Runs on the conftest 8-virtual-CPU-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from computervision_codes_tpu.parallel.mesh import make_mesh
from computervision_codes_tpu.parallel.pipeline import (
    pipeline_blocks,
    stack_block_params,
)


def _mlp_block(p, x):
    return x + jnp.tanh(x @ p["w"] + p["b"])


def _mlp_stack(rng, n_layers, dim):
    return [{"w": jnp.asarray(rng.standard_normal((dim, dim)) * 0.3,
                              jnp.float32),
             "b": jnp.asarray(rng.standard_normal(dim) * 0.1, jnp.float32)}
            for _ in range(n_layers)]


@pytest.mark.parametrize("d,n_micro", [(2, 4), (4, 2), (4, 8), (8, 4)])
def test_pipeline_matches_sequential_mlp(rng, d, n_micro):
    layers = _mlp_stack(rng, 8, 16)
    x = jnp.asarray(rng.standard_normal((8, 5, 16)), jnp.float32)
    want = x
    for p in layers:
        want = _mlp_block(p, want)
    mesh = make_mesh(n_data=1, n_seq=1, n_model=d)
    got = pipeline_blocks(_mlp_block, stack_block_params(layers), x,
                          mesh, n_micro=n_micro)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_pipeline_swin_block_pairs(rng):
    """Real SwinBlocks at block-PAIR granularity (shift 0 + shift w/2):
    4 pairs = 8 blocks pipelined over 4 stages == the sequential stack."""
    from computervision_codes_tpu.models.swin import SwinBlock

    dim, heads, w = 32, 2, 4
    b0 = SwinBlock(dim=dim, num_heads=heads, window=w, shift=0,
                   fused_eval=False)
    b1 = SwinBlock(dim=dim, num_heads=heads, window=w, shift=w // 2,
                   fused_eval=False)
    x = jnp.asarray(rng.standard_normal((4, 8, 8, dim)), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    pairs = [{"a": b0.init(keys[2 * i], x)["params"],
              "b": b1.init(keys[2 * i + 1], x)["params"]}
             for i in range(4)]

    def apply_pair(p, act):
        act = b0.apply({"params": p["a"]}, act)
        return b1.apply({"params": p["b"]}, act)

    want = x
    for p in pairs:
        want = apply_pair(p, want)

    mesh = make_mesh(n_data=1, n_seq=1, n_model=4)
    got = pipeline_blocks(apply_pair, stack_block_params(pairs), x,
                          mesh, n_micro=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_swin_stage_extraction_and_pipeline(rng):
    """Bridge from a REAL SwinTransformer param tree: extract stage-2's
    4 blocks (2 shift-pairs), pipeline over 2 stages, match the
    sequential block loop on the same extracted params."""
    from computervision_codes_tpu.models.swin import SwinBlock, SwinTransformer
    from computervision_codes_tpu.parallel.swin_pipeline import (
        extract_stage_pairs,
        pipelined_swin_stage,
    )

    model = SwinTransformer(embed_dim=16, depths=(1, 1, 4, 1),
                            num_heads=(1, 2, 4, 8), window_size=4,
                            drop_path_rate=0.0, fused_eval=False)
    imgs = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), imgs)["params"]
    stacked, n_blocks = extract_stage_pairs(params, 2)
    assert n_blocks == 4

    dim, heads, w = 16 * 4, 4, 4
    x = jnp.asarray(rng.standard_normal((4, 8, 8, dim)), jnp.float32)
    b0 = SwinBlock(dim=dim, num_heads=heads, window=w, shift=0,
                   fused_eval=False)
    b1 = SwinBlock(dim=dim, num_heads=heads, window=w, shift=2,
                   fused_eval=False)
    want = x
    for d in range(0, 4, 2):
        want = b0.apply({"params": params[f"stage2_block{d}"]}, want)
        want = b1.apply({"params": params[f"stage2_block{d + 1}"]}, want)

    mesh = make_mesh(n_data=1, n_seq=1, n_model=2)
    got = pipelined_swin_stage(stacked, x, mesh, n_micro=2, dim=dim,
                               num_heads=heads, window=w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    with pytest.raises(ValueError, match="no stage9"):
        extract_stage_pairs(params, 9)
    with pytest.raises(ValueError, match="whole shift-pairs"):
        extract_stage_pairs(params, 0)  # depth 1


def test_pipeline_composes_with_data_axis(rng):
    """DP x PP on one mesh: microbatch contents shard over `data` (each
    chip holds mb/n_data rows), layers over `model` — same numbers."""
    layers = _mlp_stack(rng, 4, 16)
    x = jnp.asarray(rng.standard_normal((8, 4, 16)), jnp.float32)
    want = x
    for p in layers:
        want = _mlp_block(p, want)
    mesh = make_mesh(n_data=2, n_seq=1, n_model=4)
    got = pipeline_blocks(_mlp_block, stack_block_params(layers), x,
                          mesh, n_micro=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_pipeline_gradients_match_sequential(rng):
    """The schedule is differentiable: grads w.r.t. the stacked params
    through scan+ppermute+psum equal the sequential loop's (GPipe backward
    for free from autodiff)."""
    layers = _mlp_stack(rng, 4, 8)
    stacked = stack_block_params(layers)
    x = jnp.asarray(rng.standard_normal((4, 3, 8)), jnp.float32)
    mesh = make_mesh(n_data=1, n_seq=1, n_model=2)

    def seq_loss(stacked_p, xx):
        def body(act, p):
            return _mlp_block(p, act), None
        out, _ = jax.lax.scan(body, xx, stacked_p)
        return jnp.mean(out ** 2)

    def pp_loss(stacked_p, xx):
        out = pipeline_blocks(_mlp_block, stacked_p, xx, mesh, n_micro=2)
        return jnp.mean(out ** 2)

    g_seq = jax.grad(seq_loss)(stacked, x)
    g_pp = jax.grad(pp_loss)(stacked, x)
    for a, b in zip(jax.tree.leaves(g_seq), jax.tree.leaves(g_pp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_pipeline_validates_divisibility(rng):
    layers = _mlp_stack(rng, 6, 8)
    x = jnp.zeros((4, 8), jnp.float32)
    mesh = make_mesh(n_data=1, n_seq=1, n_model=4)
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_blocks(_mlp_block, stack_block_params(layers), x, mesh, 2)
    layers = _mlp_stack(rng, 8, 8)
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_blocks(_mlp_block, stack_block_params(layers), x, mesh, 3)
