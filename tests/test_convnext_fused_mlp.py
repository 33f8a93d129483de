"""Numerics for the fused ConvNeXt-block MLP Pallas kernel
(ops/convnext_mlp_pallas.py) against the unfused flax path it replaces.

Run on CPU in interpret mode (conftest forces the 8-virtual-device CPU
backend); on-chip wins are recorded by scripts/profile_train.py A/Bs.
The contract pinned here:
  - forward parity with the unfused LN→Dense→gelu→Dense→scale→residual
    chain at bf16 tolerance, for both exact-erf and tanh GELU;
  - identical parameter trees (names, shapes, init values) so fused and
    unfused checkpoints are interchangeable;
  - gradient parity through jax.custom_vjp for params and inputs;
  - stochastic depth falls back to the unfused path (masked residual
    cannot live inside the kernel) and still differentiates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_collision_detection_tpu.models.backbones.convnext import (
    ConvNeXtBlock,
)


def _tree_allclose(a, b, rtol, atol):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for xa, xb in zip(la, lb):
        np.testing.assert_allclose(np.asarray(xa, np.float32),
                                   np.asarray(xb, np.float32),
                                   rtol=rtol, atol=atol)


@pytest.mark.parametrize("approximate", [False, True])
def test_forward_matches_unfused(approximate):
    dim = 96
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 10, dim),
                          jnp.float32)
    fused = ConvNeXtBlock(dim=dim, fused_mlp=True,
                          gelu_approximate=approximate)
    ref = ConvNeXtBlock(dim=dim, fused_mlp=False,
                        gelu_approximate=approximate)
    params = ref.init(jax.random.PRNGKey(1), x)
    # non-trivial LN/scale params so the test sees them
    params = jax.tree_util.tree_map(
        lambda p: p + 0.05 * jnp.arange(p.size, dtype=p.dtype).reshape(p.shape)
        / p.size, params)
    out_ref = ref.apply(params, x)
    out_fused = fused.apply(params, x)
    assert out_fused.shape == out_ref.shape
    assert out_fused.dtype == out_ref.dtype
    np.testing.assert_allclose(np.asarray(out_fused, np.float32),
                               np.asarray(out_ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_param_trees_identical():
    dim = 64
    x = jnp.zeros((1, 8, 8, dim), jnp.float32)
    p_fused = ConvNeXtBlock(dim=dim, fused_mlp=True).init(
        jax.random.PRNGKey(7), x)
    p_ref = ConvNeXtBlock(dim=dim, fused_mlp=False).init(
        jax.random.PRNGKey(7), x)
    assert (jax.tree_util.tree_structure(p_fused)
            == jax.tree_util.tree_structure(p_ref))
    _tree_allclose(p_fused, p_ref, rtol=0, atol=0)


def test_gradients_match_unfused():
    dim = 32
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 6, dim), jnp.float32)
    fused = ConvNeXtBlock(dim=dim, fused_mlp=True)
    ref = ConvNeXtBlock(dim=dim, fused_mlp=False)
    params = ref.init(jax.random.PRNGKey(3), x)

    def loss(mod):
        def f(p, xx):
            o = mod.apply(p, xx)
            return jnp.mean(o * o)
        return f

    g_ref = jax.grad(loss(ref), argnums=(0, 1))(params, x)
    g_fused = jax.grad(loss(fused), argnums=(0, 1))(params, x)
    _tree_allclose(g_fused, g_ref, rtol=5e-2, atol=5e-3)


def test_drop_path_fallback_trains():
    dim = 32
    x = jax.random.normal(jax.random.PRNGKey(4), (4, 6, 6, dim), jnp.float32)
    blk = ConvNeXtBlock(dim=dim, fused_mlp=True, drop_path_rate=0.5)
    params = blk.init({"params": jax.random.PRNGKey(5),
                       "dropout": jax.random.PRNGKey(6)}, x, train=True)

    def f(p):
        o = blk.apply(p, x, train=True,
                      rngs={"dropout": jax.random.PRNGKey(8)})
        return jnp.mean(o)

    g = jax.grad(f)(params)
    assert all(np.all(np.isfinite(np.asarray(leaf, np.float32)))
               for leaf in jax.tree_util.tree_leaves(g))
