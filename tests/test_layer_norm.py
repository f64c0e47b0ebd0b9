"""Fused LayerNorm kernel (ops/layer_norm.py) vs flax nn.LayerNorm —
forward and gradient parity in interpret mode, f32 and bf16, including
non-tile-multiple row counts (the masked dγ/dβ partial path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from mme_tpu.ops.layer_norm import FusedLayerNorm, fused_layer_norm


def _flax_ln(x, scale, bias, eps, dtype):
    mod = nn.LayerNorm(epsilon=eps, dtype=dtype, param_dtype=jnp.float32)
    return mod.apply({"params": {"scale": scale, "bias": bias}}, x)


@pytest.mark.parametrize("shape,dtype,eps", [
    ((4, 37, 256), jnp.float32, 1e-12),   # rows=148: pads the 256-row tile
    ((2, 300, 128), jnp.float32, 1e-5),
    ((8, 64, 384), jnp.bfloat16, 1e-12),
])
def test_forward_matches_flax(shape, dtype, eps):
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    x = (jax.random.normal(k1, shape, jnp.float32) * 3 + 1).astype(dtype)
    h = shape[-1]
    scale = jax.random.normal(k2, (h,), jnp.float32)
    bias = jax.random.normal(k3, (h,), jnp.float32)
    got = fused_layer_norm(x, scale, bias, eps, interpret=True)
    want = _flax_ln(x, scale, bias, eps, dtype)
    assert got.dtype == want.dtype
    # bf16: allow one-ulp final-cast disagreements (fma/order effects)
    tol = 2e-6 if dtype == jnp.float32 else 1.6e-2
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=tol, atol=tol)


@pytest.mark.parametrize("rows,h,dtype", [
    (148, 256, jnp.float32),      # partial last tile → masked partials
    (512, 128, jnp.float32),
    (96, 384, jnp.bfloat16),
])
def test_gradients_match_flax(rows, h, dtype):
    k1, k2, k3, k4 = jax.random.split(jax.random.key(1), 4)
    x = (jax.random.normal(k1, (rows, h), jnp.float32)).astype(dtype)
    scale = jax.random.normal(k2, (h,), jnp.float32)
    bias = jax.random.normal(k3, (h,), jnp.float32)
    ct = jax.random.normal(k4, (rows, h), jnp.float32).astype(dtype)

    def loss_fused(x, s, b):
        return jnp.sum(fused_layer_norm(x, s, b, 1e-6,
                                        interpret=True
                                        ).astype(jnp.float32)
                       * ct.astype(jnp.float32))

    def loss_flax(x, s, b):
        return jnp.sum(_flax_ln(x, s, b, 1e-6, dtype).astype(jnp.float32)
                       * ct.astype(jnp.float32))

    g_got = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g_want = jax.grad(loss_flax, argnums=(0, 1, 2))(x, scale, bias)
    tol = 1e-4 if dtype == jnp.float32 else 5e-2
    for got, want, name in zip(g_got, g_want, ("dx", "dscale", "dbias")):
        assert got.dtype == want.dtype, name
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=tol, atol=tol, err_msg=name)


def test_module_param_tree_matches_nn_layer_norm():
    """FusedLayerNorm must be checkpoint-compatible with nn.LayerNorm."""
    x = jnp.ones((2, 5, 256), jnp.float32)
    p_fused = FusedLayerNorm(epsilon=1e-12).init(jax.random.key(0), x)
    p_flax = nn.LayerNorm(epsilon=1e-12).init(jax.random.key(0), x)
    assert jax.tree.structure(p_fused) == jax.tree.structure(p_flax)
    shapes = jax.tree.map(lambda a, b: a.shape == b.shape, p_fused, p_flax)
    assert all(jax.tree.leaves(shapes))


def test_module_fallback_matches_flax_on_cpu():
    """Off-TPU the module runs the flax-identical fallback path."""
    x = jax.random.normal(jax.random.key(2), (3, 17, 192), jnp.float32)
    mod = FusedLayerNorm(epsilon=1e-12, dtype=jnp.float32)
    p = mod.init(jax.random.key(0), x)
    got = mod.apply(p, x)
    want = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32).apply(p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
