"""Fused MLP kernel (ops/fused_mlp.py) vs the unfused reference chain:
forward and all five gradients, in interpret mode on the CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mme_tpu.ops.fused_mlp import fused_mlp


def _reference(x, w1, b1, w2, b2, act):
    h = x.astype(jnp.float32) @ w1.astype(jnp.float32) + b1
    if act == "gelu":
        a = jax.nn.gelu(h, approximate=False)
    elif act == "gelu_new":
        a = jax.nn.gelu(h, approximate=True)
    elif act == "relu":
        a = jax.nn.relu(h)
    else:
        a = jnp.tanh(h)
    return (a.astype(x.dtype).astype(jnp.float32)
            @ w2.astype(jnp.float32) + b2).astype(x.dtype)


def _rand(key, shape, dtype):
    return (jax.random.normal(key, shape, jnp.float32) * 0.5).astype(dtype)


@pytest.mark.parametrize("act", ["gelu", "gelu_new", "relu"])
def test_fused_mlp_matches_reference_fp32(act):
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    N, H, F = 300, 64, 256  # N > block → padding path
    x = _rand(ks[0], (N, H), jnp.float32)
    w1 = _rand(ks[1], (H, F), jnp.float32)
    b1 = _rand(ks[2], (F,), jnp.float32)
    w2 = _rand(ks[3], (F, H), jnp.float32)
    b2 = _rand(ks[4], (H,), jnp.float32)

    out = fused_mlp(x, w1, b1, w2, b2, act, True)
    ref = _reference(x, w1, b1, w2, b2, act)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    def loss_fused(*args):
        return jnp.sum(fused_mlp(*args, act, True) ** 2)

    def loss_ref(*args):
        return jnp.sum(_reference(*args, act) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for gf, gr, name in zip(g_fused, g_ref, "x w1 b1 w2 b2".split()):
        scale = float(np.abs(np.asarray(gr)).max()) + 1e-9
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=2e-4, atol=scale * 5e-5,
                                   err_msg=name)


def test_fused_mlp_bf16_close_to_fp32_reference():
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    N, H, F = 128, 64, 128
    x32 = _rand(ks[0], (N, H), jnp.float32)
    w132 = _rand(ks[1], (H, F), jnp.float32)
    b1 = _rand(ks[2], (F,), jnp.float32)
    w232 = _rand(ks[3], (F, H), jnp.float32)
    b2 = _rand(ks[4], (H,), jnp.float32)
    out = fused_mlp(x32.astype(jnp.bfloat16), w132.astype(jnp.bfloat16),
                    b1, w232.astype(jnp.bfloat16), b2, "gelu", True)
    ref = _reference(x32, w132, b1, w232, b2, "gelu")
    # bf16 inputs: agreement to bf16 resolution of the output scale
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=scale * 0.05)


def test_fused_mlp_in_encoder_block():
    """MME_FUSED_MLP=1 routes layers.Mlp through the kernel; outputs match
    the unfused module bit-for-bit in fp32 interpret mode."""
    import os
    from mme_tpu.models.layers import EncoderSpec, Mlp

    spec = EncoderSpec(hidden=32, heads=4, layers=1, intermediate=64)
    x = _rand(jax.random.PRNGKey(2), (2, 24, 32), jnp.float32)
    m = Mlp(spec)
    params = m.init(jax.random.PRNGKey(3), x)
    ref = m.apply(params, x)
    os.environ["MME_FUSED_MLP"] = "interpret"
    try:
        out = m.apply(params, x)
    finally:
        del os.environ["MME_FUSED_MLP"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_vmem_gate_falls_back_at_bench_shapes():
    """At every bench tower's (H, F) the backward's dW accumulators exceed
    Mosaic's scoped-VMEM budget (measured compile OOM on v5e), so
    fused_mlp must take the XLA fallback — and stay differentiable."""
    from mme_tpu.ops.fused_mlp import _bwd_fits_vmem, _block_m, fused_mlp

    for H, F in [(768, 3072), (1024, 4096)]:   # text/video, wav2vec2
        assert not _bwd_fits_vmem(H, F, _block_m(2560), 2)
    assert _bwd_fits_vmem(128, 512, _block_m(256), 2)  # small config: kernel

    H, F, N = 1024, 4096, 64
    ks = jax.random.split(jax.random.PRNGKey(7), 5)
    x = _rand(ks[0], (N, H), jnp.float32)
    w1, b1 = _rand(ks[1], (H, F), jnp.float32), _rand(ks[2], (F,), jnp.float32)
    w2, b2 = _rand(ks[3], (F, H), jnp.float32), _rand(ks[4], (H,), jnp.float32)

    def loss(*a):
        return jnp.sum(fused_mlp(*a, "gelu", False).astype(jnp.float32) ** 2)

    val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))(
        x, w1, b1, w2, b2)
    ref = jnp.sum(_reference(x, w1, b1, w2, b2, "gelu") ** 2)
    np.testing.assert_allclose(float(val), float(ref), rtol=2e-4)
    assert all(jnp.all(jnp.isfinite(g)) for g in grads)
