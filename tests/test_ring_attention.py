"""Ring attention (sequence-parallel exact attention, ops/ring_attention.py)
vs the single-device reference on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from mme_tpu.ops.attention import dot_product_attention
from mme_tpu.ops.ring_attention import ring_attention


def sp_mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"need {n} devices")
    return Mesh(np.asarray(devs[:n]), ("sp",))


def reference(q, k, v, key_mask=None):
    bias = None
    if key_mask is not None:
        bias = jnp.where(key_mask[:, None, None, :].astype(bool), 0.0,
                         -1e30).astype(jnp.float32)
    return dot_product_attention(q, k, v, bias, use_flash=False)


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_ring_matches_full_attention(n_shards):
    mesh = sp_mesh(n_shards)
    rng = np.random.RandomState(0)
    B, H, S, D = 2, 4, 64, 16
    q = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)

    got = ring_attention(q, k, v, mesh)
    want = reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ring_with_key_mask_and_jit():
    mesh = sp_mesh(4)
    rng = np.random.RandomState(1)
    B, H, S, D = 2, 2, 32, 8
    q = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    key_mask = jnp.asarray(rng.rand(B, S) > 0.3)
    # every key block must keep ≥1 visible key per row for the reference
    key_mask = key_mask.at[:, ::8].set(True)

    got = jax.jit(lambda q, k, v, m: ring_attention(q, k, v, mesh,
                                                    key_mask=m))(
        q, k, v, key_mask)
    want = reference(q, k, v, key_mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ring_gradients_match():
    mesh = sp_mesh(4)
    rng = np.random.RandomState(2)
    B, H, S, D = 1, 2, 32, 8
    q = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)

    g_ring = jax.grad(lambda q_: jnp.sum(
        ring_attention(q_, k, v, mesh) ** 2))(q)
    g_full = jax.grad(lambda q_: jnp.sum(reference(q_, k, v) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g_ring), np.asarray(g_full),
                               rtol=5e-5, atol=5e-5)


def test_encoder_with_ring_attention_matches_dense():
    """A real TransformerEncoder block with EncoderSpec.seq_mesh/seq_axis
    (sequence-parallel attention) matches the single-device encoder with
    identical params."""
    from mme_tpu.models.layers import EncoderSpec, TransformerEncoder
    from mme_tpu.ops.attention import additive_mask

    mesh = sp_mesh(4)
    rng = np.random.RandomState(3)
    B, S, H = 2, 32, 16
    spec = EncoderSpec(hidden=H, heads=2, layers=2, intermediate=32,
                       ln_style="pre", ln_eps=1e-6)
    sp_spec = __import__("dataclasses").replace(spec, seq_mesh=mesh,
                                                seq_axis="sp")
    x = jnp.asarray(rng.randn(B, S, H), jnp.float32)
    keep = np.ones((B, S), np.int32)
    keep[:, -5:] = 0
    bias = additive_mask(jnp.asarray(keep))

    dense = TransformerEncoder(spec)
    params = dense.init(jax.random.PRNGKey(0), x, bias)["params"]
    ring = TransformerEncoder(sp_spec)
    out_d = dense.apply({"params": params}, x, bias)
    out_r = ring.apply({"params": params}, x, bias)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_d),
                               rtol=3e-5, atol=3e-5)


def test_ring_attention_soft_key_bias_matches_dense():
    """Soft (non-binary) additive key biases must pass through exactly —
    the old path binarized them via `> -1e4` (review finding, fixed)."""
    from mme_tpu.ops.attention import dot_product_attention

    mesh = sp_mesh(4)
    rng = np.random.RandomState(7)
    B, Hh, S, D = 2, 2, 32, 8
    q = jnp.asarray(rng.randn(B, Hh, S, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, Hh, S, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, Hh, S, D), jnp.float32)
    soft = jnp.asarray(rng.randn(B, S) * 3.0, jnp.float32)  # in [-9, 9]

    ring = ring_attention(q, k, v, mesh, key_bias=soft)
    dense = dot_product_attention(q, k, v, soft[:, None, None, :],
                                  use_flash=False)
    np.testing.assert_allclose(np.asarray(ring), np.asarray(dense),
                               rtol=3e-5, atol=3e-5)


def test_encoder_ring_soft_bias_matches_dense():
    from mme_tpu.models.layers import EncoderSpec, TransformerEncoder

    mesh = sp_mesh(4)
    rng = np.random.RandomState(8)
    B, S, H = 2, 32, 16
    spec = EncoderSpec(hidden=H, heads=2, layers=2, intermediate=32,
                       ln_style="pre", ln_eps=1e-6)
    sp_spec = __import__("dataclasses").replace(spec, seq_mesh=mesh,
                                                seq_axis="sp")
    x = jnp.asarray(rng.randn(B, S, H), jnp.float32)
    soft = jnp.asarray(rng.randn(B, 1, 1, S) * 2.0, jnp.float32)
    dense = TransformerEncoder(spec)
    params = dense.init(jax.random.PRNGKey(0), x, soft)["params"]
    out_d = dense.apply({"params": params}, x, soft)
    out_r = TransformerEncoder(sp_spec).apply({"params": params}, x, soft)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_d),
                               rtol=3e-5, atol=3e-5)


def test_ring_dkv_gradients_match():
    """dk/dv gradients flow through ppermute inside the fori_loop — the
    path most likely to silently mis-transpose (round-2 review finding:
    only dq was tested). Checks all three grads, with a key mask and a
    non-divisible (padded at the layer; here divisible raw) length."""
    mesh = sp_mesh(4)
    rng = np.random.RandomState(11)
    B, H, S, D = 2, 2, 32, 8
    q = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    key_mask = jnp.asarray(rng.rand(B, S) > 0.3)
    key_mask = key_mask.at[:, ::8].set(True)

    def loss_ring(q_, k_, v_):
        return jnp.sum(ring_attention(q_, k_, v_, mesh,
                                      key_mask=key_mask) ** 2)

    def loss_ref(q_, k_, v_):
        return jnp.sum(reference(q_, k_, v_, key_mask) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5,
                                   err_msg=f"d{name} mismatch")


@pytest.mark.parametrize("n_shards", [2, 4])
def test_ring_flash_matches_dense(n_shards):
    """Ring with Pallas FLASH local blocks (round-5 lift of the r3/r4
    verdict item: the sp path paid unfused local attention) — forward
    parity vs dense full attention, with a key mask, in interpret mode on
    the CPU mesh. Local seq (64/n) is not 128-aligned → exercises the
    kernels' internal padding per hop."""
    mesh = sp_mesh(n_shards)
    rng = np.random.RandomState(21)
    B, H, S, D = 2, 2, 64, 64      # lane-packable head_dim
    q = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    key_mask = jnp.asarray(rng.rand(B, S) > 0.3)
    key_mask = key_mask.at[:, ::8].set(True)

    got = ring_attention(q, k, v, mesh, key_mask=key_mask,
                         use_flash=True, interpret=True)
    want = reference(q, k, v, key_mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ring_flash_fully_masked_block():
    """One ring shard's ENTIRE key block masked: the flash kernel returns
    its LSE_MASKED sentinel for rows of that block and the cross-hop merge
    must treat it as zero contribution (not +inf)."""
    mesh = sp_mesh(4)
    rng = np.random.RandomState(22)
    B, H, S, D = 1, 2, 64, 64
    q = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    key_mask = np.ones((B, S), bool)
    key_mask[:, 16:32] = False      # shard 1 of 4 fully masked
    key_mask = jnp.asarray(key_mask)

    got = ring_attention(q, k, v, mesh, key_mask=key_mask,
                         use_flash=True, interpret=True)
    want = reference(q, k, v, key_mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ring_flash_gradients_match():
    """dq/dk/dv through the ring-flash custom_vjp (per-hop Pallas backward
    with the GLOBAL lse, dk/dv accumulators riding the ring) vs the dense
    reference."""
    mesh = sp_mesh(4)
    rng = np.random.RandomState(23)
    B, H, S, D = 1, 2, 64, 64
    q = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    key_mask = jnp.asarray(rng.rand(B, S) > 0.3)
    key_mask = key_mask.at[:, ::8].set(True)

    def loss_ring(q_, k_, v_):
        return jnp.sum(ring_attention(q_, k_, v_, mesh, key_mask=key_mask,
                                      use_flash=True, interpret=True) ** 2)

    def loss_ref(q_, k_, v_):
        return jnp.sum(reference(q_, k_, v_, key_mask) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4,
                                   err_msg=f"d{name} mismatch")


def test_sp_encoder_backward_matches_dense():
    """Backward pass through the sp-ENABLED encoder (ring attention inside
    real blocks, incl. the layer-level padding path for a sequence length
    that does not divide the sp axis) matches the dense encoder's grads."""
    import dataclasses

    from mme_tpu.models.layers import EncoderSpec, TransformerEncoder
    from mme_tpu.ops.attention import additive_mask

    mesh = sp_mesh(4)
    rng = np.random.RandomState(12)
    B, S, H = 2, 30, 16        # 30 % 4 != 0 → exercises ring padding
    spec = EncoderSpec(hidden=H, heads=2, layers=2, intermediate=32,
                       ln_style="pre", ln_eps=1e-6)
    sp_spec = dataclasses.replace(spec, seq_mesh=mesh, seq_axis="sp")
    x = jnp.asarray(rng.randn(B, S, H), jnp.float32)
    keep = np.ones((B, S), np.int32)
    keep[:, -5:] = 0
    bias = additive_mask(jnp.asarray(keep))

    dense = TransformerEncoder(spec)
    params = dense.init(jax.random.PRNGKey(0), x, bias)["params"]

    def loss(enc):
        return lambda p, x_: jnp.sum(
            enc.apply({"params": p}, x_, bias) ** 2)

    (l_d, gp_d), gx_d = (jax.value_and_grad(loss(dense))(params, x),
                         jax.grad(loss(dense), argnums=1)(params, x))
    ring_enc = TransformerEncoder(sp_spec)
    (l_r, gp_r), gx_r = (jax.value_and_grad(loss(ring_enc))(params, x),
                         jax.grad(loss(ring_enc), argnums=1)(params, x))
    np.testing.assert_allclose(float(l_r), float(l_d), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
        gp_r, gp_d)
    np.testing.assert_allclose(np.asarray(gx_r), np.asarray(gx_d),
                               rtol=2e-4, atol=2e-5)
