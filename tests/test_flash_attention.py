"""Flash attention vs XLA reference: forward + gradients (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mme_tpu.ops.attention import _xla_attention, additive_mask
from mme_tpu.ops.flash_attention import flash_attention


def _qkv(seed, B, H, S, D, Sk=None):
    rng = np.random.RandomState(seed)
    Sk = Sk or S
    q = rng.randn(B, H, S, D).astype(np.float32)
    k = rng.randn(B, H, Sk, D).astype(np.float32)
    v = rng.randn(B, H, Sk, D).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


@pytest.mark.parametrize("B,H,S,D", [(2, 2, 128, 64), (1, 3, 320, 64)])
def test_forward_matches_xla(B, H, S, D):
    q, k, v = _qkv(0, B, H, S, D)
    ref = _xla_attention(q, k, v, None)
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_forward_with_key_mask():
    B, H, S, D = 2, 2, 160, 64
    q, k, v = _qkv(1, B, H, S, D)
    keep = np.ones((B, S), np.int32)
    keep[0, 100:] = 0
    keep[1, 40:] = 0
    bias = additive_mask(jnp.asarray(keep))
    ref = _xla_attention(q, k, v, bias)
    out = flash_attention(q, k, v, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_gradients_match_xla():
    B, H, S, D = 1, 2, 192, 64
    q, k, v = _qkv(2, B, H, S, D)
    keep = np.ones((B, S), np.int32)
    keep[0, 150:] = 0
    bias = additive_mask(jnp.asarray(keep))

    def loss_ref(q, k, v):
        return (_xla_attention(q, k, v, bias) ** 2).sum()

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, bias, interpret=True) ** 2).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_fl = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_fl, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4,
                                   err_msg=f"d{name} mismatch")


def test_non_divisible_seq_falls_back_cleanly():
    # seq not multiple of block: kernel still covers it via cdiv grid
    B, H, S, D = 1, 1, 100, 64
    q, k, v = _qkv(3, B, H, S, D)
    ref = _xla_attention(q, k, v, None)
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_multi_block_padded_seq():
    """seq larger than one block and not a multiple of it — exercises the
    padding path in both passes (the real TAV shapes: 473, 1464, 1568)."""
    B, H, S, D = 1, 2, 600, 64
    q, k, v = _qkv(4, B, H, S, D)
    keep = np.ones((B, S), np.int32)
    keep[0, 550:] = 0
    bias = additive_mask(jnp.asarray(keep))

    ref = _xla_attention(q, k, v, bias)
    out = flash_attention(q, k, v, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    g_ref = jax.grad(lambda a, b, c: (_xla_attention(a, b, c, bias) ** 2
                                      ).sum(), argnums=(0, 1, 2))(q, k, v)
    g_fl = jax.grad(lambda a, b, c: (flash_attention(a, b, c, bias,
                                                     interpret=True) ** 2
                                     ).sum(), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_fl, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   err_msg=f"d{name} mismatch")


def test_shd_entry_matches_bhsd():
    """flash_attention_shd ([B,S,H,D], the packed-head fast path) must equal
    the [B,H,S,D] entry and the XLA reference."""
    from mme_tpu.ops.flash_attention import flash_attention_shd
    B, H, S, D = 2, 4, 200, 64   # even H -> pack=2
    q, k, v = _qkv(5, B, H, S, D)
    keep = np.ones((B, S), np.int32)
    keep[1, 120:] = 0
    bias = additive_mask(jnp.asarray(keep))
    ref = _xla_attention(q, k, v, bias)
    out = flash_attention_shd(q.transpose(0, 2, 1, 3),
                              k.transpose(0, 2, 1, 3),
                              v.transpose(0, 2, 1, 3),
                              bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out.transpose(0, 2, 1, 3)),
                               np.asarray(ref), atol=2e-5)


def test_packed_heads_gradients():
    """Even-H D=64 (pack=2, the production shape class) gradients."""
    B, H, S, D = 2, 2, 300, 64
    q, k, v = _qkv(6, B, H, S, D)
    keep = np.ones((B, S), np.int32)
    keep[0, 260:] = 0
    bias = additive_mask(jnp.asarray(keep))
    g_ref = jax.grad(lambda a, b, c: (_xla_attention(a, b, c, bias) ** 2
                                      ).sum(), argnums=(0, 1, 2))(q, k, v)
    g_fl = jax.grad(lambda a, b, c: (flash_attention(a, b, c, bias,
                                                     interpret=True) ** 2
                                     ).sum(), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_fl, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   err_msg=f"d{name} mismatch")


def test_fully_masked_row_yields_zero_grads():
    """A batch row with EVERY key masked must produce zero output and
    finite (zero) gradients — the lse sentinel path (round-2 latent bug:
    lse=-inf made the bwd recompute exp(s+inf)=NaN)."""
    B, H, S, D = 2, 2, 128, 64
    q, k, v = _qkv(7, B, H, S, D)
    keep = np.ones((B, S), np.int32)
    keep[1, :] = 0                      # row 1 fully masked
    bias = additive_mask(jnp.asarray(keep))
    out = flash_attention(q, k, v, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out[1]), 0.0, atol=1e-6)
    g = jax.grad(lambda a, b, c: (flash_attention(a, b, c, bias,
                                                  interpret=True) ** 2
                                  ).sum(), argnums=(0, 1, 2))(q, k, v)
    for t, name in zip(g, "qkv"):
        arr = np.asarray(t)
        assert np.isfinite(arr).all(), f"d{name} has non-finite values"
        np.testing.assert_allclose(arr[1], 0.0, atol=1e-6,
                                   err_msg=f"d{name} row-1 not zero")


def test_bf16_inputs():
    """bf16 q/k/v (the bench dtype) through the packed path."""
    B, H, S, D = 1, 2, 256, 64
    q, k, v = _qkv(8, B, H, S, D)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    ref = _xla_attention(qb, kb, vb, None)
    out = flash_attention(qb, kb, vb, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=2e-2)


def test_dispatch_threshold_covers_fusion_trunk(monkeypatch):
    """Round-3 crossover (scripts/flash_crossover.py): the head-packed
    merged-bwd kernel wins from S≈473 (fusion trunk) but not at S=299
    (audio) or S=70 (text). Pin the dispatcher to that measurement."""
    from mme_tpu.ops import attention as att
    monkeypatch.setattr(att.jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("MME_FLASH_MIN_SEQ", raising=False)
    monkeypatch.delenv("MME_FLASH", raising=False)
    assert att._decide_flash(1464, 64, None)      # video tower
    assert att._decide_flash(473, 64, None)       # fusion trunk (round 3)
    assert not att._decide_flash(299, 64, None)   # audio: XLA still wins
    assert not att._decide_flash(70, 64, None)    # text
    monkeypatch.setenv("MME_FLASH_MIN_SEQ", "200")
    assert att._decide_flash(299, 64, None)
    monkeypatch.setenv("MME_FLASH", "0")
    assert not att._decide_flash(1464, 64, None)


def test_block_sizes_reject_lane_rule_violations(monkeypatch):
    """A well-formed but lane-rule-violating MME_FLASH_BK_BWD (not a
    multiple of 128, less than the sequence) must fall back to the
    default with a warning instead of crashing every backward compile."""
    import warnings
    from mme_tpu.ops.flash_attention import (DEFAULT_BLOCK_K_BWD,
                                             _block_sizes)

    monkeypatch.setenv("MME_FLASH_BK_BWD", "300")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        bq, bk = _block_sizes(512, 2048, bwd=True)
    assert bk == DEFAULT_BLOCK_K_BWD
    assert any("lane rule" in str(x.message) for x in w)
    # full-sequence values are legal even when not 128-aligned
    monkeypatch.setenv("MME_FLASH_BK_BWD", "300")
    _, bk = _block_sizes(512, 300, bwd=True)
    assert bk == 300


def test_flat_path_d128_matches_xla():
    """D=128 (pack=1) rides the round-4 zero-relayout lane-sliced path —
    no zoo encoder uses it, but the dispatcher admits it; pin fwd+grads."""
    B, H, S, D = 1, 2, 200, 128
    q, k, v = _qkv(9, B, H, S, D)
    keep = np.ones((B, S), np.int32)
    keep[0, 170:] = 0
    bias = additive_mask(jnp.asarray(keep))
    ref = _xla_attention(q, k, v, bias)
    out = flash_attention(q, k, v, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    g_ref = jax.grad(lambda a, b, c: (_xla_attention(a, b, c, bias) ** 2
                                      ).sum(), argnums=(0, 1, 2))(q, k, v)
    g_fl = jax.grad(lambda a, b, c: (flash_attention(a, b, c, bias,
                                                     interpret=True) ** 2
                                     ).sum(), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_fl, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   err_msg=f"d{name} mismatch")


def test_flat_matches_packed_directly():
    """The flat (lane-sliced BlockSpec) and packed (host transpose) layouts
    share kernels byte-for-byte; their fwd+bwd outputs must agree exactly
    up to float noise on the SAME inputs — catches BlockSpec index-map
    regressions independent of the XLA oracle."""
    from mme_tpu.ops import flash_attention as fa
    B, H, S, D = 2, 4, 260, 64           # pack=2, multi-block, padded seq
    q, k, v = _qkv(10, B, H, S, D)
    keep = np.ones((B, S), np.int32)
    keep[0, 200:] = 0
    bias_k = np.zeros((B, S), np.float32)
    bias_k[keep == 0] = -1e9
    bias_k = jnp.asarray(bias_k)
    pack = fa._pack_factor(H, D)
    qs = q.transpose(0, 2, 1, 3)          # [B, S, H, D]
    ks = k.transpose(0, 2, 1, 3)
    vs = v.transpose(0, 2, 1, 3)

    def loss_flat(a, b, c):
        o = fa._flash_flat(a.reshape(B, S, H * D), b.reshape(B, S, H * D),
                           c.reshape(B, S, H * D), D, pack, True, bias_k)
        return (o ** 2).sum()

    def loss_packed(a, b, c):
        o = fa._flash(fa._pack_heads(a, pack), fa._pack_heads(b, pack),
                      fa._pack_heads(c, pack), D, pack, True, bias_k)
        return (o ** 2).sum()

    lf, gf = jax.value_and_grad(loss_flat, argnums=(0, 1, 2))(qs, ks, vs)
    lp, gp = jax.value_and_grad(loss_packed, argnums=(0, 1, 2))(qs, ks, vs)
    # element-wise forward comparison (ADVICE r4): the flat/packed outputs
    # are identical values in different layouts, but the ~133k-element fp32
    # scalar reduction may associate differently — compare the tensors, not
    # the loss sum
    o_flat = fa._flash_flat(qs.reshape(B, S, H * D), ks.reshape(B, S, H * D),
                            vs.reshape(B, S, H * D), D, pack, True, bias_k)
    o_packed = fa._flash(fa._pack_heads(qs, pack), fa._pack_heads(ks, pack),
                         fa._pack_heads(vs, pack), D, pack, True, bias_k)
    np.testing.assert_allclose(
        np.asarray(o_flat).reshape(B, S, H, D),
        np.asarray(fa._unpack_heads(o_packed, B, H, D, pack)), atol=1e-6,
        err_msg="flat vs packed forward (element-wise)")
    np.testing.assert_allclose(float(lf), float(lp), rtol=1e-5)
    for a, b, name in zip(gf, gp, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   err_msg=f"d{name} flat vs packed")
