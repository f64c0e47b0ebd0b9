"""Fused Adam update kernel (ops/adam_update.py) vs the XLA reference math
in train/optim.py — interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mme_tpu.ops.adam_update import adam_update_leaf, fusable
from mme_tpu.train.optim import _sr_bf16

B1, B2, EPS = 0.9, 0.999, 1e-8


def _reference(g, mu, nu, bc1, bc2):
    g32 = g.astype(jnp.float32)
    m32 = B1 * mu.astype(jnp.float32) + (1 - B1) * g32
    n32 = B2 * nu.astype(jnp.float32) + (1 - B2) * g32 * g32
    out = ((m32 / bc1) / (jnp.sqrt(n32 / bc2) + EPS)).astype(g.dtype)
    return out, m32, n32


@pytest.mark.parametrize("shape,gdtype", [
    ((300, 256), jnp.float32),     # 300 rows: pads the 256-row tile
    ((1024, 128), jnp.float32),
    ((17, 8, 384), jnp.bfloat16),  # >2D leaf, bf16 grads (MME_GRADS=bf16)
])
def test_matches_reference_zero_noise(shape, gdtype):
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    g = (jax.random.normal(k1, shape, jnp.float32) * 0.1).astype(gdtype)
    mu = (jax.random.normal(k2, shape, jnp.float32) * 0.05
          ).astype(jnp.bfloat16)
    nu = (jax.random.uniform(k3, shape, jnp.float32) * 1e-3
          ).astype(jnp.bfloat16)
    bc1 = jnp.float32(1 - B1 ** 7)
    bc2 = jnp.float32(1 - B2 ** 7)
    seed = jnp.array([5, 9], jnp.int32)
    out, mu2, nu2 = adam_update_leaf(
        g, mu, nu, bc1, bc2, seed, 3, b1=B1, b2=B2, eps=EPS,
        interpret=True, zero_noise=True)
    ref_out, m32, n32 = _reference(g, mu, nu, bc1, bc2)
    assert out.dtype == g.dtype
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref_out, np.float32),
                               rtol=2e-5, atol=2e-6)
    # zero dither == the optimizer's _sr_bf16 with zero noise (truncation).
    # The kernel's fp32 EMA may differ from this trace's by 1-2 ulps (XLA
    # FMA contraction), which can flip a truncation boundary — so assert
    # membership in the truncation bracket of the fp32 value ±2 ulps.
    for got, exact, mag in ((mu2, m32, B1 * np.abs(mu.astype(jnp.float32))
                             + (1 - B1) * np.abs(np.asarray(g, np.float32))),
                            (nu2, n32, np.asarray(n32))):
        _assert_in_trunc_bracket(got, exact, mag)


def _assert_in_trunc_bracket(got, exact, mag=None):
    """``got`` must be a truncation/round-up of ``exact`` ± fp32 FMA slop.
    ``mag``: magnitude of the EMA summands — with cancellation the product
    rounding error is relative to the SUMMANDS, not the result."""
    exact = np.asarray(exact, np.float32)
    slack = np.float32(2 ** -22) * (np.asarray(mag, np.float32)
                                    if mag is not None else np.abs(exact))
    lo2 = np.nextafter(exact - slack, -np.inf)
    hi2 = np.nextafter(exact + slack, np.inf)
    gotf = np.asarray(got, np.float32)
    # truncation/round-up are monotone, so any SR output of any fp32 value
    # in [lo2, hi2] lies in [trunc(lo2), roundup(hi2)] — an interval check
    # (candidate equality breaks near zero where the bf16 grid is dense)
    def _ends(v):  # achievable SR outputs of v (trunc flips for negatives)
        a = np.asarray(_sr_bf16(jnp.asarray(v),
                                jnp.zeros(v.shape, jnp.uint32)), np.float32)
        b = np.asarray(_sr_bf16(jnp.asarray(v),
                                jnp.full(v.shape, 0xFFFF, jnp.uint32)),
                       np.float32)
        return a, b

    lo_b = np.minimum(*_ends(lo2))
    hi_b = np.maximum(*_ends(hi2))
    ok = (gotf >= lo_b) & (gotf <= hi_b)
    assert ok.all(), f"{(~ok).sum()} values outside the truncation bracket"


def test_sr_outputs_bracket_the_fp32_value():
    """With real in-kernel noise each bf16 moment must be one of the two
    bf16 neighbours of the fp32 EMA (SR never moves more than one ulp)."""
    k1, k2, k3 = jax.random.split(jax.random.key(1), 3)
    shape = (256, 128)
    g = jax.random.normal(k1, shape, jnp.float32) * 0.1
    mu = (jax.random.normal(k2, shape, jnp.float32) * 0.05
          ).astype(jnp.bfloat16)
    nu = (jax.random.uniform(k3, shape, jnp.float32) * 1e-3
          ).astype(jnp.bfloat16)
    bc1 = jnp.float32(0.5)
    bc2 = jnp.float32(0.1)
    _, mu2, nu2 = adam_update_leaf(
        g, mu, nu, bc1, bc2, jnp.array([1, 2], jnp.int32), 0,
        b1=B1, b2=B2, eps=EPS, interpret=True)
    _, m32, n32 = _reference(g, mu, nu, bc1, bc2)
    mag_m = (B1 * np.abs(np.asarray(mu, np.float32))
             + (1 - B1) * np.abs(np.asarray(g, np.float32)))
    for got, exact, mag in ((mu2, m32, mag_m), (nu2, n32, np.asarray(n32))):
        _assert_in_trunc_bracket(got, exact, mag)


def test_fusable_predicate(monkeypatch):
    monkeypatch.setenv("MME_FUSED_ADAM", "interpret")
    assert fusable(jnp.zeros((512, 768)))
    assert fusable(jnp.zeros((3, 3, 128, 256)))       # conv kernel
    assert not fusable(jnp.zeros((768,)))             # bias: 1-D
    assert not fusable(jnp.zeros((512, 100)))         # unaligned minor
    assert not fusable(jnp.zeros((128, 128)))         # too small
    monkeypatch.setenv("MME_FUSED_ADAM", "0")
    assert not fusable(jnp.zeros((512, 768)))
