"""bf16-state AdamW (train/optim.py): SR unbiasedness, fp32 equivalence,
and that the state really is half-sized."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from mme_tpu.train.optim import adamw_lowmem, stochastic_round_bf16
from mme_tpu.train.steps import make_optimizer


def test_stochastic_round_unbiased():
    x = jnp.asarray([1.00390625e-3, -2.7182818, 3.1415926, 1e-8, -1e-8,
                     0.333333], jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), 4096)
    rounded = jax.vmap(lambda k: stochastic_round_bf16(x, k))(keys)
    mean = np.asarray(rounded.astype(jnp.float32)).mean(axis=0)
    # unbiased: the mean over many draws converges to the fp32 value far
    # below bf16's ~2^-8 relative ulp
    np.testing.assert_allclose(mean, np.asarray(x), rtol=2e-4, atol=1e-12)
    # and every draw is one of the two bf16 neighbours
    lo = np.asarray(x.astype(jnp.bfloat16).astype(jnp.float32))
    assert (np.abs(np.asarray(rounded.astype(jnp.float32)) - lo[None, :])
            <= np.abs(lo[None, :]) * 2 ** -7 + 1e-12).all()


def test_trajectory_matches_fp32_adamw():
    """200 steps on a quadratic: bf16-state trajectory tracks fp32 to well
    under bf16 resolution of the PARAMS (params stay fp32)."""
    target = jnp.asarray(np.random.RandomState(0).randn(64), jnp.float32)

    def loss_fn(p):
        return jnp.sum((p - target) ** 2)

    def run(tx):
        p = jnp.zeros((64,), jnp.float32)
        s = tx.init(p)

        @jax.jit
        def step(p, s):
            u, s = tx.update(jax.grad(loss_fn)(p), s, p)
            return optax.apply_updates(p, u), s

        for _ in range(200):
            p, s = step(p, s)
        return p

    p_ref = run(optax.adamw(1e-2, weight_decay=1e-4))
    p_low = run(adamw_lowmem(1e-2, weight_decay=1e-4))
    # SR noise random-walks the params by ~1e-2 over 200 steps (measured
    # max 8.6e-3) without biasing the optimum the trajectory tracks
    np.testing.assert_allclose(np.asarray(p_low), np.asarray(p_ref),
                               atol=3e-2)
    l_ref, l_low = float(loss_fn(p_ref)), float(loss_fn(p_low))
    assert abs(l_low - l_ref) / max(l_ref, 1e-9) < 0.02, (l_ref, l_low)


def test_make_optimizer_bf16_state_dtype():
    params = {"w": jnp.zeros((8, 8), jnp.float32),
              "b": jnp.zeros((8,), jnp.float32)}
    tx = make_optimizer(1e-3, 1e-4, 1.0, state_dtype="bf16")
    state = tx.init(params)
    moment_dtypes = {l.dtype for l in jax.tree.leaves(state)
                     if hasattr(l, "dtype") and l.shape == (8, 8)}
    assert moment_dtypes == {jnp.dtype(jnp.bfloat16)}, moment_dtypes
    # one update runs and produces finite fp32 updates
    g = jax.tree.map(jnp.ones_like, params)
    u, _ = tx.update(g, state, params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(u))
    assert u["w"].dtype == jnp.float32


def test_bf16_state_no_stall():
    """The motivating failure of round-to-nearest bf16 moments: tiny
    gradients must still move the EMA (stochastic rounding is unbiased);
    with plain bf16 rounding the moment freezes."""
    tx = adamw_lowmem(1e-3)
    p = jnp.ones((1024,), jnp.float32)
    s = tx.init(p)
    # gradient far below bf16 ulp of the (eventually ~1e-3-scale) moment
    g = jnp.full((1024,), 1e-3, jnp.float32)
    for _ in range(50):
        u, s = tx.update(g, s, p)
    mu = np.asarray(s[0].mu.astype(jnp.float32))
    expect = 1e-3 * (1 - 0.9 ** 50)
    # mean over 1024 independent SR draws ≈ the true fp32 EMA
    assert abs(mu.mean() - expect) / expect < 0.05
