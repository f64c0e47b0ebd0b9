"""bf16-state AdamW (train/optim.py): SR unbiasedness, fp32 equivalence,
and that the state really is half-sized."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from mme_tpu.train.optim import (adamw_factored, adamw_lowmem,
                                 stochastic_round_bf16)
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


def test_factored_first_update_matches_adam_on_rank1():
    """With identical gradient entries, G² is exactly rank-1, so the
    factored reconstruction V ≈ R·Cᵀ/ΣR is EXACT and the first update must
    equal fp32 Adam's (mu arithmetic is fp32 pre-rounding)."""
    p = jnp.zeros((256, 128), jnp.float32)  # ≥ _FACTOR_MIN_SIZE → factored
    g = jnp.full((256, 128), 0.25, jnp.float32)
    tx_f = adamw_factored(1e-2)
    tx_r = optax.adamw(1e-2)
    u_f, _ = tx_f.update(g, tx_f.init(p), p)
    u_r, _ = tx_r.update(g, tx_r.init(p), p)
    np.testing.assert_allclose(np.asarray(u_f), np.asarray(u_r),
                               rtol=1e-5, atol=1e-8)


def test_factored_converges_and_state_is_small():
    """General (full-rank G²) case: the rank-1 nu is an approximation, so
    assert convergence on a quadratic plus the storage claim — total state
    ≈ 0.5×params (bf16 mu) + O(rows+cols), vs fp32 Adam's 2×params."""
    target = jnp.asarray(np.random.RandomState(1).randn(128, 128),
                         jnp.float32)
    tx = adamw_factored(3e-2)
    p = jnp.zeros((128, 128), jnp.float32)
    s = tx.init(p)

    # storage: mu bf16 (2 B/param) + row/col fp32 + count/key only
    state_bytes = sum(l.size * l.dtype.itemsize
                      for l in jax.tree.leaves(s) if hasattr(l, "size"))
    assert state_bytes < p.size * 4 * 0.6, state_bytes  # < 0.6× params fp32

    @jax.jit
    def step(p, s):
        g = jax.grad(lambda q: jnp.sum((q - target) ** 2))(p)
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s

    for _ in range(300):
        p, s = step(p, s)
    final = float(jnp.sum((p - target) ** 2))
    assert final < 0.05 * float(jnp.sum(target ** 2)), final


def test_make_optimizer_factored_state():
    params = {"w": jnp.zeros((256, 128), jnp.float32),
              "b": jnp.zeros((8,), jnp.float32)}
    tx = make_optimizer(1e-3, 1e-4, 1.0, state_dtype="factored")
    state = tx.init(params)
    shapes = {tuple(l.shape) for l in jax.tree.leaves(state)
              if hasattr(l, "shape")}
    # no full-size fp32 nu for w: only the bf16 mu carries (256, 128)
    full = [l for l in jax.tree.leaves(state)
            if hasattr(l, "shape") and tuple(l.shape) == (256, 128)]
    assert all(l.dtype == jnp.bfloat16 for l in full), full
    assert (256,) in shapes and (128,) in shapes  # row/col factors exist
    g = jax.tree.map(jnp.ones_like, params)
    u, _ = tx.update(g, state, params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(u))


def test_clip_f32_matches_optax_on_fp32():
    from mme_tpu.train.optim import clip_by_global_norm_f32
    tree = {"a": jnp.asarray(np.random.RandomState(2).randn(64, 16),
                             jnp.float32),
            "b": jnp.full((128,), 3.0, jnp.float32)}
    u_ref, _ = optax.clip_by_global_norm(0.5).update(
        tree, optax.EmptyState())
    u_f32, _ = clip_by_global_norm_f32(0.5).update(tree, optax.EmptyState())
    for k in tree:
        np.testing.assert_allclose(np.asarray(u_f32[k]),
                                   np.asarray(u_ref[k]), rtol=1e-6)


def test_bf16_grads_train_step_converges():
    """MME_GRADS=bf16 seam: a tiny model trains through make_train_step
    with bf16 gradient storage + bf16-SR optimizer state and the loss
    falls; the returned grad-norm stays finite fp32."""
    from mme_tpu.train.steps import TrainState, make_train_step

    w_true = jnp.asarray(np.random.RandomState(3).randn(8, 4), jnp.float32)

    def apply_fn(variables, batch, deterministic=True, rngs=None):
        return batch["x"] @ variables["params"]["w"]

    tx = make_optimizer(5e-2, 0.0, 1.0, state_dtype="bf16")
    params = {"w": jnp.zeros((8, 4), jnp.float32)}
    state = TrainState.create(params, tx, use_accum=False)
    step = make_train_step(apply_fn, tx, num_classes=4,
                           grads_dtype=jnp.bfloat16, donate=False)
    x = jnp.asarray(np.random.RandomState(4).randn(64, 8), jnp.float32)
    labels = jnp.argmax(x @ w_true, axis=-1)
    cw = jnp.ones((4,), jnp.float32)
    mask = jnp.ones((64,), jnp.int32)
    one = jnp.asarray(1.0, jnp.float32)
    yes = jnp.asarray(True)
    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(60):
        state, loss, _, gn = step(state, {"x": x}, labels, mask, cw, one,
                                  yes, rng)
        losses.append(float(loss))
        assert np.isfinite(float(gn))
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])


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


def test_stochastic_round_pair_unbiased_both_halves():
    """stochastic_round_bf16_pair dithers two tensors from ONE u32 draw
    (low/high 16 bits) — both outputs must be individually unbiased and
    land on bf16 neighbours (optim.py round-3 rng-traffic halving)."""
    from mme_tpu.train.optim import stochastic_round_bf16_pair
    a = jnp.asarray([1.00390625e-3, -2.7182818, 3.1415926, 1e-8, -1e-8,
                     0.333333], jnp.float32)
    b = -0.37 * a
    keys = jax.random.split(jax.random.PRNGKey(7), 4096)
    ra, rb = jax.vmap(lambda k: stochastic_round_bf16_pair(a, b, k))(keys)
    for x, r in ((a, ra), (b, rb)):
        mean = np.asarray(r.astype(jnp.float32)).mean(axis=0)
        np.testing.assert_allclose(mean, np.asarray(x), rtol=2e-4,
                                   atol=1e-12)
        lo = np.asarray(x.astype(jnp.bfloat16).astype(jnp.float32))
        assert (np.abs(np.asarray(r.astype(jnp.float32)) - lo[None, :])
                <= np.abs(lo[None, :]) * 2 ** -7 + 1e-12).all()
