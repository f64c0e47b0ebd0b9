"""Low-HBM-traffic AdamW: bf16 moment storage with stochastic rounding.

Round-2 profiling (BASELINE.md) put plain AdamW over the 605M-param
flagship at ~17 GB of HBM traffic per step (params + two fp32 moment trees,
read+write) — ~25 ms of a ~320 ms step, pure memory-bound time on the MXU's
idle dime. Storing both moments in bfloat16 halves their traffic and frees
~2.4 GB of HBM capacity (what made batch 12-16 OOM). The reference has no
counterpart (torch AdamW is fp32-state only, ``train_model/tav_train.py:148``);
this is a TPU-native capability addition.

Plain round-to-nearest bf16 moment storage stalls long EMAs: once
``|update| < ulp(moment)/2`` the moment stops moving. Writes therefore use
**stochastic rounding** — add uniform random low bits below the bf16
mantissa cut, then truncate — making each write unbiased
(``E[sr(x)] = x``), the standard recipe for low-precision optimizer state.
All *arithmetic* stays fp32; only storage is bf16.

Equivalence/quality coverage: tests/test_optim_lowmem.py (trajectory vs
fp32 optax.adamw, SR unbiasedness, quality-gate parity with bf16 state).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def stochastic_round_bf16(x: jax.Array, key: jax.Array) -> jax.Array:
    """fp32 → bf16 with unbiased stochastic rounding.

    Adds uniform random bits below the bf16 mantissa cut and truncates:
    a value q of the way between two representable bf16 neighbours rounds
    up with probability q. Works for negative values too (magnitude bits
    are offset-symmetric around the sign bit).
    """
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    noise = jax.random.bits(key, x.shape, jnp.uint32) & jnp.uint32(0xFFFF)
    bits = bits + noise
    bits = bits & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(bits, jnp.float32).astype(
        jnp.bfloat16)


class ScaleByAdamLowmemState(NamedTuple):
    count: jax.Array
    mu: Any       # bf16 pytree
    nu: Any       # bf16 pytree
    key: jax.Array


def _tree_keys(key: jax.Array, tree: Any) -> Any:
    leaves, treedef = jax.tree.flatten(tree)
    keys = jax.random.split(key, len(leaves))
    return jax.tree.unflatten(treedef, list(keys))


def scale_by_adam_lowmem(b1: float = 0.9, b2: float = 0.999,
                         eps: float = 1e-8,
                         seed: int = 0) -> optax.GradientTransformation:
    """optax.scale_by_adam with bf16 moment storage + stochastic rounding.

    SR noise uses the ``rbg`` PRNG (the TPU hardware RNG): threefry over
    2×params random words per step is a long VPU program that would eat the
    HBM savings (measured: 32.2 → 30.4 utt/s on the flagship). rbg is
    not splittable-safe for statistics but SR dither only needs uniform
    low bits."""

    def init_fn(params):
        mu = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.bfloat16), params)
        nu = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.bfloat16), params)
        return ScaleByAdamLowmemState(
            count=jnp.zeros((), jnp.int32), mu=mu, nu=nu,
            key=jax.random.key_data(jax.random.key(seed, impl="rbg")))

    def update_fn(updates, state, params=None):
        del params
        count = optax.safe_int32_increment(state.count)
        key = jax.random.wrap_key_data(state.key, impl="rbg")
        new_key, sub = jax.random.split(key)
        mu_keys = _tree_keys(jax.random.fold_in(sub, 0), updates)
        nu_keys = _tree_keys(jax.random.fold_in(sub, 1), updates)
        # EMA arithmetic in fp32; bf16 only at the storage boundary
        mu32 = jax.tree.map(
            lambda m, g: b1 * m.astype(jnp.float32)
            + (1.0 - b1) * g.astype(jnp.float32),
            state.mu, updates)
        nu32 = jax.tree.map(
            lambda n, g: b2 * n.astype(jnp.float32)
            + (1.0 - b2) * jnp.square(g.astype(jnp.float32)),
            state.nu, updates)
        c = count.astype(jnp.float32)
        bc1 = 1.0 - b1 ** c
        bc2 = 1.0 - b2 ** c
        out = jax.tree.map(
            lambda m, n, g: ((m / bc1) / (jnp.sqrt(n / bc2) + eps)
                             ).astype(g.dtype),
            mu32, nu32, updates)
        mu_new = jax.tree.map(stochastic_round_bf16, mu32, mu_keys)
        nu_new = jax.tree.map(stochastic_round_bf16, nu32, nu_keys)
        return out, ScaleByAdamLowmemState(
            count=count, mu=mu_new, nu=nu_new,
            key=jax.random.key_data(new_key))

    return optax.GradientTransformation(init_fn, update_fn)


def adamw_lowmem(learning_rate, b1: float = 0.9, b2: float = 0.999,
                 eps: float = 1e-8, weight_decay: float = 0.0,
                 seed: int = 0) -> optax.GradientTransformation:
    """AdamW (same decoupled-decay ordering as ``optax.adamw``) with bf16
    moment state."""
    return optax.chain(
        scale_by_adam_lowmem(b1=b1, b2=b2, eps=eps, seed=seed),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(learning_rate),
    )
