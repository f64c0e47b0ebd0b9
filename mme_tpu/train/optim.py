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


def _sr_bf16(x: jax.Array, noise16: jax.Array) -> jax.Array:
    """fp32 → bf16 with unbiased stochastic rounding given uniform 16-bit
    dither (as u32 with the high half zero)."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    bits = (bits + noise16) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(bits, jnp.float32).astype(
        jnp.bfloat16)


def stochastic_round_bf16(x: jax.Array, key: jax.Array) -> jax.Array:
    """fp32 → bf16 with unbiased stochastic rounding.

    Adds uniform random bits below the bf16 mantissa cut and truncates:
    a value q of the way between two representable bf16 neighbours rounds
    up with probability q. Works for negative values too (magnitude bits
    are offset-symmetric around the sign bit).
    """
    noise = jax.random.bits(key, x.shape, jnp.uint32) & jnp.uint32(0xFFFF)
    return _sr_bf16(x, noise)


def stochastic_round_bf16_pair(a: jax.Array, b: jax.Array,
                               key: jax.Array) -> tuple:
    """SR two same-shape fp32 tensors from ONE u32 draw: ``a`` dithers with
    the low 16 bits, ``b`` with the high 16. Each output is individually
    unbiased (both halves are uniform u16); the per-element correlation
    between the two rounding errors is irrelevant at the ulp scale. Halves
    the RNG traffic of the bf16-moment optimizer — the round-3 profile put
    the two per-moment-tree rng-bit-generator sweeps at ~2 GB of generated
    bits per step on the 605M flagship."""
    bits = jax.random.bits(key, a.shape, jnp.uint32)
    return (_sr_bf16(a, bits & jnp.uint32(0xFFFF)),
            _sr_bf16(b, bits >> 16))


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
        from mme_tpu.ops import adam_update
        count = optax.safe_int32_increment(state.count)
        key = jax.random.wrap_key_data(state.key, impl="rbg")
        new_key, sub = jax.random.split(key)
        c = count.astype(jnp.float32)
        bc1 = 1.0 - b1 ** c
        bc2 = 1.0 - b2 ** c

        g_leaves, treedef = jax.tree.flatten(updates)
        mu_leaves = treedef.flatten_up_to(state.mu)
        nu_leaves = treedef.flatten_up_to(state.nu)
        fused = [adam_update.fusable(g) for g in g_leaves]

        # Fused path (ops/adam_update.py): the whole per-leaf update —
        # EMA + bias-correct + SR with IN-KERNEL hardware PRNG — in one
        # VMEM pass; skips materializing the u32 dither tensor in HBM
        # (~4.8 GB/step of rng write+read on the 605M flagship).
        sub_fused, sub_xla = jax.random.split(sub)
        seed32 = jax.lax.bitcast_convert_type(
            jax.random.bits(sub_fused, (2,), jnp.uint32), jnp.int32)
        outs, mus, nus = [], [], []
        xla_idx = [i for i, f in enumerate(fused) if not f]
        sr_keys = (jax.random.split(sub_xla, len(xla_idx))
                   if xla_idx else None)
        for i, (g, m, n) in enumerate(zip(g_leaves, mu_leaves, nu_leaves)):
            if fused[i]:
                o, m2, n2 = adam_update.adam_update_leaf(
                    g, m, n, bc1, bc2, seed32, i, b1=b1, b2=b2, eps=eps)
            else:
                # XLA fallback (small/unaligned leaves; all leaves on CPU):
                # EMA arithmetic fp32, one u32 draw dithers both moments
                m2f = (b1 * m.astype(jnp.float32)
                       + (1.0 - b1) * g.astype(jnp.float32))
                n2f = (b2 * n.astype(jnp.float32)
                       + (1.0 - b2) * jnp.square(g.astype(jnp.float32)))
                o = ((m2f / bc1) / (jnp.sqrt(n2f / bc2) + eps)
                     ).astype(g.dtype)
                m2, n2 = stochastic_round_bf16_pair(
                    m2f, n2f, sr_keys[xla_idx.index(i)])
            outs.append(o)
            mus.append(m2)
            nus.append(n2)
        return (jax.tree.unflatten(treedef, outs),
                ScaleByAdamLowmemState(
                    count=count,
                    mu=jax.tree.unflatten(treedef, mus),
                    nu=jax.tree.unflatten(treedef, nus),
                    key=jax.random.key_data(new_key)))

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


def global_norm_f32(tree: Any) -> jax.Array:
    """Global L2 norm with fp32 accumulation regardless of leaf dtype.

    ``optax.global_norm`` squares and reduces in the LEAF dtype — over a
    605M-element bf16 gradient tree the bf16-accumulated sum is garbage
    (8-bit mantissa), which would make clipping erratic. The fp32 upcast
    fuses into the reduction's load, so this costs no extra HBM traffic."""
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                        for x in leaves))


def clip_by_global_norm_f32(max_norm: float) -> optax.GradientTransformation:
    """``optax.clip_by_global_norm`` with fp32 norm accumulation — safe for
    bf16 gradient trees (``MME_GRADS=bf16``), identical for fp32."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        g_norm = global_norm_f32(updates)
        scale = jnp.minimum(1.0, max_norm / jnp.maximum(g_norm, 1e-16))
        updates = jax.tree.map(
            lambda u: (u.astype(jnp.float32) * scale).astype(u.dtype),
            updates)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


# ---------------------------------------------------------------------------
# Factored second moment (Adafactor's nu-factorization under Adam semantics)
# ---------------------------------------------------------------------------

# factor a leaf when its 2D view has at least this many elements; below it
# the full fp32 nu is cheaper than the two extra reductions
_FACTOR_MIN_SIZE = 16384


def _factored(p: jax.Array) -> bool:
    return p.ndim >= 2 and p.size >= _FACTOR_MIN_SIZE


def _rc_shape(p: jax.Array):
    """(rows, cols) of the 2D view: leading dims flattened, last dim kept —
    matches how every large leaf here is consumed (matmul weight [in, out],
    embedding [vocab, dim], conv kernel [..., features])."""
    return int(p.size // p.shape[-1]), int(p.shape[-1])


class ScaleByAdamFactoredState(NamedTuple):
    count: jax.Array
    mu: Any        # bf16 pytree (stochastic-rounded, as scale_by_adam_lowmem)
    nu_row: Any    # fp32 [rows] per factored leaf; [0] elsewhere
    nu_col: Any    # fp32 [cols] per factored leaf; [0] elsewhere
    nu_full: Any   # fp32 full nu for unfactored leaves; [0] elsewhere
    key: jax.Array


def scale_by_adam_factored(b1: float = 0.9, b2: float = 0.999,
                           eps: float = 1e-8,
                           seed: int = 0) -> optax.GradientTransformation:
    """Adam with a FACTORED second moment: for every matrix-shaped leaf, nu
    is stored as row/col EMAs of squared-gradient sums (Adafactor's rank-1
    reconstruction ``V ≈ R·Cᵀ / ΣR``) instead of a full params-sized tree —
    the nu storage drops from O(params) to O(rows+cols) (~1.2 GB → ~3 MB on
    the 605M flagship), removing its read+write HBM traffic entirely. The
    first moment keeps full bf16 storage with stochastic rounding (real
    momentum, unlike pure Adafactor which drops it). Arithmetic is fp32.
    """

    def init_fn(params):
        mu = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.bfloat16), params)

        # Unused slots are 1-element (NOT 0-element: the TPU runtime
        # rejects zero-sized buffers in donated/threaded state trees) and
        # freshly allocated PER LEAF: sharing one dummy array across
        # leaves donates the same device buffer multiple times in the
        # donated train step — INVALID_ARGUMENT on TPU (CPU ignores
        # donation, so only hardware runs caught it).
        def dummy(_p=None):
            return jnp.zeros((1,), jnp.float32)

        nu_row = jax.tree.map(
            lambda p: jnp.zeros((_rc_shape(p)[0],), jnp.float32)
            if _factored(p) else dummy(), params)
        nu_col = jax.tree.map(
            lambda p: jnp.zeros((_rc_shape(p)[1],), jnp.float32)
            if _factored(p) else dummy(), params)
        nu_full = jax.tree.map(
            lambda p: dummy() if _factored(p)
            else jnp.zeros(p.shape, jnp.float32), params)
        return ScaleByAdamFactoredState(
            count=jnp.zeros((), jnp.int32), mu=mu,
            nu_row=nu_row, nu_col=nu_col, nu_full=nu_full,
            key=jax.random.key_data(jax.random.key(seed, impl="rbg")))

    def update_fn(updates, state, params=None):
        del params
        count = optax.safe_int32_increment(state.count)
        key = jax.random.wrap_key_data(state.key, impl="rbg")
        new_key, sub = jax.random.split(key)
        mu_keys = _tree_keys(sub, updates)
        c = count.astype(jnp.float32)
        bc1 = 1.0 - b1 ** c
        bc2 = 1.0 - b2 ** c

        mu32 = jax.tree.map(
            lambda m, g: b1 * m.astype(jnp.float32)
            + (1.0 - b1) * g.astype(jnp.float32),
            state.mu, updates)

        def second_moment(g, r, cl, nf):
            g32 = g.astype(jnp.float32)
            if _factored(g):
                g2 = jnp.square(g32).reshape(_rc_shape(g))
                r_new = b2 * r + (1.0 - b2) * g2.sum(axis=1)
                c_new = b2 * cl + (1.0 - b2) * g2.sum(axis=0)
                # V ≈ outer(R, C) / ΣR; the EMA biases of R and C cancel
                # one ΣR bias, leaving a single 1/bc2 correction
                vhat = (r_new[:, None] * c_new[None, :]
                        / jnp.maximum(r_new.sum(), 1e-30)).reshape(g.shape)
                return vhat / bc2, (r_new, c_new, nf)
            n_new = b2 * nf + (1.0 - b2) * jnp.square(g32)
            return n_new / bc2, (r, cl, n_new)

        outs, news = [], []
        g_leaves, treedef = jax.tree.flatten(updates)
        m_leaves = treedef.flatten_up_to(mu32)
        r_leaves = treedef.flatten_up_to(state.nu_row)
        c_leaves = treedef.flatten_up_to(state.nu_col)
        f_leaves = treedef.flatten_up_to(state.nu_full)
        k_leaves = treedef.flatten_up_to(mu_keys)
        for g, m, r, cl, nf, k in zip(g_leaves, m_leaves, r_leaves,
                                      c_leaves, f_leaves, k_leaves):
            vcorr, new_state = second_moment(g, r, cl, nf)
            outs.append(((m / bc1) / (jnp.sqrt(vcorr) + eps)
                         ).astype(g.dtype))
            news.append(new_state)
        out = jax.tree.unflatten(treedef, outs)
        mu_new = jax.tree.map(stochastic_round_bf16, mu32, mu_keys)
        return out, ScaleByAdamFactoredState(
            count=count, mu=mu_new,
            nu_row=jax.tree.unflatten(treedef, [n[0] for n in news]),
            nu_col=jax.tree.unflatten(treedef, [n[1] for n in news]),
            nu_full=jax.tree.unflatten(treedef, [n[2] for n in news]),
            key=jax.random.key_data(new_key))

    return optax.GradientTransformation(init_fn, update_fn)


def adamw_factored(learning_rate, b1: float = 0.9, b2: float = 0.999,
                   eps: float = 1e-8, weight_decay: float = 0.0,
                   seed: int = 0) -> optax.GradientTransformation:
    """AdamW with bf16-SR first moment and factored second moment
    (``MME_OPT_STATE=factored``)."""
    return optax.chain(
        scale_by_adam_factored(b1=b1, b2=b2, eps=eps, seed=seed),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(learning_rate),
    )
