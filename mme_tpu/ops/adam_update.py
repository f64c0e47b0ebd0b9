"""Fused Adam-with-bf16-state update (Pallas): EMA + bias-correct +
stochastic-round in one VMEM pass with IN-KERNEL hardware PRNG.

The XLA lowering of ``train/optim.py::scale_by_adam_lowmem`` materializes
the stochastic-rounding dither as a u32 tensor in HBM: `rng-bit-generator`
writes one u32 per parameter (~2.4 GB/step on the 605M flagship) that the
SR fusion immediately reads back (~1.3% + the two 32 ms
``bitcast-convert_convert_fusion`` sweeps in the round-4 xprof). The
dither is consumed exactly once — it never needs to exist in HBM.

This kernel runs the whole per-leaf update in one pass:

    m32 = b1·mu + (1−b1)·g          (fp32)
    n32 = b2·nu + (1−b2)·g²         (fp32)
    out = (m32/bc1) / (√(n32/bc2) + eps)
    mu' = sr_bf16(m32, lo16(prng)),  nu' = sr_bf16(n32, hi16(prng))

with ``pltpu.prng_random_bits`` generated in VMEM — HBM traffic is exactly
the reads of (g, mu, nu) and writes of (out, mu', nu'), the information-
theoretic minimum. The SR arithmetic is bit-identical to
``optim._sr_bf16`` (add 16-bit dither below the bf16 mantissa cut,
truncate), sharing one u32 draw across both moments exactly like
``stochastic_round_bf16_pair``.

Engages per leaf for ≥2-D leaves whose minor dim is 128-aligned
(every big tensor: embeddings [50265,768], matmul weights, conv kernels —
viewed as [size//minor, minor] without any copy); other leaves (biases,
scalars — a rounding error of the traffic) keep the XLA path.

MEASURED RESULT (v5e, round 4, scripts/adam_bench.py, in-jit chained
device timing): the kernel LOSES to the XLA path — 0.71× on the
[50265,768] embedding leaf (2.42 ms vs 1.72 ms fwd), 0.98× on a
[3072,768] weight. The premise (a u32 dither tensor round-tripping HBM)
does not hold: XLA fuses the rng-bit-generator directly into the SR
consumer fusion, so there was no traffic to save, and the Pallas grid
pipeline schedules the 6-buffer stream worse than XLA's single fusion.
``MME_FUSED_ADAM`` therefore defaults to **off** ("1" opts in; kept as
the measured-negative record and as the in-kernel-PRNG pattern
reference). Parity tests: tests/test_adam_update.py.

The reference has no counterpart (fp32-state torch AdamW,
``train_model/tav_train.py:148``).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TN = 256   # rows per grid step (minor dims are 128..3072 ⇒ ≤ 3 MB blocks)


def _sr_bf16_bits(x32: jax.Array, noise16: jax.Array) -> jax.Array:
    """fp32 → bf16, unbiased SR given 16-bit dither (u32, high half zero).
    Bit-identical to train/optim.py::_sr_bf16."""
    bits = jax.lax.bitcast_convert_type(x32, jnp.uint32)
    bits = (bits + noise16) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(bits, jnp.float32).astype(
        jnp.bfloat16)


def _kernel(bc_ref, seed_ref, g_ref, mu_ref, nu_ref,
            out_ref, mu_out_ref, nu_out_ref, *,
            b1: float, b2: float, eps: float, zero_noise: bool,
            interpret: bool):
    # bc_ref: [bc1, bc2] f32 smem; seed_ref: [s0, s1, leaf_tag] i32 smem
    bc1 = bc_ref[0]
    bc2 = bc_ref[1]
    if not zero_noise and not interpret:
        # Mosaic caps prng_seed at 2 values — fold leaf_tag / program_id
        # into the two step seeds (int32 wrap-around is fine for seeding)
        pltpu.prng_seed(
            seed_ref[0] ^ (seed_ref[2] * jnp.int32(-1640531527)),
            seed_ref[1] ^ (pl.program_id(0) * jnp.int32(-2048144789)))
    g32 = g_ref[:].astype(jnp.float32)
    m32 = b1 * mu_ref[:].astype(jnp.float32) + (1.0 - b1) * g32
    n32 = b2 * nu_ref[:].astype(jnp.float32) + (1.0 - b2) * g32 * g32
    out_ref[:] = ((m32 / bc1)
                  / (jnp.sqrt(n32 / bc2) + eps)).astype(out_ref.dtype)
    if zero_noise:  # deterministic truncation mode for parity tests
        noise = jnp.zeros(g32.shape, jnp.uint32)
    elif interpret:
        # prng_seed/prng_random_bits have no CPU lowering — a splitmix-ish
        # integer hash gives statistically-adequate dither for tests
        idx = (jax.lax.broadcasted_iota(jnp.uint32, g32.shape, 0)
               * jnp.uint32(g32.shape[1])
               + jax.lax.broadcasted_iota(jnp.uint32, g32.shape, 1)
               + jnp.uint32(pl.program_id(0) * _TN * g32.shape[1]))
        z = (idx + seed_ref[0].astype(jnp.uint32)
             * jnp.uint32(0x9E3779B9)
             + seed_ref[2].astype(jnp.uint32) * jnp.uint32(0x85EBCA6B))
        z = (z ^ (z >> 16)) * jnp.uint32(0x85EBCA6B)
        z = (z ^ (z >> 13)) * jnp.uint32(0xC2B2AE35)
        noise = z ^ (z >> 16)
    else:
        noise = pltpu.bitcast(pltpu.prng_random_bits(g32.shape), jnp.uint32)
    mu_out_ref[:] = _sr_bf16_bits(m32, noise & jnp.uint32(0xFFFF))
    nu_out_ref[:] = _sr_bf16_bits(n32, noise >> 16)


def fusable(p) -> bool:
    """Leaves the kernel handles: a copy-free 2-D view with a 128-aligned
    minor dim and enough rows to fill a tile. Default OFF (measured loss
    vs the XLA path — see module docstring); ``MME_FUSED_ADAM=1`` opts in."""
    mode = os.environ.get("MME_FUSED_ADAM", "0")
    if mode in ("0", ""):
        return False
    if jax.default_backend() != "tpu" and mode != "interpret":
        return False
    return (p.ndim >= 2 and p.shape[-1] % 128 == 0
            and p.size // p.shape[-1] >= 8 and p.size >= (1 << 16))


def adam_update_leaf(g: jax.Array, mu: jax.Array, nu: jax.Array,
                     bc1: jax.Array, bc2: jax.Array, seed: jax.Array,
                     leaf_tag: int, *, b1: float, b2: float, eps: float,
                     interpret: bool = False,
                     zero_noise: bool = False):
    """One leaf's fused update. g: any float dtype; mu/nu: bf16 (same
    shape). bc1/bc2: scalar f32 bias corrections; seed: [2] int32-ish
    stream id (per step); leaf_tag: static per-leaf stream separator.
    Returns (out[g.dtype], mu'[bf16], nu'[bf16])."""
    shape = g.shape
    minor = shape[-1]
    rows = g.size // minor
    g2 = g.reshape(rows, minor)
    bc = jnp.stack([bc1.astype(jnp.float32), bc2.astype(jnp.float32)])
    seeds = jnp.stack([seed[0].astype(jnp.int32),
                       seed[1].astype(jnp.int32),
                       jnp.int32(leaf_tag)])
    out, mu2, nu2 = pl.pallas_call(
        functools.partial(_kernel, b1=b1, b2=b2, eps=eps,
                          zero_noise=zero_noise, interpret=interpret),
        grid=(pl.cdiv(rows, _TN),),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_TN, minor), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TN, minor), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TN, minor), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TN, minor), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TN, minor), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TN, minor), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, minor), g.dtype),
            jax.ShapeDtypeStruct((rows, minor), jnp.bfloat16),
            jax.ShapeDtypeStruct((rows, minor), jnp.bfloat16),
        ],
        interpret=interpret,
    )(bc, seeds, g2, mu.reshape(rows, minor), nu.reshape(rows, minor))
    return (out.reshape(shape), mu2.reshape(shape), nu2.reshape(shape))
