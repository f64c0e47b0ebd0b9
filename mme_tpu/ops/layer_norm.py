"""Fused LayerNorm (Pallas): stats + normalize + affine in one VMEM pass.

Why: the round-4 xprof over the 37.5 utt/s bench step shows LayerNorm as
the largest non-matmul cost — the video tower alone runs 12 forward LN
fusions at ~0.77 ms each (``convert_reduce_fusion.8..28``: f32 stat pair +
bf16[8,1464,768] normalize), ~9 ms/step of VPU-bound interludes between
MXU bursts, with matching backward fusions and more LN in the audio/fusion
towers. XLA schedules each as a multi-pass reduce + elementwise chain over
HBM; mathematically LN at these shapes is one read + one write.

This kernel does exactly that:

- **forward**: one row-block [TN, H] in VMEM → f32 mean/fast-variance →
  normalize → affine → cast. HBM traffic = x in, y out. Numerics mirror
  ``flax.linen.LayerNorm`` exactly (f32 stats and arithmetic regardless of
  input dtype, ``max(0, E[x²]−E[x]²)`` fast variance, single final cast) —
  see flax ``normalization._compute_stats``/``_normalize``.
- **backward**: custom_vjp saving only (x, scale). mean/rstd are
  RECOMPUTED in VMEM from the x block being read for dx anyway (a few VPU
  ops instead of two [N] residual streams), then the analytic LN gradient:
  ``dx = rstd·(gγ − mean(gγ) − x̂·mean(gγ·x̂))`` with per-tile dγ/dβ
  partials reduced by XLA (an [n_tiles, H] tree — microscopic).

The reference has no counterpart (eager torch LayerNorm throughout, e.g.
``utils/TAVFormer.py:100-115``); this is TPU-native perf work on top of
capability parity, exposed via ``ops.layer_norm.FusedLayerNorm`` (param
tree identical to ``nn.LayerNorm``: 'scale'/'bias').

MEASURED RESULT (v5e, round 4): STANDALONE the kernel wins where LN is
big — 1.11× fwd+bwd at the video tower's [11712, 768] (298 µs vs 332 µs,
scripts/ln_bench.py, in-jit chained device timing) — but IN-STEP it
LOSES: the full bench drops 37.75 → 36.49 utt/s/chip with the kernel on.
In context XLA does not schedule LN standalone: the stat pass fuses with
the preceding residual add / convert and the normalize epilogue feeds
the next matmul's operand conversion, so the kernel's one-pass saving is
outweighed by the fusions it breaks. ``MME_FUSED_LN`` therefore defaults
to **off** ("1" opts in; kept as the measured-negative record — same
verdict as the fused MLP at these shapes, BASELINE.md). Parity tests:
tests/test_layer_norm.py (fwd/grad vs flax, f32 + bf16, interpret mode).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows per grid step: 256×1024 bf16 blocks are 512 KB — small enough that
# fwd (x,y) and bwd (g,x,dx + partials) stay far under the VMEM budget
# with double buffering, big enough to amortize grid overhead.
_TN = 256


def _num_tiles(n: int) -> int:
    return pl.cdiv(n, _TN)


def _fwd_kernel(x_ref, s_ref, b_ref, y_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)                      # [TN, H]
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, axis=1, keepdims=True)
                      - mean * mean, 0.0)                 # flax fast variance
    mul = jax.lax.rsqrt(var + eps) * s_ref[:].astype(jnp.float32)
    y = (x - mean) * mul + b_ref[:].astype(jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)


def _bwd_kernel(g_ref, x_ref, s_ref, dx_ref, ds_ref, db_ref, *,
                eps: float, n_rows: int):
    x = x_ref[:].astype(jnp.float32)                      # [TN, H]
    g = g_ref[:].astype(jnp.float32)
    h = x.shape[1]
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, axis=1, keepdims=True)
                      - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x - mean) * rstd
    gg = g * s_ref[:].astype(jnp.float32)
    m1 = jnp.sum(gg, axis=1, keepdims=True) * (1.0 / h)
    m2 = jnp.sum(gg * xhat, axis=1, keepdims=True) * (1.0 / h)
    dx_ref[:] = (rstd * (gg - m1 - xhat * m2)).astype(dx_ref.dtype)
    # per-tile dscale/dbias partials; rows past n_rows in the final
    # (padded) block hold unspecified pad data — mask them out. Partials
    # are written as (8, H) blocks (Mosaic needs sublane multiples of 8):
    # stride-8 row groups sum into 8 sublane rows; XLA reduces the rest.
    row0 = pl.program_id(0) * _TN
    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], 1), 0)
    valid = rows < n_rows  # where (not *): pad rows can be NaN, NaN*0=NaN
    tn, h = x.shape

    def _group8(v):
        return jnp.sum(v.reshape(tn // 8, 8, h), axis=0)

    ds_ref[:] = _group8(jnp.where(valid, g * xhat, 0.0))
    db_ref[:] = _group8(jnp.where(valid, g, 0.0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_ln(x2d, scale, bias, eps, interpret):
    y, = _fwd_call(x2d, scale, bias, eps, interpret)
    return y


def _fwd_call(x2d, scale, bias, eps, interpret):
    n, h = x2d.shape
    return (pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(_num_tiles(n),),
        in_specs=[
            pl.BlockSpec((_TN, h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TN, h), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h), x2d.dtype),
        interpret=interpret,
    )(x2d, scale.reshape(1, h), bias.reshape(1, h)),)


def _fused_ln_fwd(x2d, scale, bias, eps, interpret):
    return _fused_ln(x2d, scale, bias, eps, interpret), (x2d, scale)


def _fused_ln_bwd(eps, interpret, res, gy):
    x2d, scale = res
    n, h = x2d.shape
    tiles = _num_tiles(n)
    dx, ds_part, db_part = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps, n_rows=n),
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((_TN, h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TN, h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TN, h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h), x2d.dtype),
            jax.ShapeDtypeStruct((tiles * 8, h), jnp.float32),
            jax.ShapeDtypeStruct((tiles * 8, h), jnp.float32),
        ],
        interpret=interpret,
    )(gy, x2d, scale.reshape(1, h))
    dscale = jnp.sum(ds_part, axis=0).astype(scale.dtype)
    dbias = jnp.sum(db_part, axis=0).astype(scale.dtype)
    return dx, dscale, dbias


_fused_ln.defvjp(_fused_ln_fwd, _fused_ln_bwd)


def fused_layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
                     eps: float = 1e-6, *,
                     interpret: bool = False) -> jax.Array:
    """LayerNorm over the last axis of ``x`` (any leading shape), flax
    numerics, fused into one Pallas pass. scale/bias: [H]."""
    h = x.shape[-1]
    y = _fused_ln(x.reshape(-1, h), scale, bias, float(eps), interpret)
    return y.reshape(x.shape)


def use_fused_ln(h: int, dtype, rows: int = 1 << 30) -> bool:
    """Default OFF (measured in-step loss vs XLA's LN fusions — see module
    docstring); ``MME_FUSED_LN=1`` opts in on TPU for lane-aligned feature
    dims. Tiny inputs (pooled [B, H] tower norms) stay on XLA either way."""
    mode = os.environ.get("MME_FUSED_LN", "0")
    if mode in ("0", ""):
        return False
    if mode == "interpret":
        return True
    return (jax.default_backend() == "tpu" and h % 128 == 0
            and rows >= 1024
            and dtype in (jnp.float32, jnp.bfloat16))


class FusedLayerNorm(nn.Module):
    """Drop-in ``nn.LayerNorm`` (last-axis, scale+bias) backed by the
    fused kernel on TPU; identical param tree ('scale'/'bias'), identical
    flax numerics, falls back to ``nn.LayerNorm`` math elsewhere so CPU
    tests and init run the reference path."""

    epsilon: float = 1e-6
    dtype: object = jnp.float32
    param_dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (h,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros_init(), (h,),
                          self.param_dtype)
        mode = os.environ.get("MME_FUSED_LN", "0")
        if not self.is_initializing() and use_fused_ln(
                h, self.dtype, rows=x.size // h):
            return fused_layer_norm(x, scale, bias, self.epsilon,
                                    interpret=mode == "interpret")
        # flax-identical fallback (f32 stats + arithmetic, final cast)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.maximum(jnp.mean(x32 * x32, axis=-1, keepdims=True)
                          - mean * mean, 0.0)
        mul = jax.lax.rsqrt(var + self.epsilon) * scale.astype(jnp.float32)
        y = (x32 - mean) * mul + bias.astype(jnp.float32)
        return y.astype(self.dtype)
