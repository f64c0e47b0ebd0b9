"""Fused transformer MLP (Pallas): fc1 → activation → fc2 in one kernel.

The round-2/3 perf decomposition (BASELINE.md) shows every tower stuck at
30-45% MXU with the gap spread across the elementwise interludes BETWEEN
matmuls: unfused, the [N, intermediate] fc1 activation (72 MB/layer at the
video tower's shapes) round-trips HBM at least twice in the forward pass
and again in the backward, and XLA additionally stores it for the backward
when rematerialization is off. This kernel keeps the intermediate entirely
in VMEM:

- **forward**: one row-block of x in, `act(x@W1+b1)@W2+b2` out — HBM
  traffic is x + W1/W2 + out, nothing else.
- **backward**: custom_vjp with IN-KERNEL RECOMPUTE — only x is saved as
  residual (the activation-memory win of remat without the separate
  recompute pass); one sequential pass over row blocks accumulates
  dW1/dW2/db1/db2 in VMEM while streaming dx out.

Both matmul legs run bf16×bf16 MXU passes with fp32 accumulation; the
activation and its derivative are evaluated in fp32 in VMEM.

Replaces (capability-wise) the reference's per-layer ``nn.Linear →
activation → nn.Linear`` stacks (e.g. ``utils/TAVFormer.py:100-115``); the
reference has no fused or custom kernels at all.

Dropout deliberately stays OUTSIDE the kernel: every dropout site in the
model zoo acts on the [N, hidden] OUTPUT (models/layers.py::Mlp), where
XLA already fuses mask-generation + apply into the residual add; fusing it
here would force an in-kernel RNG contract for a tensor 4× smaller than
the intermediate this kernel exists to keep off HBM.

MEASURED LIMIT (v5e, round 3): the backward's [H, F] fp32 dW accumulators
exceed Mosaic's 16 MB scoped-VMEM budget at every bench tower's shapes
(32 MB at wav2vec2's 1024×4096, 18.9 MB at the 768×3072 towers), so
``fused_mlp`` transparently falls back to the XLA path there — the kernel
only engages for configs with H·F ≲ 0.9M (e.g. distilled/small heads).
XLA's own epilogue fusion already runs the bench MLPs at ~82% of bf16
peak (BASELINE.md op-profile), so the fallback costs nothing measurable.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """erf via Abramowitz–Stegun 7.1.26 (max abs err 1.5e-7).

    Mosaic's TPU lowering (jax 0.9.0) has no rule for ``lax.erf_p`` /
    ``erfc`` — only exp/tanh — so ``jax.nn.gelu(approximate=False)``
    fails to lower inside a kernel. The 1.5e-7 polynomial error is far
    below the bf16 cast applied to the activation before the second
    matmul, so numerics parity with the HF exact-gelu path is preserved.
    """
    t = 1.0 / (1.0 + 0.3275911 * jnp.abs(x))
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    y = 1.0 - poly * jnp.exp(-x * x)
    return jnp.where(x >= 0, y, -y)


def _act_pair(name: str):
    """(f, df) for the activation — evaluated fp32 inside the kernel."""
    if name == "gelu":                      # exact (erf) — HF default
        def f(x):
            return 0.5 * x * (1.0 + _erf(x * (2.0 ** -0.5)))

        def df(x):
            cdf = 0.5 * (1.0 + _erf(x * (2.0 ** -0.5)))
            pdf = jnp.exp(-0.5 * x * x) * (1.0 / jnp.sqrt(2.0 * jnp.pi))
            return cdf + x * pdf
        return f, df
    if name == "gelu_new":                  # tanh approximation
        def f(x):
            return jax.nn.gelu(x, approximate=True)

        def df(x):
            c = jnp.sqrt(2.0 / jnp.pi)
            u = c * (x + 0.044715 * x ** 3)
            t = jnp.tanh(u)
            du = c * (1.0 + 3 * 0.044715 * x * x)
            return 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * du
        return f, df
    if name == "relu":
        return (lambda x: jnp.maximum(x, 0.0),
                lambda x: (x > 0).astype(jnp.float32))
    if name == "tanh":
        return jnp.tanh, lambda x: 1.0 - jnp.tanh(x) ** 2
    raise ValueError(f"unsupported fused-mlp activation {name}")


def _block_m(n_rows: int) -> int:
    try:
        bm = int(os.environ.get("MME_MLP_BM", "256"))
    except ValueError:
        bm = 256
    return min(max(bm, 8), max(n_rows, 8))


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, act: str):
    f, _ = _act_pair(act)
    h = jax.lax.dot_general(x_ref[...], w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    a = f(h + b1_ref[...].astype(jnp.float32))
    out = jax.lax.dot_general(a.astype(x_ref.dtype), w2_ref[...],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[...] = (out + b2_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _bwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, do_ref,
                dx_ref, dw1_ref, dw2_ref, db1_ref, db2_ref, *, act: str):
    """One row block per grid step; dW/db accumulate across the
    (sequential) grid into revisited output blocks."""
    f, df = _act_pair(act)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    x = x_ref[...]
    do = do_ref[...]
    h = jax.lax.dot_general(x, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    a_bf = f(h).astype(x.dtype)
    da = jax.lax.dot_general(do, w2_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dh = da * df(h)
    dh_bf = dh.astype(x.dtype)
    dx_ref[...] = jax.lax.dot_general(
        dh_bf, w1_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dx_ref.dtype)
    dw1_ref[...] += jax.lax.dot_general(
        x, dh_bf, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dw2_ref[...] += jax.lax.dot_general(
        a_bf, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db1_ref[...] += dh.sum(axis=0, keepdims=True)
    db2_ref[...] += do.astype(jnp.float32).sum(axis=0, keepdims=True)


def _pad_rows(x, target):
    pad = target - x.shape[0]
    return jnp.pad(x, ((0, pad), (0, 0))) if pad else x


# Mosaic's scoped-VMEM budget for a kernel's resident working set. The
# backward keeps BOTH [H, F] fp32 dW accumulators plus both weight blocks
# in VMEM for the whole grid — at wav2vec2 shapes (1024×4096) that is
# 32 MB of accumulators alone and the compile fails with a scoped-vmem
# OOM (measured on v5e; the 768×3072 towers exceed it too at 18.9 MB).
# Splitting F moves the traffic to dx-revisit HBM round-trips that cost
# more than the [N, F] intermediate the kernel exists to avoid, so the
# honest policy is: use the kernel only where the accumulators fit, and
# fall back to the XLA path (which fuses the activation into the matmul
# epilogue) everywhere else.
#
# The 16 MB budget is Mosaic's DEFAULT, not the hardware's: v5e has
# 128 MB of VMEM and ``CompilerParams.vmem_limit_bytes`` raises the
# per-kernel cap. MME_MLP_VMEM_MB lifts both the gate and the compiled
# limit together (e.g. 64 admits the 768×3072 towers, ~96 the wav2vec2
# 1024×4096 MLP) — at the cost of VMEM that Mosaic would otherwise use
# to double-buffer the streaming row blocks, so whether it WINS is an
# empirical, per-shape question (bench it before making it a default).
_SCOPED_VMEM = 16 * 1024 * 1024


def _vmem_budget() -> int:
    try:
        mb = int(os.environ.get("MME_MLP_VMEM_MB", "16"))
    except ValueError:
        mb = 16
    return max(mb, 16) * 1024 * 1024


def _compiler_params() -> pltpu.CompilerParams:
    budget = _vmem_budget()
    kw = {"vmem_limit_bytes": budget} if budget > _SCOPED_VMEM else {}
    return pltpu.CompilerParams(dimension_semantics=("arbitrary",), **kw)


def _bwd_fits_vmem(H: int, F: int, bm: int, itemsize: int) -> bool:
    acc = 2 * H * F * 4                      # dw1 + dw2 fp32 accumulators
    weights = 2 * H * F * itemsize           # w1 + w2 blocks (resident)
    rows = 3 * bm * H * itemsize             # x, do, dx blocks
    interm = 2 * bm * F * 4                  # h, dh fp32
    return acc + weights + rows + interm <= int(0.9 * _vmem_budget())


def fused_mlp(x, w1, b1, w2, b2, act: str = "gelu",
              interpret: bool = False):
    """``act(x @ w1 + b1) @ w2 + b2`` without materializing the
    intermediate to HBM. x: [N, H]; w1: [H, F]; w2: [F, H].

    Falls back to plain XLA ops when the backward kernel's VMEM working
    set cannot fit (see _bwd_fits_vmem) — numerics identical either way
    (bf16 matmul legs, fp32 activation)."""
    H, F = w1.shape
    if not interpret and not _bwd_fits_vmem(H, F, _block_m(x.shape[0]),
                                            jnp.dtype(x.dtype).itemsize):
        f, _ = _act_pair(act)
        h = jax.lax.dot_general(x, w1, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        a = f(h + b1.astype(jnp.float32)).astype(x.dtype)
        out = jax.lax.dot_general(a, w2, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        return (out + b2.astype(jnp.float32)).astype(x.dtype)
    return _fused_mlp_pallas(x, w1, b1, w2, b2, act, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _fused_mlp_pallas(x, w1, b1, w2, b2, act: str = "gelu",
                      interpret: bool = False):
    return _fwd(x, w1, b1, w2, b2, act, interpret)


def _fwd(x, w1, b1, w2, b2, act, interpret):
    N, H = x.shape
    F = w1.shape[1]
    bm = _block_m(N)
    Np = -(-N // bm) * bm
    xr = _pad_rows(x, Np)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, act=act),
        grid=(Np // bm,),
        in_specs=[
            pl.BlockSpec((bm, H), lambda i: (i, 0)),
            pl.BlockSpec((H, F), lambda i: (0, 0)),
            pl.BlockSpec((1, F), lambda i: (0, 0)),
            pl.BlockSpec((F, H), lambda i: (0, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, H), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Np, H), x.dtype),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(xr, w1, b1.reshape(1, F), w2, b2.reshape(1, H))
    return out[:N]


def _fused_mlp_fwd(x, w1, b1, w2, b2, act, interpret):
    return _fwd(x, w1, b1, w2, b2, act, interpret), (x, w1, b1, w2, b2)


def _fused_mlp_bwd(act, interpret, res, do):
    x, w1, b1, w2, b2 = res
    N, H = x.shape
    F = w1.shape[1]
    bm = _block_m(N)
    Np = -(-N // bm) * bm
    xr = _pad_rows(x, Np)
    dor = _pad_rows(do, Np)
    dx, dw1, dw2, db1, db2 = pl.pallas_call(
        functools.partial(_bwd_kernel, act=act),
        grid=(Np // bm,),
        in_specs=[
            pl.BlockSpec((bm, H), lambda i: (i, 0)),
            pl.BlockSpec((H, F), lambda i: (0, 0)),
            pl.BlockSpec((1, F), lambda i: (0, 0)),
            pl.BlockSpec((F, H), lambda i: (0, 0)),
            pl.BlockSpec((bm, H), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, H), lambda i: (i, 0)),
            pl.BlockSpec((H, F), lambda i: (0, 0)),
            pl.BlockSpec((F, H), lambda i: (0, 0)),
            pl.BlockSpec((1, F), lambda i: (0, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, H), x.dtype),
            jax.ShapeDtypeStruct((H, F), jnp.float32),
            jax.ShapeDtypeStruct((F, H), jnp.float32),
            jax.ShapeDtypeStruct((1, F), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(xr, w1, b1.reshape(1, F), w2, dor)
    return (dx[:N], dw1.astype(w1.dtype), db1[0].astype(b1.dtype),
            dw2.astype(w2.dtype), db2[0].astype(b2.dtype))


_fused_mlp_pallas.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)
