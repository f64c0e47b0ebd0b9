"""FlashAttention-2 for TPU (Pallas): fused online-softmax attention.

The hot op of every tower (SURVEY.md §7 "fused modality-block-masked flash
attention"): the VideoMAE tower runs 12 layers × 1464-1568 tokens and the
fusion trunk ~500-3000 fused tokens (``models/tav.py:487``); XLA's unfused
attention materializes the [S, S] logits in HBM per head. This kernel keeps
the running max/denominator in VMEM (forward) and recomputes probabilities
from the saved logsumexp (backward) — standard FA2 with an additive
key-bias (our modality/padding masks are all key masks, [B, S_k]).

Both passes are Pallas kernels wired through ``jax.custom_vjp``; numerics
are validated against the XLA reference path in interpret mode
(tests/test_flash_attention.py) and on hardware by the benchmark.

Layout: q, k, v are [B, H, S, D] with D ∈ {64, 128}; fp32 softmax state;
matmuls hit the MXU via ``preferred_element_type=float32``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 512


def _block_sizes(seq_q: int, seq_k: int):
    """Read MME_FLASH_BQ/BK at TRACE time (a jitted fn keeps the block
    sizes it was compiled with — rebuild the jit to re-read). Invalid or
    non-positive values fall back to the defaults instead of crashing
    every attention call."""
    import os

    def read(name, default):
        try:
            v = int(os.environ.get(name, default))
        except (TypeError, ValueError):
            return default
        return v if v > 0 else default

    bq = min(read("MME_FLASH_BQ", DEFAULT_BLOCK_Q), seq_q)
    bk = min(read("MME_FLASH_BK", DEFAULT_BLOCK_K), seq_k)
    return bq, bk


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *,
                scale: float, block_k: int, seq_k: int):
    q = q_ref[0].astype(jnp.float32) * scale        # [bq, d]
    bq, d = q.shape
    num_kb = pl.cdiv(seq_k, block_k)

    m = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc = jnp.zeros((bq, d), jnp.float32)

    def body(kb, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        b = bias_ref[0, 0, pl.ds(kb * block_k, block_k)].astype(
            jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)      # [bq, bk]
        s = s + b[None, :]
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l = l * alpha + p.sum(axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l, acc

    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m, l, acc))
    l_safe = jnp.where(l > 0, l, 1.0)
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l_safe)


def _dq_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
               dq_ref, *, scale: float, block_k: int, seq_k: int):
    q = q_ref[0].astype(jnp.float32)                # [bq, d]
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]                                # [bq, 1]
    delta = delta_ref[0]
    bq, d = q.shape
    num_kb = pl.cdiv(seq_k, block_k)

    def body(kb, dq):
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        b = bias_ref[0, 0, pl.ds(kb * block_k, block_k)].astype(
            jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = s + b[None, :]
        p = jnp.exp(s - lse)                        # [bq, bk]
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return dq + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, num_kb, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, *, scale: float, block_q: int, seq_q: int):
    k = k_ref[0].astype(jnp.float32)                # [bk, d]
    v = v_ref[0].astype(jnp.float32)
    b = bias_ref[0, 0].astype(jnp.float32)          # [bk]
    bk, d = k.shape
    num_qb = pl.cdiv(seq_q, block_q)

    def body(qb, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(qb * block_q, block_q)]
        delta = delta_ref[0, pl.ds(qb * block_q, block_q)]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = s + b[None, :]
        p = jnp.exp(s - lse)                        # [bq, bk]
        dv = dv + jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)                       # [bq, bk]
        dk = dk + jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        return dk, dv

    dk0 = jnp.zeros((bk, d), jnp.float32)
    dv0 = jnp.zeros((bk, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_qb, body, (dk0, dv0))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_seq(x, target, value=0.0):
    pad = target - x.shape[1]
    if pad == 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[1] = (0, pad)
    return jnp.pad(x, cfg, constant_values=value)


def _fwd(q, k, v, bias_k, *, interpret=False):
    B, H, Sq0, D = q.shape
    Sk0 = k.shape[2]
    bq, bk = _block_sizes(Sq0, Sk0)
    # pad both sequence axes to block multiples; padded keys get NEG_INF
    # bias (ignored by softmax), padded queries are sliced off the output
    Sq, Sk = _round_up(Sq0, bq), _round_up(Sk0, bk)
    scale = 1.0 / (D ** 0.5)
    BH = B * H
    qr = _pad_seq(q.reshape(BH, Sq0, D), Sq)
    kr = _pad_seq(k.reshape(BH, Sk0, D), Sk)
    vr = _pad_seq(v.reshape(BH, Sk0, D), Sk)
    bias_k = _pad_seq(bias_k, Sk, NEG_INF)[:, None, :]  # [B, 1, Sk]
    grid = (BH, pl.cdiv(Sq, bq))
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, block_k=bk, seq_k=Sk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Sk, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Sk, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, Sk), lambda b, i: (b // H, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, bq, 1), lambda b, i: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Sq, D), q.dtype),
            jax.ShapeDtypeStruct((BH, Sq, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qr, kr, vr, bias_k)
    return out[:, :Sq0].reshape(B, H, Sq0, D), lse[:, :Sq0, 0]


def _bwd(q, k, v, bias_k, out, lse, do, *, interpret=False):
    B, H, Sq0, D = q.shape
    Sk0 = k.shape[2]
    bq, bk = _block_sizes(Sq0, Sk0)
    Sq, Sk = _round_up(Sq0, bq), _round_up(Sk0, bk)
    scale = 1.0 / (D ** 0.5)
    BH = B * H
    qr = _pad_seq(q.reshape(BH, Sq0, D), Sq)
    kr = _pad_seq(k.reshape(BH, Sk0, D), Sk)
    vr = _pad_seq(v.reshape(BH, Sk0, D), Sk)
    bias_k = _pad_seq(bias_k, Sk, NEG_INF)[:, None, :]  # [B, 1, Sk]
    outr = _pad_seq(out.reshape(BH, Sq0, D), Sq)
    dor = _pad_seq(do.reshape(BH, Sq0, D), Sq)
    lse = _pad_seq(lse, Sq)[..., None]                  # [BH, Sq, 1]
    delta = (outr.astype(jnp.float32) *
             dor.astype(jnp.float32)).sum(-1, keepdims=True)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, block_k=bk, seq_k=Sk),
        grid=(BH, pl.cdiv(Sq, bq)),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Sk, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Sk, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, Sk), lambda b, i: (b // H, 0, 0)),
            pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, bq, 1), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, bq, 1), lambda b, i: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, Sq, D), q.dtype),
        interpret=interpret,
    )(qr, kr, vr, bias_k, dor, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, block_q=bq, seq_q=Sq),
        grid=(BH, pl.cdiv(Sk, bk)),
        in_specs=[
            pl.BlockSpec((1, Sq, D), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, bk, D), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, bk, D), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, 1, bk), lambda b, j: (b // H, 0, j)),
            pl.BlockSpec((1, Sq, D), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, Sq, 1), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, Sq, 1), lambda b, j: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, D), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, bk, D), lambda b, j: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Sk, D), k.dtype),
            jax.ShapeDtypeStruct((BH, Sk, D), v.dtype),
        ],
        interpret=interpret,
    )(qr, kr, vr, bias_k, dor, lse, delta)

    return (dq[:, :Sq0].reshape(B, H, Sq0, D),
            dk[:, :Sk0].reshape(B, H, Sk0, D),
            dv[:, :Sk0].reshape(B, H, Sk0, D))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash(q, k, v, interpret, bias_k):
    out, _ = _fwd(q, k, v, bias_k, interpret=interpret)
    return out


def _flash_fwd(q, k, v, interpret, bias_k):
    out, lse = _fwd(q, k, v, bias_k, interpret=interpret)
    return out, (q, k, v, bias_k, out, lse)


def _flash_bwd(interpret, res, do):
    q, k, v, bias_k, out, lse = res
    dq, dk, dv = _bwd(q, k, v, bias_k, out, lse, do, interpret=interpret)
    return dq, dk, dv, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    bias: Optional[jax.Array] = None,
                    *, interpret: bool = False) -> jax.Array:
    """softmax(QK^T/sqrt(D) + bias)V with fused kernels.

    ``bias``: None or a key-mask bias broadcastable from [B, 1, 1, S_k]
    (what ``ops.attention.additive_mask`` produces). General [B, H, Sq, Sk]
    biases are not supported here — the dispatcher falls back to XLA.
    """
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    if bias is None:
        bias_k = jnp.zeros((B, Sk), jnp.float32)
    else:
        assert bias.ndim == 4 and bias.shape[1] == 1 and bias.shape[2] == 1, (
            f"flash_attention supports key-mask bias only, got {bias.shape}")
        bias_k = bias[:, 0, 0, :].astype(jnp.float32)
    return _flash(q, k, v, interpret, bias_k)
