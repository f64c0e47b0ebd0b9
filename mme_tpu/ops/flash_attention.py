"""FlashAttention-2 for TPU (Pallas): fused online-softmax attention.

The hot op of every tower (SURVEY.md §7 "fused modality-block-masked flash
attention"): the VideoMAE tower runs 12 layers × 1464-1568 tokens and the
fusion trunk ~500-3000 fused tokens (``models/tav.py:487``); XLA's unfused
attention materializes the [S, S] logits in HBM per head. This kernel keeps
the running max/denominator in VMEM (forward) and recomputes probabilities
from the saved logsumexp (backward) — standard FA2 with an additive
key-bias (our modality/padding masks are all key masks, [B, S_k]).

TPU layout design (round 3 — this is where the HBM traffic went in round 2):

- **Head packing.** Every encoder in the zoo has head_dim 64 and an even
  head count; Mosaic pads a 64-wide lane dimension to 128, doubling the
  VMEM footprint and HBM traffic of every q/k/v/o/do/dq/dk/dv buffer
  (BASELINE.md attributes ~0.9 GB/layer of padded bwd buffers and the
  batch-16 OOM to this). We pack PAIRS of heads into one 128-lane operand
  ``[B*H/2, S, 128]`` and run two independent 64-dim softmax streams per
  kernel instance — all buffers are lane-exact, zero padding.
- **Lane-major softmax state.** lse/delta were ``[BH, S, 1]`` — a minor
  dim of 1 that Mosaic pads 1→128 (a 128× buffer expansion). They are now
  ``[G, PACK, S]`` with the sequence on lanes; the kernels transpose the
  tiny [PACK, bq] tile in-register where a column view is needed.
- **Head-minor API.** ``flash_attention_shd`` takes ``[B, S, H, D]`` —
  the layout the fused QKV projection already produces — so packing is a
  single relayout (the same cost the old [B,H,S,D] transpose paid) and
  the unpacked output lands directly in ``[B, S, H*D]`` for the output
  projection. No extra transposes anywhere in the layer.
- **Zero-relayout lane slicing (round 4).** Even that single relayout is
  gone: in the row-major ``[B, S, H·D]`` tensor, a 128-lane chunk IS an
  adjacent head pair, so the BlockSpecs index the lane dimension with the
  head-group grid axis and DMA blocks straight out of the flat tensor
  (``_fwd_flat``/``_bwd_flat``). The round-4 copy profile attributed part
  of a ~10% copies long-tail to the pack/unpack transposes (8 full-tensor
  relayouts per attention call through fwd+bwd); this path has none.

Both passes are Pallas kernels wired through ``jax.custom_vjp``; numerics
are validated against the XLA reference path in interpret mode
(tests/test_flash_attention.py) and on hardware by the benchmark.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LSE_MASKED = 1e30  # lse sentinel for fully-masked rows: exp(s - 1e30) == 0
DEFAULT_BLOCK_Q = 512   # 512/512 measured 33.9 vs 33.1 utt/s at 256/512
DEFAULT_BLOCK_K = 512   # bench.py raises BK to full-seq (measured 37.4)
DEFAULT_BLOCK_K_BWD = 512  # lane-dim rule: bk must be a multiple of 128
#                            (the [B,1,Sk] bias block carries bk on lanes)
#                            or the full padded seq; 512 keeps the merged
#                            bwd kernel ~9 MB of scoped VMEM (16 MB budget)


def _block_sizes(seq_q: int, seq_k: int, bwd: bool = False):
    """Read MME_FLASH_BQ/BK at TRACE time (a jitted fn keeps the block
    sizes it was compiled with — rebuild the jit to re-read). Invalid or
    non-positive values fall back to the defaults instead of crashing
    every attention call.

    ``bwd``: the backward reads MME_FLASH_BK_BWD for its k-tile (default
    DEFAULT_BLOCK_K_BWD). The full-sequence K block that wins the FORWARD
    (one K pass per q block, measured 37.4 vs 33.9 utt/s, BASELINE.md) is
    VMEM-hostile in the merged backward: its s/p/dp temporaries are
    [bk, bq] fp32, and bk=1464 · bq=512 puts the kernel at ~16.3 MB of
    scoped VMEM — right at the 16 MB budget, where compile success
    depended on allocator luck. The backward was measured a WASH between
    bk=512 and bk=1464 (its dq-accumulator revisit traffic is ~1 MB per
    extra k-tile — noise), so it keeps a small tile and the forward keeps
    the full-sequence win."""
    import os

    def read(name, default):
        try:
            v = int(os.environ.get(name, default))
        except (TypeError, ValueError):
            return default
        return v if v > 0 else default

    bq = min(read("MME_FLASH_BQ", DEFAULT_BLOCK_Q), seq_q)
    if bq < seq_q and bq % 128 != 0:
        # same lane rule as bk below: the [G, pack, bq] lse/delta blocks
        # carry bq on lanes, so a partial-seq q-tile must be a multiple
        # of 128 — an ill-shaped MME_FLASH_BQ from the environment falls
        # back with a warning instead of crashing every attention compile.
        import warnings
        good = min(DEFAULT_BLOCK_Q, seq_q)
        warnings.warn(f"MME_FLASH_BQ={bq} violates the lane rule (multiple"
                      f" of 128 or the full sequence {seq_q}) — using "
                      f"{good}", stacklevel=2)
        bq = good
    if bwd:
        bk = min(read("MME_FLASH_BK_BWD", DEFAULT_BLOCK_K_BWD), seq_k)
        name = "MME_FLASH_BK_BWD"
        default = DEFAULT_BLOCK_K_BWD
    else:
        bk = min(read("MME_FLASH_BK", DEFAULT_BLOCK_K), seq_k)
        name = "MME_FLASH_BK"
        default = DEFAULT_BLOCK_K
    if bk < seq_k and bk % 128 != 0:
        # lane rule: the [B,1,bk] bias block carries bk on lanes — a
        # partial-seq k-tile must be a multiple of 128 or Mosaic rejects
        # the kernel at compile time. Honor the "invalid values fall
        # back" contract instead of crashing every attention call.
        import warnings
        good = min(default, seq_k)
        warnings.warn(f"{name}={bk} violates the lane rule (multiple of "
                      f"128 or the full sequence {seq_k}) — using {good}",
                      stacklevel=2)
        bk = good
    return bq, bk


def _compiler_params(*semantics):
    return pltpu.CompilerParams(dimension_semantics=semantics)


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *,
                scale: float, block_k: int, seq_k: int, pack: int,
                head_dim: int):
    # MXU dtype discipline (this was round 3's second flash win): inputs
    # stay in their storage dtype (bf16 on the mixed-precision path) and
    # every dot accumulates fp32 via preferred_element_type — a bf16×bf16
    # MXU pass runs ~4-8× the fp32 rate on v5e, and bf16 inputs carry no
    # extra precision an fp32 matmul could use. Probabilities are cast to
    # the value dtype for the PV matmul — exactly the numerics of the XLA
    # reference path (ops/attention.py::_xla_attention).
    q = q_ref[0]                                    # [bq, pack*d]
    bq = q.shape[0]
    d = head_dim
    num_kb = pl.cdiv(seq_k, block_k)

    init = tuple(jnp.full((bq, 1), NEG_INF, jnp.float32) for _ in range(pack)) \
        + tuple(jnp.zeros((bq, 1), jnp.float32) for _ in range(pack)) \
        + tuple(jnp.zeros((bq, d), jnp.float32) for _ in range(pack))

    def body(kb, carry):
        ms, ls, accs = carry[:pack], carry[pack:2 * pack], carry[2 * pack:]
        k = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v = v_ref[0, pl.ds(kb * block_k, block_k), :]
        b = bias_ref[0, 0, pl.ds(kb * block_k, block_k)].astype(jnp.float32)
        new = []
        for h in range(pack):
            qh = q[:, h * d:(h + 1) * d]
            kh = k[:, h * d:(h + 1) * d]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [bq, bk] fp32
            s = s * scale + b[None, :]
            m_new = jnp.maximum(ms[h], s.max(axis=-1, keepdims=True))
            alpha = jnp.exp(ms[h] - m_new)
            p = jnp.exp(s - m_new)
            l_new = ls[h] * alpha + p.sum(axis=-1, keepdims=True)
            vh = v[:, h * d:(h + 1) * d]
            acc_new = accs[h] * alpha + jax.lax.dot_general(
                p.astype(v.dtype), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            new.append((m_new, l_new, acc_new))
        return tuple(x[0] for x in new) + tuple(x[1] for x in new) \
            + tuple(x[2] for x in new)

    out = jax.lax.fori_loop(0, num_kb, body, init)
    ms, ls, accs = out[:pack], out[pack:2 * pack], out[2 * pack:]
    outs, lses = [], []
    for h in range(pack):
        l_safe = jnp.where(ls[h] > 0, ls[h], 1.0)
        outs.append(accs[h] / l_safe)
        # fully-masked rows: +inf sentinel so the bwd recompute yields p=0
        # (m + log l would be -inf, making exp(s - lse) overflow)
        lses.append(jnp.where(ls[h] > 0, ms[h] + jnp.log(l_safe),
                              LSE_MASKED))
    o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)
    # [bq, pack] -> [pack, bq]: sequence on lanes in HBM (no minor-1 dim)
    lse_ref[0] = jnp.concatenate(lses, axis=1).T


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float, block_q: int,
                seq_q: int, pack: int, head_dim: int):
    """Merged FA2 backward: ONE score recompute serves dq, dk and dv.

    Grid is (head-group, k-tile); each instance loops over q-tiles. s is
    computed TRANSPOSED ([bk, bq], keys on sublanes) so the per-query
    lse/delta rows broadcast for free; dk/dv accumulate in the fori carry,
    while dq accumulates across k-tiles into a REVISITED fp32 output block
    (constant index over the sequential j axis — zeroed at j == 0). The
    previous two-kernel split (dq-kernel + dkv-kernel) recomputed s and dp
    twice and loaded q/do/k/v twice; profiling put the pair at ~2.5 ms per
    video layer — the merge removes ~2/7 of the backward matmul passes."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        dq_ref[...] = jnp.zeros_like(dq_ref)

    k = k_ref[0]                                    # [bk, pack*d]
    v = v_ref[0]
    b_col = bias_ref[0].astype(jnp.float32).T        # [1,bk] -> [bk,1]
    bk = k.shape[0]
    d = head_dim
    num_qb = pl.cdiv(seq_q, block_q)

    def body(qb, carry):
        dks, dvs = carry[:pack], carry[pack:]
        q = q_ref[0, pl.ds(qb * block_q, block_q), :]
        do = do_ref[0, pl.ds(qb * block_q, block_q), :]
        new_k, new_v = [], []
        for h in range(pack):
            qh = q[:, h * d:(h + 1) * d]
            kh = k[:, h * d:(h + 1) * d]
            vh = v[:, h * d:(h + 1) * d]
            doh = do[:, h * d:(h + 1) * d]
            lse_row = lse_ref[0, h:h + 1, pl.ds(qb * block_q, block_q)]
            delta_row = delta_ref[0, h:h + 1, pl.ds(qb * block_q, block_q)]
            s_t = jax.lax.dot_general(kh, qh, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            s_t = s_t * scale + b_col                # [bk, bq] fp32
            p_t = jnp.exp(s_t - lse_row)
            new_v.append(dvs[h] + jax.lax.dot_general(
                p_t.astype(do.dtype), doh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            dp_t = jax.lax.dot_general(vh, doh, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            ds_t = (p_t * (dp_t - delta_row)).astype(q.dtype)
            new_k.append(dks[h] + jax.lax.dot_general(
                ds_t, qh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            # dq_h += scale · ds_hᵀ @ k_h  (contraction over this k-tile)
            dq_ref[0, pl.ds(qb * block_q, block_q), h * d:(h + 1) * d] += (
                jax.lax.dot_general(ds_t, kh, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                * scale)
        return tuple(new_k) + tuple(new_v)

    init = tuple(jnp.zeros((bk, d), jnp.float32) for _ in range(2 * pack))
    out = jax.lax.fori_loop(0, num_qb, body, init)
    dks, dvs = out[:pack], out[pack:]
    dk_ref[0] = (jnp.concatenate(dks, axis=1) * scale).astype(dk_ref.dtype)
    dv_ref[0] = jnp.concatenate(dvs, axis=1).astype(dv_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_seq(x, target, value=0.0):
    pad = target - x.shape[1]
    if pad == 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[1] = (0, pad)
    return jnp.pad(x, cfg, constant_values=value)


def _pack_factor(H: int, D: int) -> int:
    """Heads packed per 128-lane operand. D=64 + even H → 2 (lane-exact);
    anything else → 1 (D=128 is already lane-exact; odd-H D=64 pays the
    legacy VMEM padding but stays correct)."""
    return 2 if (D == 64 and H % 2 == 0) else 1


def _flat_ok(pack: int, D: int) -> bool:
    """Zero-relayout lane-sliced path: legal whenever a pack·D lane chunk
    is 128-aligned, i.e. for every encoder in the zoo (D=64 even heads,
    D=128 any heads). Odd-H D=64 keeps the legacy transpose+pad path."""
    return (pack * D) % 128 == 0


def _pack_heads(x, pack):
    """[B, S, H, D] → [B*H//pack, S, pack*D]. Adjacent heads share a
    128-lane operand; the reshape is free (H·D contiguous), the transpose
    is the same relayout the old [B,H,S,D] layout paid."""
    B, S, H, D = x.shape
    G = H // pack
    return x.reshape(B, S, G, pack * D).transpose(0, 2, 1, 3).reshape(
        B * G, S, pack * D)


def _unpack_heads(x, B, H, D, pack):
    """[B*H//pack, S, pack*D] → [B, S, H, D]."""
    G = H // pack
    S = x.shape[1]
    return x.reshape(B, G, S, pack * D).transpose(0, 2, 1, 3).reshape(
        B, S, H, D)


def _fwd_packed(q, k, v, bias_k, head_dim, pack, interpret):
    G, Sq0, PD = q.shape
    B = bias_k.shape[0]
    gpb = G // B                                     # head-groups per batch
    Sk0 = k.shape[1]
    bq, bk = _block_sizes(Sq0, Sk0)
    # pad both sequence axes to block multiples; padded keys get NEG_INF
    # bias (ignored by softmax), padded queries are sliced off the output
    Sq, Sk = _round_up(Sq0, bq), _round_up(Sk0, bk)
    scale = 1.0 / (head_dim ** 0.5)
    qr = _pad_seq(q, Sq)
    kr = _pad_seq(k, Sk)
    vr = _pad_seq(v, Sk)
    bias = _pad_seq(bias_k, Sk, NEG_INF)[:, None, :]  # [B, 1, Sk]
    grid = (G, pl.cdiv(Sq, bq))
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, block_k=bk, seq_k=Sk,
                          pack=pack, head_dim=head_dim),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, PD), lambda g, i: (g, i, 0)),
            pl.BlockSpec((1, Sk, PD), lambda g, i: (g, 0, 0)),
            pl.BlockSpec((1, Sk, PD), lambda g, i: (g, 0, 0)),
            pl.BlockSpec((1, 1, Sk), lambda g, i, gpb=gpb: (g // gpb, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, PD), lambda g, i: (g, i, 0)),
            pl.BlockSpec((1, pack, bq), lambda g, i: (g, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, Sq, PD), q.dtype),
            jax.ShapeDtypeStruct((G, pack, Sq), jnp.float32),
        ],
        compiler_params=_compiler_params("parallel", "parallel"),
        interpret=interpret,
    )(qr, kr, vr, bias)
    return out[:, :Sq0], lse[:, :, :Sq0]


def _bwd_packed(q, k, v, bias_k, out, lse, do, head_dim, pack, interpret):
    G, Sq0, PD = q.shape
    B = bias_k.shape[0]
    gpb = G // B
    Sk0 = k.shape[1]
    bq, bk = _block_sizes(Sq0, Sk0, bwd=True)
    Sq, Sk = _round_up(Sq0, bq), _round_up(Sk0, bk)
    scale = 1.0 / (head_dim ** 0.5)
    qr = _pad_seq(q, Sq)
    kr = _pad_seq(k, Sk)
    vr = _pad_seq(v, Sk)
    bias = _pad_seq(bias_k, Sk, NEG_INF)[:, None, :]  # [B, 1, Sk]
    dor = _pad_seq(do, Sq)
    # lse [G, pack, Sq0]: pad the SEQUENCE axis (axis 2) with the masked
    # sentinel so padded-query rows recompute p = 0
    lse_p = jnp.pad(lse, ((0, 0), (0, 0), (0, Sq - Sq0)),
                    constant_values=LSE_MASKED)
    # delta_h = sum_d(out_h * do_h), per packed head, sequence on lanes
    of = out.astype(jnp.float32)
    dof = do.astype(jnp.float32)
    d = head_dim
    delta = jnp.stack(
        [(of[..., h * d:(h + 1) * d] * dof[..., h * d:(h + 1) * d]).sum(-1)
         for h in range(pack)], axis=1)               # [G, pack, Sq0]
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, Sq - Sq0)))

    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, block_q=bq, seq_q=Sq,
                          pack=pack, head_dim=head_dim),
        grid=(G, pl.cdiv(Sk, bk)),
        in_specs=[
            pl.BlockSpec((1, Sq, PD), lambda g, j: (g, 0, 0)),
            pl.BlockSpec((1, bk, PD), lambda g, j: (g, j, 0)),
            pl.BlockSpec((1, bk, PD), lambda g, j: (g, j, 0)),
            pl.BlockSpec((1, 1, bk), lambda g, j, gpb=gpb: (g // gpb, 0, j)),
            pl.BlockSpec((1, Sq, PD), lambda g, j: (g, 0, 0)),
            pl.BlockSpec((1, pack, Sq), lambda g, j: (g, 0, 0)),
            pl.BlockSpec((1, pack, Sq), lambda g, j: (g, 0, 0)),
        ],
        out_specs=[
            # dq is revisited across the sequential k-tile axis (constant
            # index over j) and accumulated in fp32; cast back outside
            pl.BlockSpec((1, Sq, PD), lambda g, j: (g, 0, 0)),
            pl.BlockSpec((1, bk, PD), lambda g, j: (g, j, 0)),
            pl.BlockSpec((1, bk, PD), lambda g, j: (g, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, Sq, PD), jnp.float32),
            jax.ShapeDtypeStruct((G, Sk, PD), k.dtype),
            jax.ShapeDtypeStruct((G, Sk, PD), v.dtype),
        ],
        compiler_params=_compiler_params("parallel", "arbitrary"),
        interpret=interpret,
    )(qr, kr, vr, bias, dor, lse_p, delta)

    return dq[:, :Sq0].astype(q.dtype), dk[:, :Sk0], dv[:, :Sk0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash(q, k, v, head_dim, pack, interpret, bias_k):
    out, _ = _fwd_packed(q, k, v, bias_k, head_dim, pack, interpret)
    return out


def _flash_fwd(q, k, v, head_dim, pack, interpret, bias_k):
    out, lse = _fwd_packed(q, k, v, bias_k, head_dim, pack, interpret)
    return out, (q, k, v, bias_k, out, lse)


def _flash_bwd(head_dim, pack, interpret, res, do):
    q, k, v, bias_k, out, lse = res
    dq, dk, dv = _bwd_packed(q, k, v, bias_k, out, lse, do, head_dim, pack,
                             interpret)
    return dq, dk, dv, None


_flash.defvjp(_flash_fwd, _flash_bwd)


# ---------------------------------------------------------------------------
# Zero-relayout lane-sliced layout (round 4): the packed layout above pays a
# real HBM transpose per tensor ([B,S,H,D] → [B·G,S,pack·D] swaps S and the
# head-group axis) — ~8 full-tensor relayouts per attention call across
# fwd+bwd, the "head-pack relayouts" line of the round-4 copy profile. But
# in the row-major [B, S, H·D] tensor the QKV projection ALREADY
# materializes, a pack·D lane chunk at offset g·pack·D IS a pair of adjacent
# heads, 128-lane exact. So instead of transposing on the host, the
# BlockSpecs below index the lane dimension with the head-group grid axis
# and DMA each [bq, pack·D] block straight out of the flat tensor. The
# kernels are byte-identical to the packed path; only the specs differ.
# Operands/results stay [B, S, H·D] end to end (the reshape from/to
# [B, S, H, D] at the API boundary cancels against the caller's own
# reshapes under XLA), so the flash path now touches ZERO relayout copies.
# ---------------------------------------------------------------------------


def _fwd_flat(q, k, v, bias_k, head_dim, pack, interpret):
    """q, k, v: [B, S, H·D] lane-flat → (out [B, Sq, H·D],
    lse [B·G, pack, Sq]) where G = H // pack."""
    B, Sq0, HD = q.shape
    PD = pack * head_dim
    G = HD // PD
    Sk0 = k.shape[1]
    bq, bk = _block_sizes(Sq0, Sk0)
    Sq, Sk = _round_up(Sq0, bq), _round_up(Sk0, bk)
    scale = 1.0 / (head_dim ** 0.5)
    qr = _pad_seq(q, Sq)
    kr = _pad_seq(k, Sk)
    vr = _pad_seq(v, Sk)
    bias = _pad_seq(bias_k, Sk, NEG_INF)[:, None, :]  # [B, 1, Sk]
    grid = (B * G, pl.cdiv(Sq, bq))
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, block_k=bk, seq_k=Sk,
                          pack=pack, head_dim=head_dim),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, PD), lambda g, i, G=G: (g // G, i, g % G)),
            pl.BlockSpec((1, Sk, PD), lambda g, i, G=G: (g // G, 0, g % G)),
            pl.BlockSpec((1, Sk, PD), lambda g, i, G=G: (g // G, 0, g % G)),
            pl.BlockSpec((1, 1, Sk), lambda g, i, G=G: (g // G, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, PD), lambda g, i, G=G: (g // G, i, g % G)),
            pl.BlockSpec((1, pack, bq), lambda g, i: (g, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Sq, HD), q.dtype),
            jax.ShapeDtypeStruct((B * G, pack, Sq), jnp.float32),
        ],
        compiler_params=_compiler_params("parallel", "parallel"),
        interpret=interpret,
    )(qr, kr, vr, bias)
    return out[:, :Sq0], lse[:, :, :Sq0]


def _bwd_flat(q, k, v, bias_k, out, lse, do, head_dim, pack, interpret):
    """Flat-layout merged backward. q/k/v/out/do: [B, S, H·D];
    lse: [B·G, pack, Sq]. Returns (dq, dk, dv) flat."""
    B, Sq0, HD = q.shape
    PD = pack * head_dim
    G = HD // PD
    Sk0 = k.shape[1]
    bq, bk = _block_sizes(Sq0, Sk0, bwd=True)
    Sq, Sk = _round_up(Sq0, bq), _round_up(Sk0, bk)
    scale = 1.0 / (head_dim ** 0.5)
    qr = _pad_seq(q, Sq)
    kr = _pad_seq(k, Sk)
    vr = _pad_seq(v, Sk)
    bias = _pad_seq(bias_k, Sk, NEG_INF)[:, None, :]  # [B, 1, Sk]
    dor = _pad_seq(do, Sq)
    lse_p = jnp.pad(lse, ((0, 0), (0, 0), (0, Sq - Sq0)),
                    constant_values=LSE_MASKED)
    # delta_h = sum_d(out_h · do_h): [B, Sq0, H] then heads to sublanes —
    # a [B, H, Sq] transpose of a TINY tensor (no head_dim axis), the only
    # non-flat touch in the whole path
    prod = (out.astype(jnp.float32) * do.astype(jnp.float32)).reshape(
        B, Sq0, G * pack, head_dim).sum(-1)            # [B, Sq0, H]
    delta = prod.transpose(0, 2, 1).reshape(B * G, pack, Sq0)
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, Sq - Sq0)))

    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, block_q=bq, seq_q=Sq,
                          pack=pack, head_dim=head_dim),
        grid=(B * G, pl.cdiv(Sk, bk)),
        in_specs=[
            pl.BlockSpec((1, Sq, PD), lambda g, j, G=G: (g // G, 0, g % G)),
            pl.BlockSpec((1, bk, PD), lambda g, j, G=G: (g // G, j, g % G)),
            pl.BlockSpec((1, bk, PD), lambda g, j, G=G: (g // G, j, g % G)),
            pl.BlockSpec((1, 1, bk), lambda g, j, G=G: (g // G, 0, j)),
            pl.BlockSpec((1, Sq, PD), lambda g, j, G=G: (g // G, 0, g % G)),
            pl.BlockSpec((1, pack, Sq), lambda g, j: (g, 0, 0)),
            pl.BlockSpec((1, pack, Sq), lambda g, j: (g, 0, 0)),
        ],
        out_specs=[
            # dq is revisited across the sequential k-tile axis (constant
            # index over j) and accumulated in fp32; cast back outside
            pl.BlockSpec((1, Sq, PD), lambda g, j, G=G: (g // G, 0, g % G)),
            pl.BlockSpec((1, bk, PD), lambda g, j, G=G: (g // G, j, g % G)),
            pl.BlockSpec((1, bk, PD), lambda g, j, G=G: (g // G, j, g % G)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Sq, HD), jnp.float32),
            jax.ShapeDtypeStruct((B, Sk, HD), k.dtype),
            jax.ShapeDtypeStruct((B, Sk, HD), v.dtype),
        ],
        compiler_params=_compiler_params("parallel", "arbitrary"),
        interpret=interpret,
    )(qr, kr, vr, bias, dor, lse_p, delta)

    return dq[:, :Sq0].astype(q.dtype), dk[:, :Sk0], dv[:, :Sk0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_flat(q, k, v, head_dim, pack, interpret, bias_k):
    out, _ = _fwd_flat(q, k, v, bias_k, head_dim, pack, interpret)
    return out


def _flash_flat_fwd(q, k, v, head_dim, pack, interpret, bias_k):
    out, lse = _fwd_flat(q, k, v, bias_k, head_dim, pack, interpret)
    return out, (q, k, v, bias_k, out, lse)


def _flash_flat_bwd(head_dim, pack, interpret, res, do):
    q, k, v, bias_k, out, lse = res
    dq, dk, dv = _bwd_flat(q, k, v, bias_k, out, lse, do, head_dim, pack,
                           interpret)
    return dq, dk, dv, None


_flash_flat.defvjp(_flash_flat_fwd, _flash_flat_bwd)


# ---------------------------------------------------------------------------
# SPMD partitioning (multi-chip): a pallas_call is an opaque custom call to
# GSPMD/Shardy, so under a pjit mesh the partitioner's last resort is to
# gather the full operands onto every device before running the kernel —
# exactly the round-3 README caveat. ``custom_partitioning`` teaches the
# partitioner the kernel's actual rule: batch and heads are embarrassingly
# parallel (shard freely over dp/mp axes), sequence and head_dim must be
# replicated (flash needs every key for each query). Each shard then runs
# the kernel on its local [B/dp, S, H/mp, D] block with zero collectives.
# The per-shard pack factor adapts to the LOCAL head count, so a tp split
# that leaves an odd number of heads per shard stays correct (pack=1).
# Engaged when more than one device is visible (``MME_FLASH_SPMD``:
# auto/1/0) — the single-chip bench path keeps the packed custom_vjp below
# with zero change. Numerics are identical on both paths (same kernels).
# ---------------------------------------------------------------------------


def _flash_spmd_enabled() -> bool:
    import os
    mode = os.environ.get("MME_FLASH_SPMD", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    return jax.device_count() > 1


def _fwd_unpacked(q, k, v, bias_k, interpret):
    """[B, Sq, H, D] forward → (out [B, Sq, H, D], lse [B, H, Sq])."""
    B, Sq, H, D = q.shape
    pack = _pack_factor(H, D)
    if _flat_ok(pack, D):
        out, lse = _fwd_flat(q.reshape(B, Sq, H * D),
                             k.reshape(B, -1, H * D),
                             v.reshape(B, -1, H * D), bias_k, D, pack,
                             interpret)
        return out.reshape(B, Sq, H, D), lse.reshape(B, H, Sq)
    out, lse = _fwd_packed(_pack_heads(q, pack), _pack_heads(k, pack),
                           _pack_heads(v, pack), bias_k, D, pack, interpret)
    # lse [B·H/pack, pack, Sq]: group-major head order → plain reshape
    return _unpack_heads(out, B, H, D, pack), lse.reshape(B, H, Sq)


def _bwd_unpacked(q, k, v, bias_k, out, lse, do, interpret):
    B, Sq, H, D = q.shape
    pack = _pack_factor(H, D)
    if _flat_ok(pack, D):
        dq, dk, dv = _bwd_flat(
            q.reshape(B, Sq, H * D), k.reshape(B, -1, H * D),
            v.reshape(B, -1, H * D), bias_k, out.reshape(B, Sq, H * D),
            lse.reshape(B * (H // pack), pack, Sq),
            do.reshape(B, Sq, H * D), D, pack, interpret)
        Sk = k.shape[1]
        return (dq.reshape(B, Sq, H, D), dk.reshape(B, Sk, H, D),
                dv.reshape(B, Sk, H, D))
    dq, dk, dv = _bwd_packed(
        _pack_heads(q, pack), _pack_heads(k, pack), _pack_heads(v, pack),
        bias_k, _pack_heads(out, pack),
        lse.reshape(B * (H // pack), pack, Sq), _pack_heads(do, pack),
        D, pack, interpret)
    return (_unpack_heads(dq, B, H, D, pack),
            _unpack_heads(dk, B, H, D, pack),
            _unpack_heads(dv, B, H, D, pack))


def _bh_spec(shardings):
    """(batch, head) mesh axes from the q operand's PartitionSpec; all
    other dims are forced replicated by the shardings we hand back."""
    spec = shardings.spec
    b = spec[0] if len(spec) > 0 else None
    h = spec[2] if len(spec) > 2 else None
    return b, h


@functools.lru_cache(maxsize=None)
def _fwd_cp(interpret: bool):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    @custom_partitioning
    def fwd(q, k, v, bias_k):
        return _fwd_unpacked(q, k, v, bias_k, interpret)

    def infer(mesh, arg_shapes, result_shape):
        b, h = _bh_spec(arg_shapes[0].sharding)
        return (NamedSharding(mesh, P(b, None, h, None)),
                NamedSharding(mesh, P(b, h, None)))

    def part(mesh, arg_shapes, result_shape):
        b, h = _bh_spec(arg_shapes[0].sharding)
        qs = NamedSharding(mesh, P(b, None, h, None))
        bs = NamedSharding(mesh, P(b, None))
        ls = NamedSharding(mesh, P(b, h, None))

        def lower(q, k, v, bias_k):
            return _fwd_unpacked(q, k, v, bias_k, interpret)

        return mesh, lower, (qs, ls), (qs, qs, qs, bs)

    # Shardy rule (the default partitioner): b/h shard freely, sq/d/sk
    # must be replicated (listed in factor-index order — Shardy requires
    # the special-factor indices sorted). GSPMD (shardy off) uses the
    # infer/partition callbacks instead.
    fwd.def_partition(
        partition=part, infer_sharding_from_operands=infer,
        sharding_rule=("b sq h d, b sk h d, b sk h d, b sk "
                       "-> b sq h d, b h sq"),
        need_replication_factors=("sq", "d", "sk"),
        decode_shardings=True)
    return fwd


@functools.lru_cache(maxsize=None)
def _bwd_cp(interpret: bool):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    @custom_partitioning
    def bwd(q, k, v, bias_k, out, lse, do):
        return _bwd_unpacked(q, k, v, bias_k, out, lse, do, interpret)

    def infer(mesh, arg_shapes, result_shape):
        b, h = _bh_spec(arg_shapes[0].sharding)
        qs = NamedSharding(mesh, P(b, None, h, None))
        return (qs, qs, qs)

    def part(mesh, arg_shapes, result_shape):
        b, h = _bh_spec(arg_shapes[0].sharding)
        qs = NamedSharding(mesh, P(b, None, h, None))
        bs = NamedSharding(mesh, P(b, None))
        ls = NamedSharding(mesh, P(b, h, None))

        def lower(q, k, v, bias_k, out, lse, do):
            return _bwd_unpacked(q, k, v, bias_k, out, lse, do, interpret)

        return mesh, lower, (qs, qs, qs), (qs, qs, qs, bs, qs, ls, qs)

    bwd.def_partition(
        partition=part, infer_sharding_from_operands=infer,
        sharding_rule=("b sq h d, b sk h d, b sk h d, b sk, b sq h d, "
                       "b h sq, b sq h d -> b sq h d, b sk h d, b sk h d"),
        need_replication_factors=("sq", "d", "sk"),
        decode_shardings=True)
    return bwd


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_u(q, k, v, interpret, bias_k):
    out, _ = _fwd_cp(interpret)(q, k, v, bias_k)
    return out


def _flash_u_fwd(q, k, v, interpret, bias_k):
    out, lse = _fwd_cp(interpret)(q, k, v, bias_k)
    return out, (q, k, v, bias_k, out, lse)


def _flash_u_bwd(interpret, res, do):
    q, k, v, bias_k, out, lse = res
    dq, dk, dv = _bwd_cp(interpret)(q, k, v, bias_k, out, lse, do)
    return dq, dk, dv, None


_flash_u.defvjp(_flash_u_fwd, _flash_u_bwd)


def flash_attention_shd(q: jax.Array, k: jax.Array, v: jax.Array,
                        bias: Optional[jax.Array] = None,
                        *, interpret: bool = False) -> jax.Array:
    """softmax(QK^T/sqrt(D) + bias)V, head-minor layout.

    q: [B, Sq, H, D]; k, v: [B, Sk, H, D]; returns [B, Sq, H, D].
    ``bias``: None or a key-mask bias broadcastable from [B, 1, 1, S_k]
    (what ``ops.attention.additive_mask`` produces). General [B, H, Sq, Sk]
    biases are not supported here — the dispatcher falls back to XLA.
    """
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    if bias is None:
        bias_k = jnp.zeros((B, Sk), jnp.float32)
    else:
        assert bias.ndim == 4 and bias.shape[1] == 1 and bias.shape[2] == 1, (
            f"flash_attention supports key-mask bias only, got {bias.shape}")
        bias_k = bias[:, 0, 0, :].astype(jnp.float32)
    if _flash_spmd_enabled():
        # multi-device: the custom_partitioning wrapper shards over batch
        # and heads with zero collectives; lane-slicing happens per shard
        return _flash_u(q, k, v, interpret, bias_k)
    pack = _pack_factor(H, D)
    if _flat_ok(pack, D):
        # zero-relayout path: lane-chunk BlockSpecs read head pairs
        # straight out of the [B, S, H·D] tensor; the boundary reshapes
        # cancel against the caller's own under XLA
        out = _flash_flat(q.reshape(B, Sq, H * D), k.reshape(B, Sk, H * D),
                          v.reshape(B, Sk, H * D), D, pack, interpret,
                          bias_k)
        return out.reshape(B, Sq, H, D)
    qp = _pack_heads(q, pack)
    kp = _pack_heads(k, pack)
    vp = _pack_heads(v, pack)
    out = _flash(qp, kp, vp, D, pack, interpret, bias_k)
    return _unpack_heads(out, B, H, D, pack)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    bias: Optional[jax.Array] = None,
                    *, interpret: bool = False) -> jax.Array:
    """Back-compat entry: q, k, v [B, H, S, D] → [B, H, S, D].

    Prefer :func:`flash_attention_shd` — it avoids one relayout per tensor
    by taking the head-minor layout the QKV projection produces.
    """
    out = flash_attention_shd(q.transpose(0, 2, 1, 3),
                              k.transpose(0, 2, 1, 3),
                              v.transpose(0, 2, 1, 3),
                              bias, interpret=interpret)
    return out.transpose(0, 2, 1, 3)
