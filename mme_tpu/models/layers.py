"""Shared transformer building blocks (flax.linen).

One configurable encoder family covers every transformer in the reference:

- post-LN BERT-style blocks → DistilRoBERTa text tower (HF ``RobertaModel``
  used at ``models/tav.py:257,438``) and VisualBERT;
- pre-LN ViT-style blocks with q/v-only biases → VideoMAE towers
  (``utils/TAVFormer.py:312-391`` copy and HF ``VideoMAEModel``);
- post-LN with conv positional embeddings → wav2vec2-base encoder;
- pre-LN "stable layer norm" → wav2vec2-large encoder;
- post-LN scratch fusion blocks with the ``early_div`` toggle →
  ``utils/TAVFormer.py:10-166`` (``TAVFormer`` fusion trunk).

TPU-first choices: a single fused QKV projection (one big MXU matmul instead
of three), fp32 softmax with bf16-friendly residual stream, optional
``jax.checkpoint`` rematerialization per block, and optional scan-over-layers
for compile time. All sequence lengths are static.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mme_tpu.ops.attention import dot_product_attention_shd
from mme_tpu.ops.layer_norm import FusedLayerNorm

Dtype = Any


@dataclasses.dataclass(frozen=True)
class EncoderSpec:
    """Architecture knobs shared by every encoder family."""

    hidden: int = 768
    heads: int = 12
    layers: int = 12
    intermediate: int = 3072
    ln_style: str = "post"           # "post" (BERT) | "pre" (ViT/stable-LN)
    qkv_bias: str = "full"           # "full" | "qv" (VideoMAE) | "none" (scratch)
    out_bias: bool = True
    ln_eps: float = 1e-12
    act: str = "gelu"                # exact gelu to match HF defaults
    dropout: float = 0.0
    attention_dropout: float = 0.0
    final_ln: bool = False            # pre-LN stacks end with a LayerNorm
    early_div: bool = False           # scratch-MHA q-scaling toggle
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    remat: bool = False
    # Trace ONE layer and lax.scan it over a stacked [L, ...] param axis:
    # compile time drops ~L× for deep stacks (first compile through the
    # remote tunnel is minutes). Param tree changes to layers_scan/[L,...];
    # convert per-layer trees with models.layers.to_scan_params.
    scan_layers: bool = False
    # Sequence parallelism (SURVEY §5.7 lift): when both are set, attention
    # runs as ring attention sharded over ``seq_mesh[seq_axis]``
    # (ops/ring_attention.py) — for sequences one chip can't hold.
    seq_mesh: Any = None
    seq_axis: Optional[str] = None
    # Mesh axis the BATCH dim is sharded over, for composing sp/pp with dp
    # (e.g. a ("dp","sp") mesh): the inner shard_maps must declare it or
    # the dp sharding would be all-gathered at their boundary.
    batch_axis: Optional[str] = None
    # Pipeline parallelism: when both are set the layer stack executes as a
    # GPipe pipeline over ``pp_mesh[pp_axis]`` with ``pp_micro`` microbatches
    # (parallel/pipeline.py) — params are created in the normal unrolled
    # layout, so checkpoints/pretrained trees are pipeline-agnostic.
    pp_mesh: Any = None
    pp_axis: Optional[str] = None
    pp_micro: int = 4


def activation(name: str) -> Callable[[jax.Array], jax.Array]:
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name == "gelu_new":
        return lambda x: jax.nn.gelu(x, approximate=True)
    if name == "relu":
        return jax.nn.relu
    if name == "tanh":
        return jnp.tanh
    raise ValueError(f"unknown activation {name}")


class MultiHeadAttention(nn.Module):
    """Self-attention with a fused QKV matmul.

    ``qkv_bias="qv"`` reproduces VideoMAE's quirk of a learned q/v bias with a
    frozen zero k bias (``utils/TAVFormer.py:329-334,347-350``) — since a zero
    k bias is a no-op we simply omit it. ``early_div`` replicates the scratch
    MHA's pre/post-softmax scaling toggle (``utils/TAVFormer.py:45-47,62-63``),
    which is numerically identical either way and therefore folded into the
    standard 1/sqrt(d) scaling.
    """

    spec: EncoderSpec

    @nn.compact
    def __call__(self, x: jax.Array, bias: Optional[jax.Array] = None,
                 *, deterministic: bool = True) -> jax.Array:
        s = self.spec
        B, S, H = x.shape
        head_dim = s.hidden // s.heads

        if s.qkv_bias == "full":
            use_bias = (True, True, True)
        elif s.qkv_bias == "qv":
            use_bias = (True, False, True)
        else:
            use_bias = (False, False, False)

        qkv = nn.DenseGeneral((3, s.heads, head_dim), use_bias=False,
                              dtype=s.dtype, param_dtype=s.param_dtype,
                              name="qkv")(x)
        if any(use_bias):
            bias_init = self.param(
                "qkv_bias",
                nn.initializers.zeros_init(),
                (3, s.heads, head_dim), s.param_dtype)
            mask = jnp.asarray([float(b) for b in use_bias],
                               s.dtype).reshape(3, 1, 1)
            qkv = qkv + bias_init.astype(s.dtype) * mask
        q, k, v = jnp.moveaxis(qkv, 2, 0)  # unpack → 3 × [B, S, heads, D]

        if (s.seq_mesh is not None and s.seq_axis is not None
                and not self.is_initializing()):
            # (init traces with whatever example batch the caller has —
            # often batch 1, indivisible by a dp axis; the attention core
            # has no params, so the dense path initializes identically)
            from mme_tpu.ops.ring_attention import ring_attention
            key_bias = None
            if bias is not None:
                assert bias.ndim == 4 and bias.shape[1] == 1 \
                    and bias.shape[2] == 1, \
                    "ring attention supports per-key biases only"
                # additive pass-through: exact dense-path numerics for
                # soft AND hard key biases (no binarization)
                key_bias = bias[:, 0, 0, :].astype(jnp.float32)
            # pad the sequence to a multiple of the sp axis (the fused TAV
            # sequence, e.g. 473, rarely divides the ring): padded keys get
            # a -inf bias, padded query rows are sliced off after
            n_sp = s.seq_mesh.shape[s.seq_axis]
            pad = (-S) % n_sp
            if pad:
                if key_bias is None:
                    key_bias = jnp.zeros((B, S), jnp.float32)
                key_bias = jnp.pad(key_bias, ((0, 0), (0, pad)),
                                   constant_values=-1e30)
            qt, kt, vt = (jnp.pad(a.transpose(0, 2, 1, 3),
                                  ((0, 0), (0, 0), (0, pad), (0, 0)))
                          if pad else a.transpose(0, 2, 1, 3)
                          for a in (q, k, v))
            # pin the shard_map operands' outside-world layout: without
            # this the seq sharding at the shard_map boundary propagates
            # BACKWARD through pad/concat into the tiny mask ops and the
            # partitioner pays involuntary full rematerializations there
            # (VERDICT r4); the constraint is a propagation barrier, and
            # replicated→seq-sharded at the boundary is a cheap local slice
            from mme_tpu.parallel.sharding_rules import batch_constraint
            qt, kt, vt = (batch_constraint(a) for a in (qt, kt, vt))
            if key_bias is not None:
                key_bias = batch_constraint(key_bias)
            out = ring_attention(qt, kt, vt,
                                 s.seq_mesh, s.seq_axis, key_bias=key_bias,
                                 batch_axis=s.batch_axis)
            out = out[:, :, :S].transpose(0, 2, 1, 3)
        else:
            # head-minor end to end: the flash kernel packs head pairs from
            # this layout with a single relayout (ops/flash_attention.py)
            out = dot_product_attention_shd(q, k, v, bias)
        if s.attention_dropout > 0.0:
            # HF applies dropout on probs; as a capability we apply it on the
            # attention output (equivalent regularization, kernel-fusable).
            out = nn.Dropout(rate=s.attention_dropout)(
                out, deterministic=deterministic)
        out = out.reshape(B, S, s.hidden)
        return nn.Dense(s.hidden, use_bias=s.out_bias, dtype=s.dtype,
                        param_dtype=s.param_dtype, name="out")(out)


class Mlp(nn.Module):
    spec: EncoderSpec

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        s = self.spec
        import os
        fused = os.environ.get("MME_FUSED_MLP", "0")
        if fused != "0" and not self.is_initializing():
            # Single-kernel fc1→act→fc2 (ops/fused_mlp.py): the [N, F]
            # intermediate never touches HBM and the backward recomputes it
            # in VMEM from x alone. Params were created by the unfused path
            # at init (same pattern as the pipeline executor above), so
            # checkpoints/pretrained trees are layout-identical. Output
            # dropout stays here — XLA fuses it into the residual add.
            from mme_tpu.ops.fused_mlp import fused_mlp
            p = self.variables["params"]
            B, S, H = x.shape
            out = fused_mlp(
                x.reshape(B * S, H).astype(s.dtype),
                p["fc1"]["kernel"].astype(s.dtype),
                p["fc1"]["bias"].astype(jnp.float32),
                p["fc2"]["kernel"].astype(s.dtype),
                p["fc2"]["bias"].astype(jnp.float32),
                s.act, fused == "interpret").reshape(B, S, H)
        else:
            out = nn.Dense(s.intermediate, dtype=s.dtype,
                           param_dtype=s.param_dtype, name="fc1")(x)
            out = activation(s.act)(out)
            out = nn.Dense(s.hidden, dtype=s.dtype, param_dtype=s.param_dtype,
                           name="fc2")(out)
        if s.dropout > 0.0:
            out = nn.Dropout(rate=s.dropout)(out, deterministic=deterministic)
        return out


class EncoderBlock(nn.Module):
    """One transformer block, pre- or post-LN."""

    spec: EncoderSpec

    @nn.compact
    def __call__(self, x: jax.Array, bias: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        # NOTE: ``deterministic`` is positional (not kw-only) so the remat
        # wrapper below can pin it via static_argnums — a traced bool would
        # break flax Dropout's short-circuit under jax.checkpoint.
        s = self.spec
        ln = lambda name: FusedLayerNorm(epsilon=s.ln_eps, dtype=s.dtype,
                                       param_dtype=s.param_dtype, name=name)
        attn = MultiHeadAttention(s, name="attention")
        mlp = Mlp(s, name="mlp")
        drop = lambda y: nn.Dropout(rate=s.dropout)(
            y, deterministic=deterministic) if s.dropout > 0.0 else y

        if s.ln_style == "pre":
            x = x + drop(attn(ln("ln1")(x), bias, deterministic=deterministic))
            x = x + mlp(ln("ln2")(x), deterministic=deterministic)
        else:  # post-LN (BERT): residual then LN
            x = ln("ln1")(x + drop(attn(x, bias, deterministic=deterministic)))
            x = ln("ln2")(x + mlp(x, deterministic=deterministic))
        return x


class _ScanBlock(nn.Module):
    """lax.scan body for ``EncoderSpec.scan_layers``: one EncoderBlock with
    the (carry, out) contract nn.scan requires."""

    spec: EncoderSpec
    use_remat: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, bias: Optional[jax.Array],
                 deterministic: bool = True):
        cls = (nn.remat(EncoderBlock, static_argnums=(3,))
               if self.use_remat else EncoderBlock)
        x = cls(self.spec, name="block")(x, bias, deterministic)
        return x, None


class TransformerEncoder(nn.Module):
    """Stack of EncoderBlocks with optional remat.

    Replaces the reference's three encoder loops (``utils/TAVFormer.py:144-166``
    with its per-layer ``torch.cuda.empty_cache()``, ``utils/TAVFormer.py:171-228``,
    ``models/VIDMAE.py:6-260``); on TPU, memory pressure is handled by
    ``jax.checkpoint`` rematerialization instead of cache flushes / CPU staging.
    """

    spec: EncoderSpec

    @nn.compact
    def __call__(self, x: jax.Array, bias: Optional[jax.Array] = None,
                 *, deterministic: bool = True) -> jax.Array:
        s = self.spec
        if (s.pp_mesh is not None and s.pp_axis is not None
                and not self.is_initializing()):
            # GPipe execution over the pp mesh axis (parallel/pipeline.py).
            # Params were created by the normal unrolled path at init; read
            # this module's subtree and stream it through the pipeline.
            # Dropout keys come from the standard flax "dropout" rng.
            from mme_tpu.parallel.pipeline import pipeline_encoder_apply
            assert not s.scan_layers, "pp_mesh and scan_layers are exclusive"
            has_dropout = s.dropout > 0.0 or s.attention_dropout > 0.0
            rng = (self.make_rng("dropout")
                   if (not deterministic and has_dropout
                       and self.has_rng("dropout")) else None)
            return pipeline_encoder_apply(
                s, dict(self.variables["params"]), x, s.pp_mesh, s.pp_axis,
                n_microbatches=s.pp_micro, bias=bias, rng=rng,
                deterministic=deterministic if rng is None else None,
                batch_axis=s.batch_axis)
        block_cls = EncoderBlock
        if s.remat:
            # static_argnums counts the checkpointed core_fn's args
            # (scope, x, bias, deterministic) — pin the bool
            block_cls = nn.remat(EncoderBlock, static_argnums=(3,))
        if s.scan_layers:
            scan = nn.scan(_ScanBlock,
                           variable_axes={"params": 0},
                           split_rngs={"params": True, "dropout": True},
                           in_axes=(nn.broadcast, nn.broadcast),
                           length=s.layers)
            x, _ = scan(s, s.remat, name="layers_scan")(
                x, bias, deterministic)
        else:
            for i in range(s.layers):
                x = block_cls(s, name=f"layer_{i}")(x, bias, deterministic)
        if s.final_ln:
            x = FusedLayerNorm(epsilon=s.ln_eps, dtype=s.dtype,
                             param_dtype=s.param_dtype, name="final_ln")(x)
        return x


def to_scan_params(encoder_params: Any, n_layers: int) -> Any:
    """Convert an unrolled encoder param tree ({'layer_i': ...}, e.g. from
    models/hf_import.py) to the stacked tree a ``scan_layers=True`` encoder
    expects ({'layers_scan': {'block': [L, ...]}}). Non-layer entries
    (final_ln, ...) pass through."""
    import jax.numpy as _jnp

    layers = [encoder_params[f"layer_{i}"] for i in range(n_layers)]
    out = {k: v for k, v in encoder_params.items()
           if not k.startswith("layer_")}
    out["layers_scan"] = {"block": jax.tree.map(
        lambda *xs: _jnp.stack(xs, axis=0), *layers)}
    return out


def from_scan_params(encoder_params: Any, n_layers: int) -> Any:
    """Inverse of :func:`to_scan_params`."""
    stacked = encoder_params["layers_scan"]["block"]
    out = {k: v for k, v in encoder_params.items() if k != "layers_scan"}
    for i in range(n_layers):
        out[f"layer_{i}"] = jax.tree.map(lambda x: x[i], stacked)
    return out


def convert_tree_to_scan(params: Any) -> Any:
    """Recursively convert EVERY unrolled encoder subtree ({'layer_0'...})
    in a whole-model param tree to the stacked scan layout — lets a model
    built/pretrained-loaded with unrolled encoders run as its
    ``scan_layers=True`` twin (cli/tav_nn.py MME_SCAN_LAYERS=1)."""
    if not isinstance(params, dict):
        return params
    layer_keys = [k for k in params
                  if k.startswith("layer_") and k[6:].isdigit()]
    if layer_keys:
        n = max(int(k[6:]) for k in layer_keys) + 1
        if len(layer_keys) == n and all(f"layer_{i}" in params
                                        for i in range(n)):
            try:
                converted = to_scan_params(params, n)
            except (ValueError, TypeError):
                # heterogeneous layers (e.g. MoE blocks interleaved with
                # dense ones) can't stack — leave this encoder unrolled
                converted = None
            if converted is not None:
                return {k: (v if k == "layers_scan"
                            else convert_tree_to_scan(v))
                        for k, v in converted.items()}
    return {k: convert_tree_to_scan(v) for k, v in params.items()}
