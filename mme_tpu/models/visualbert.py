"""VisualBERT: text+image fusion for Hateful Memes.

Capability parity targets in the reference:
- ``DoubleModels/models/visualBert.py:66-116`` ``VBertClassifier`` — HF
  ``VisualBertForPreTraining`` ('uclanlp/visualbert-nlvr2-coco-pre'), mean
  over the 30522-dim MLM ``prediction_logits``, → Linear(30522,256) →
  sigmoid → dropout → Linear(256, C);
- the embeddings fuse text (word+pos+type) with projected visual features
  plus dedicated visual type/position tables, one LayerNorm over the
  concatenated sequence (HF VisualBertEmbeddings semantics).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mme_tpu.models.layers import EncoderSpec, TransformerEncoder, activation
from mme_tpu.ops.attention import additive_mask
from mme_tpu.ops.layer_norm import FusedLayerNorm


@dataclasses.dataclass(frozen=True)
class VisualBertSpec:
    vocab_size: int = 30522
    max_positions: int = 512
    type_vocab_size: int = 2
    visual_embedding_dim: int = 1024
    encoder: EncoderSpec = dataclasses.field(default_factory=lambda: EncoderSpec(
        hidden=768, heads=12, layers=12, intermediate=3072,
        ln_style="post", ln_eps=1e-12))


class VisualBertEmbeddings(nn.Module):
    spec: VisualBertSpec

    @nn.compact
    def __call__(self, input_ids: jax.Array,
                 token_type_ids: Optional[jax.Array],
                 visual_embeds: Optional[jax.Array],
                 visual_token_type_ids: Optional[jax.Array] = None,
                 *, deterministic: bool = True) -> jax.Array:
        s = self.spec
        e = s.encoder
        emb = lambda n, v: nn.Embed(v, e.hidden, dtype=e.dtype,
                                    param_dtype=e.param_dtype, name=n)
        B, S = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        x = emb("word", s.vocab_size)(input_ids)
        x = x + emb("token_type", s.type_vocab_size)(token_type_ids)
        x = x + emb("position", s.max_positions)(
            jnp.arange(S)[None, :])

        if visual_embeds is not None:
            V = visual_embeds.shape[1]
            if visual_token_type_ids is None:
                visual_token_type_ids = jnp.ones((B, V), jnp.int32)
            v = nn.Dense(e.hidden, dtype=e.dtype, param_dtype=e.param_dtype,
                         name="visual_projection")(visual_embeds)
            v = v + emb("visual_token_type",
                        s.type_vocab_size)(visual_token_type_ids)
            v = v + emb("visual_position", s.max_positions)(
                jnp.zeros((B, V), jnp.int32))
            x = jnp.concatenate([x, v], axis=1)

        x = FusedLayerNorm(epsilon=e.ln_eps, dtype=e.dtype,
                         param_dtype=e.param_dtype, name="ln")(x)
        if e.dropout > 0.0:
            x = nn.Dropout(rate=e.dropout)(x, deterministic=deterministic)
        return x


class VisualBertModel(nn.Module):
    spec: VisualBertSpec

    @nn.compact
    def __call__(self, input_ids: jax.Array,
                 attention_mask: Optional[jax.Array] = None,
                 token_type_ids: Optional[jax.Array] = None,
                 visual_embeds: Optional[jax.Array] = None,
                 visual_attention_mask: Optional[jax.Array] = None,
                 visual_token_type_ids: Optional[jax.Array] = None,
                 *, deterministic: bool = True
                 ) -> Tuple[jax.Array, jax.Array]:
        s = self.spec
        x = VisualBertEmbeddings(s, name="embeddings")(
            input_ids, token_type_ids, visual_embeds, visual_token_type_ids,
            deterministic=deterministic)
        bias = None
        if attention_mask is not None:
            full_mask = attention_mask
            if visual_embeds is not None:
                if visual_attention_mask is None:
                    visual_attention_mask = jnp.ones(
                        visual_embeds.shape[:2], attention_mask.dtype)
                full_mask = jnp.concatenate(
                    [attention_mask, visual_attention_mask], axis=1)
            bias = additive_mask(full_mask)
        x = TransformerEncoder(s.encoder, name="encoder")(
            x, bias, deterministic=deterministic)
        pooled = nn.Dense(s.encoder.hidden, dtype=s.encoder.dtype,
                          param_dtype=s.encoder.param_dtype,
                          name="pooler")(x[:, 0])
        return x, jnp.tanh(pooled)


class VisualBertForPreTraining(nn.Module):
    """MLM head on top of VisualBertModel (decoder tied to word embeddings),
    matching HF ``prediction_logits``."""

    spec: VisualBertSpec

    @nn.compact
    def __call__(self, input_ids: jax.Array, **kw: Any) -> jax.Array:
        s = self.spec
        e = s.encoder
        model = VisualBertModel(s, name="visual_bert")
        seq, _pooled = model(input_ids, **kw)
        h = nn.Dense(e.hidden, dtype=e.dtype, param_dtype=e.param_dtype,
                     name="transform_dense")(seq)
        h = activation(e.act)(h)
        h = FusedLayerNorm(epsilon=e.ln_eps, dtype=e.dtype,
                         param_dtype=e.param_dtype, name="transform_ln")(h)
        word_table = model.variables["params"]["embeddings"]["word"][
            "embedding"]
        bias = self.param("decoder_bias", nn.initializers.zeros_init(),
                          (s.vocab_size,), e.param_dtype)
        logits = h @ word_table.astype(h.dtype).T + bias.astype(h.dtype)
        return logits


class VBertClassifier(nn.Module):
    """The reference classifier head, verbatim capability
    (``DoubleModels/models/visualBert.py:92-116``): mean prediction_logits →
    dropout → Linear(30522,256) → sigmoid → dropout → Linear(256, C)."""

    spec: VisualBertSpec
    output_dim: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, input_ids: jax.Array,
                 attention_mask: Optional[jax.Array] = None,
                 token_type_ids: Optional[jax.Array] = None,
                 visual_embeds: Optional[jax.Array] = None,
                 visual_attention_mask: Optional[jax.Array] = None,
                 visual_token_type_ids: Optional[jax.Array] = None,
                 *, deterministic: bool = True) -> jax.Array:
        logits = VisualBertForPreTraining(self.spec, name="vbert")(
            input_ids, attention_mask=attention_mask,
            token_type_ids=token_type_ids, visual_embeds=visual_embeds,
            visual_attention_mask=visual_attention_mask,
            visual_token_type_ids=visual_token_type_ids,
            deterministic=deterministic)
        x = logits.mean(axis=1)
        x = nn.Dropout(rate=self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(256, dtype=self.spec.encoder.dtype, name="linear")(x)
        x = jax.nn.sigmoid(x)
        x = nn.Dropout(rate=self.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.output_dim, dtype=self.spec.encoder.dtype,
                        name="final")(x)
