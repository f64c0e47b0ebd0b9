"""Text towers: BERT/RoBERTa-style encoder, classifier heads, GloVe-LSTM.

Capability parity targets in the reference:
- ``SingleModels/models/text.py:41-69`` ``BertClassifier`` — DistilRoBERTa
  ('j-hartmann/emotion-english-distilroberta-base') pooled output → dropout
  (train-only) → Linear(768, C).
- ``SingleModels/models/text.py:9-39`` ``LSTMClassifier`` — GloVe embedding →
  LSTM → Linear → mean over tokens → LogSigmoid.
- The text towers inside PreFormer/TAVForMAE (``models/tav.py:257,438``).

The encoder is a generic BERT family module (post-LN, learned positions,
optional token-type embeddings) so the same code also serves VisualBERT's
text side. Weight import from HF checkpoints is in ``hf_import.py`` and is
covered by fp32 logit-parity tests (tests/test_text_parity.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mme_tpu.models.layers import EncoderSpec, TransformerEncoder
from mme_tpu.ops.attention import additive_mask
from mme_tpu.ops.layer_norm import FusedLayerNorm


@dataclasses.dataclass(frozen=True)
class TextEncoderSpec:
    vocab_size: int = 50265
    max_positions: int = 514
    type_vocab_size: int = 1
    pad_token_id: int = 1
    position_style: str = "roberta"  # "roberta" (pad-offset cumsum) | "bert"
    encoder: EncoderSpec = dataclasses.field(default_factory=lambda: EncoderSpec(
        hidden=768, heads=12, layers=6, intermediate=3072,
        ln_style="post", ln_eps=1e-5, dropout=0.1))

    @staticmethod
    def distilroberta(**kw: Any) -> "TextEncoderSpec":
        """'j-hartmann/emotion-english-distilroberta-base' architecture
        (hidden dropout 0.1 during training, the HF default)."""
        return TextEncoderSpec(**kw)

    @staticmethod
    def bert_base_cased(**kw: Any) -> "TextEncoderSpec":
        return TextEncoderSpec(vocab_size=28996, max_positions=512,
                               type_vocab_size=2, pad_token_id=0,
                               position_style="bert",
                               encoder=EncoderSpec(hidden=768, heads=12,
                                                   layers=12,
                                                   intermediate=3072,
                                                   ln_style="post",
                                                   ln_eps=1e-12,
                                                   dropout=0.1), **kw)


def roberta_position_ids(input_ids: jax.Array, pad_token_id: int) -> jax.Array:
    """RoBERTa's pad-aware position ids: non-pad tokens are numbered
    1..n from the left, offset by the pad id (HF
    ``create_position_ids_from_input_ids``)."""
    mask = (input_ids != pad_token_id).astype(jnp.int32)
    return jnp.cumsum(mask, axis=-1) * mask + pad_token_id


class TextEmbeddings(nn.Module):
    spec: TextEncoderSpec

    @nn.compact
    def __call__(self, input_ids: jax.Array,
                 token_type_ids: Optional[jax.Array] = None,
                 *, deterministic: bool = True) -> jax.Array:
        s = self.spec
        e = s.encoder
        word = nn.Embed(s.vocab_size, e.hidden, dtype=e.dtype,
                        param_dtype=e.param_dtype, name="word")(input_ids)
        if s.position_style == "roberta":
            pos_ids = roberta_position_ids(input_ids, s.pad_token_id)
        else:
            pos_ids = jnp.arange(input_ids.shape[-1])[None, :]
        pos = nn.Embed(s.max_positions, e.hidden, dtype=e.dtype,
                       param_dtype=e.param_dtype, name="position")(pos_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        typ = nn.Embed(s.type_vocab_size, e.hidden, dtype=e.dtype,
                       param_dtype=e.param_dtype, name="token_type")(
                           token_type_ids)
        x = word + pos + typ
        x = FusedLayerNorm(epsilon=e.ln_eps, dtype=e.dtype,
                         param_dtype=e.param_dtype, name="ln")(x)
        if e.dropout > 0.0:
            x = nn.Dropout(rate=e.dropout)(x, deterministic=deterministic)
        return x


class TextEncoder(nn.Module):
    """BERT-family encoder returning (sequence_output, pooled_output)."""

    spec: TextEncoderSpec

    @nn.compact
    def __call__(self, input_ids: jax.Array,
                 attention_mask: Optional[jax.Array] = None,
                 token_type_ids: Optional[jax.Array] = None,
                 *, deterministic: bool = True
                 ) -> Tuple[jax.Array, jax.Array]:
        s = self.spec
        x = TextEmbeddings(s, name="embeddings")(
            input_ids, token_type_ids, deterministic=deterministic)
        bias = None
        if attention_mask is not None:
            bias = additive_mask(attention_mask)
        x = TransformerEncoder(s.encoder, name="encoder")(
            x, bias, deterministic=deterministic)
        pooled = nn.Dense(s.encoder.hidden, dtype=s.encoder.dtype,
                          param_dtype=s.encoder.param_dtype,
                          name="pooler")(x[:, 0])
        pooled = jnp.tanh(pooled)
        return x, pooled

def text_embed_only(spec: TextEncoderSpec, encoder_params: dict,
                    input_ids: jax.Array,
                    token_type_ids: Optional[jax.Array] = None) -> jax.Array:
    """Run only the embedding stage of a TextEncoder — the PreFormer text
    path (``models/tav.py:349``). ``encoder_params`` is a full TextEncoder
    param tree; the embeddings subtree is reused as-is."""
    return TextEmbeddings(spec).apply(
        {"params": encoder_params["embeddings"]}, input_ids, token_type_ids)


class BertClassifier(nn.Module):
    """Pooled-output classifier (reference ``SingleModels/models/text.py:41-69``).

    The reference gates dropout on a ``check == "train"`` string instead of
    eval mode; here that is the standard ``deterministic`` flag.
    """

    spec: TextEncoderSpec
    output_dim: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, input_ids: jax.Array, attention_mask: jax.Array,
                 *, deterministic: bool = True) -> jax.Array:
        _, pooled = TextEncoder(self.spec, name="bert")(
            input_ids, attention_mask, deterministic=deterministic)
        pooled = nn.Dropout(rate=self.dropout)(pooled,
                                               deterministic=deterministic)
        return nn.Dense(self.output_dim, dtype=self.spec.encoder.dtype,
                        param_dtype=self.spec.encoder.param_dtype,
                        name="classifier")(pooled)


class LSTMClassifier(nn.Module):
    """GloVe-LSTM text classifier (reference ``SingleModels/models/text.py:9-39``):
    embedding → LSTM → Linear per token → mean over tokens → log-sigmoid.

    The embedding table is a parameter so pretrained GloVe vectors can be
    loaded into it; with none available it trains from random init.
    """

    vocab_size: int
    embed_dim: int = 300
    hidden_dim: int = 300
    num_layers: int = 1
    output_dim: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array,
                 *, deterministic: bool = True) -> jax.Array:
        x = nn.Embed(self.vocab_size, self.embed_dim, dtype=self.dtype,
                     name="embedding")(input_ids)
        for i in range(self.num_layers):
            lstm = nn.RNN(nn.OptimizedLSTMCell(self.hidden_dim),
                          name=f"lstm_{i}")
            x = lstm(x)
        x = nn.Dense(self.output_dim, dtype=self.dtype, name="fc")(x)
        x = x.mean(axis=1)
        return jax.nn.log_sigmoid(x)
