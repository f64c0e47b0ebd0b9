"""Text+Audio double model.

The reference's ``DoubleModels/models/text_audio.py`` is syntactically broken
dead code (duplicate ``__init__``s, an empty class — SURVEY.md §2.4); the
*capability* it intended — a BERT ⊕ wav2vec2 late-fusion classifier with the
``text_audio_nn.py`` CLI — is implemented here as working code: text pooled
output ⊕ masked-mean-pooled wav2vec2 features → dropout → Linear(2·hidden, C).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from mme_tpu.models.audio import Wav2Vec2Model, Wav2Vec2Spec
from mme_tpu.models.text import TextEncoder, TextEncoderSpec
from mme_tpu.ops.audio import masked_mean_pool


@dataclasses.dataclass(frozen=True)
class TextAudioSpec:
    text: TextEncoderSpec = dataclasses.field(
        default_factory=TextEncoderSpec.distilroberta)
    audio: Wav2Vec2Spec = dataclasses.field(default_factory=Wav2Vec2Spec.base)
    hidden: int = 768
    output_dim: int = 7
    dropout: float = 0.5

    def tiny(self) -> "TextAudioSpec":
        def small(e):
            return dataclasses.replace(e, hidden=32, heads=4, layers=2,
                                       intermediate=64)
        return dataclasses.replace(
            self,
            text=dataclasses.replace(self.text, vocab_size=101,
                                     encoder=small(self.text.encoder)),
            audio=dataclasses.replace(self.audio, conv_dims=(8, 8, 8),
                                      conv_kernels=(10, 3, 3),
                                      conv_strides=(5, 2, 2),
                                      encoder=small(self.audio.encoder)),
            hidden=32)


class BertAudioClassifier(nn.Module):
    spec: TextAudioSpec

    @nn.compact
    def __call__(self, input_ids: jax.Array, text_mask: jax.Array,
                 waveform: jax.Array, audio_mask: jax.Array,
                 *, deterministic: bool = True) -> jax.Array:
        s = self.spec
        _, pooled_text = TextEncoder(s.text, name="bert")(
            input_ids, text_mask, deterministic=deterministic)
        aud_hidden, _, feat_mask = Wav2Vec2Model(s.audio, name="wav2vec2")(
            waveform, audio_mask, deterministic=deterministic)
        if aud_hidden.shape[-1] != pooled_text.shape[-1]:
            aud_hidden = nn.Dense(pooled_text.shape[-1],
                                  dtype=s.audio.encoder.dtype,
                                  name="aud_proj")(aud_hidden)
        pooled_aud = masked_mean_pool(aud_hidden, feat_mask)
        x = jnp.concatenate([pooled_text, pooled_aud], axis=1)
        x = nn.Dropout(rate=s.dropout)(x, deterministic=deterministic)
        return nn.Dense(s.output_dim, name="classifier")(x)
