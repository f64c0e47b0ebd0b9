"""Audio towers: wav2vec2 (base + large/stable-LN variants) and classifier.

Capability parity targets in the reference:
- ``SingleModels/models/audio.py:41-62`` ``Wav2Vec2ForSpeechClassification``
  ('superb/wav2vec2-base-superb-er': 768-d base, group-norm extractor,
  post-LN encoder) → mean-pool → dropout → Linear(768, C);
- the PreFormer audio embedding stage (``models/tav.py:352-363``):
  feature extractor → feature projection → SpecAugment → conv positional
  embedding → LN → dropout → 1024→768 projection, for
  'ehcalabres/wav2vec2-lg-xlsr-en-speech-emotion-recognition' (1024-d
  large, layer-norm extractor, stable-LN encoder);
- the full audio tower in TAVForMAE (``models/tav.py:476-478``).

TPU-native shape policy: waveforms are padded to a static bucket length and
carried with a keep-mask; all ragged behavior (mean pooling, attention)
reproduces the reference's per-batch-padded numerics exactly via masks.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mme_tpu.models.layers import EncoderSpec, TransformerEncoder, activation
from mme_tpu.ops.attention import additive_mask
from mme_tpu.ops.audio import (apply_spec_augment, feature_vector_attention_mask,
                               masked_mean_pool)
from mme_tpu.ops.layer_norm import FusedLayerNorm


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Spec:
    conv_dims: Sequence[int] = (512,) * 7
    conv_kernels: Sequence[int] = (10, 3, 3, 3, 3, 2, 2)
    conv_strides: Sequence[int] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    feat_extract_norm: str = "group"      # "group" (base) | "layer" (large)
    do_stable_layer_norm: bool = False
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    # SpecAugment (training only)
    mask_time_prob: float = 0.05
    mask_time_length: int = 10
    mask_time_min_masks: int = 2
    mask_feature_prob: float = 0.0
    mask_feature_length: int = 10
    mask_feature_min_masks: int = 0
    remat_conv: bool = False  # remat the conv stack independently of encoders
    encoder: EncoderSpec = dataclasses.field(default_factory=lambda: EncoderSpec(
        hidden=768, heads=12, layers=12, intermediate=3072,
        ln_style="post", ln_eps=1e-5, dropout=0.1))

    @staticmethod
    def base(**kw: Any) -> "Wav2Vec2Spec":
        """'superb/wav2vec2-base-superb-er'-shaped model (hidden dropout
        0.1 during training, the HF default)."""
        return Wav2Vec2Spec(**kw)

    @staticmethod
    def large(**kw: Any) -> "Wav2Vec2Spec":
        """'ehcalabres/wav2vec2-lg-xlsr-en-speech-emotion-recognition'-shaped."""
        return Wav2Vec2Spec(
            conv_bias=True, feat_extract_norm="layer",
            do_stable_layer_norm=True,
            encoder=EncoderSpec(hidden=1024, heads=16, layers=24,
                                intermediate=4096, ln_style="pre",
                                ln_eps=1e-5, final_ln=True, dropout=0.1),
            **kw)


class ConvFeatureExtractor(nn.Module):
    """The 7-layer strided conv stack over raw waveforms.

    The reference runs this eagerly on GPU per micro-batch
    (``models/tav.py:352``); here it is one jitted XLA conv pipeline. Returns
    features [B, F, C_last] (time-major, channels last — TPU layout)."""

    spec: Wav2Vec2Spec

    @nn.compact
    def __call__(self, waveform: jax.Array) -> jax.Array:
        s = self.spec
        e = s.encoder
        x = waveform[..., None]  # [B, T, 1]
        in_dim = 1
        for i, (dim, k, st) in enumerate(zip(s.conv_dims, s.conv_kernels,
                                             s.conv_strides)):
            x = nn.Conv(dim, kernel_size=(k,), strides=(st,), padding="VALID",
                        use_bias=s.conv_bias, dtype=e.dtype,
                        param_dtype=e.param_dtype, name=f"conv_{i}")(x)
            if s.feat_extract_norm == "group" and i == 0:
                x = nn.GroupNorm(num_groups=dim, epsilon=1e-5, dtype=e.dtype,
                                 param_dtype=e.param_dtype, name="group_norm")(x)
            elif s.feat_extract_norm == "layer":
                x = FusedLayerNorm(epsilon=1e-5, dtype=e.dtype,
                                 param_dtype=e.param_dtype, name=f"ln_{i}")(x)
            x = activation("gelu")(x)
            in_dim = dim
        return x


class FeatureProjection(nn.Module):
    spec: Wav2Vec2Spec

    @nn.compact
    def __call__(self, features: jax.Array, *, deterministic: bool = True
                 ) -> Tuple[jax.Array, jax.Array]:
        s = self.spec
        e = s.encoder
        norm = FusedLayerNorm(epsilon=e.ln_eps, dtype=e.dtype,
                            param_dtype=e.param_dtype, name="ln")(features)
        hidden = nn.Dense(e.hidden, dtype=e.dtype, param_dtype=e.param_dtype,
                          name="projection")(norm)
        if e.dropout > 0.0:
            hidden = nn.Dropout(rate=e.dropout)(hidden,
                                                deterministic=deterministic)
        return hidden, norm


class PositionalConvEmbedding(nn.Module):
    """Grouped conv positional embedding with same-pad trim (HF
    Wav2Vec2PositionalConvEmbedding). Weight-norm is folded into the kernel
    at import time — mathematically identical for inference and an
    unconstrained reparameterization for fine-tuning."""

    spec: Wav2Vec2Spec

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        s = self.spec
        e = s.encoder
        k = s.num_conv_pos_embeddings
        pad = k // 2
        y = nn.Conv(e.hidden, kernel_size=(k,), strides=(1,),
                    padding=[(pad, pad)],
                    feature_group_count=s.num_conv_pos_embedding_groups,
                    use_bias=True, dtype=e.dtype, param_dtype=e.param_dtype,
                    name="conv")(x)
        if k % 2 == 0:
            y = y[:, :-1, :]
        return activation("gelu")(y)


class Wav2Vec2Encoder(nn.Module):
    """Transformer encoder with conv positional embeddings; handles both the
    post-LN (base) and stable-LN (large) variants."""

    spec: Wav2Vec2Spec

    @nn.compact
    def __call__(self, hidden: jax.Array,
                 attention_mask: Optional[jax.Array] = None,
                 *, deterministic: bool = True) -> jax.Array:
        s = self.spec
        e = s.encoder
        if attention_mask is not None:
            hidden = hidden * attention_mask[..., None].astype(hidden.dtype)
        hidden = hidden + PositionalConvEmbedding(s, name="pos_conv")(hidden)
        if not s.do_stable_layer_norm:
            hidden = FusedLayerNorm(epsilon=e.ln_eps, dtype=e.dtype,
                                  param_dtype=e.param_dtype,
                                  name="ln")(hidden)
        if e.dropout > 0.0:
            hidden = nn.Dropout(rate=e.dropout)(hidden,
                                                deterministic=deterministic)
        bias = additive_mask(attention_mask) if attention_mask is not None else None
        # stable-LN's trailing LayerNorm is EncoderSpec.final_ln
        return TransformerEncoder(e, name="layers")(
            hidden, bias, deterministic=deterministic)


class Wav2Vec2Model(nn.Module):
    """Full wav2vec2: waveform [B, T] (+ keep-mask) → hidden states [B, F, H].

    SpecAugment runs only when ``deterministic=False`` (the reference gates it
    on a ``train`` flag, ``models/tav.py:283``), using the learned
    ``masked_spec_embed`` vector."""

    spec: Wav2Vec2Spec

    @nn.compact
    def __call__(self, waveform: jax.Array,
                 attention_mask: Optional[jax.Array] = None,
                 *, deterministic: bool = True,
                 features: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, jax.Array, Optional[jax.Array]]:
        s = self.spec
        if features is None:
            # remat the conv stack with the encoders: its [B, T/5, 512]
            # activations over ~1e5-sample waveforms dominate HBM otherwise
            fe_cls = (nn.remat(ConvFeatureExtractor)
                      if (s.encoder.remat or s.remat_conv)
                      else ConvFeatureExtractor)
            features = fe_cls(s, name="feature_extractor")(waveform)
        feat_mask = None
        if attention_mask is not None:
            feat_mask = feature_vector_attention_mask(
                features.shape[1], attention_mask,
                s.conv_kernels, s.conv_strides)
        hidden, norm_features = FeatureProjection(s, name="feature_projection")(
            features, deterministic=deterministic)
        masked_embed = self.param(
            "masked_spec_embed",
            nn.initializers.uniform(scale=1.0),
            (s.encoder.hidden,), s.encoder.param_dtype)
        if not deterministic and (s.mask_time_prob > 0 or s.mask_feature_prob > 0):
            rng = self.make_rng("spec_augment")
            hidden = apply_spec_augment(
                rng, hidden, masked_embed,
                s.mask_time_prob, s.mask_time_length,
                s.mask_feature_prob, s.mask_feature_length,
                feat_mask, s.mask_time_min_masks, s.mask_feature_min_masks)
        hidden = Wav2Vec2Encoder(s, name="encoder")(
            hidden, feat_mask, deterministic=deterministic)
        return hidden, norm_features, feat_mask


class Wav2Vec2Classifier(nn.Module):
    """Mean-pool classifier (reference ``SingleModels/models/audio.py:41-62``).

    Deviation from the reference (documented): its unmasked ``torch.mean``
    over padded positions biases the pooled vector by the batch's padding;
    we pool over real frames only (masked mean), which is the correct
    per-utterance statistic and batch-size independent."""

    spec: Wav2Vec2Spec
    output_dim: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, waveform: jax.Array, attention_mask: jax.Array,
                 *, deterministic: bool = True) -> jax.Array:
        hidden, _, feat_mask = Wav2Vec2Model(self.spec, name="wav2vec2")(
            waveform, attention_mask, deterministic=deterministic)
        pooled = masked_mean_pool(hidden, feat_mask)
        pooled = nn.Dropout(rate=self.dropout)(pooled,
                                               deterministic=deterministic)
        return nn.Dense(self.output_dim, dtype=self.spec.encoder.dtype,
                        param_dtype=self.spec.encoder.param_dtype,
                        name="classifier")(pooled)
