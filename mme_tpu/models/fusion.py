"""TAV triple-modal fusion stack: embedding fuser + four-tower classifier.

Capability parity targets in the reference (the flagship model):
- ``models/tav.py:249-417`` ``PreFormer`` — runs the *embedding stages* of
  the three pretrained towers (RoBERTa embeddings; wav2vec2 feature extractor
  + projection + SpecAugment + conv positional embedding + LN + 1024→768
  projection; VideoMAE embeddings over the sparse keep-mask), concatenates
  the sequences, builds modality-type ids (0/1/2) and the fused additive
  attention mask;
- ``models/tav.py:420-504`` ``TAVForMAE`` — (a) fused A+V sequence + learned
  3-way modality embedding through a randomly-initialized 12-layer maskable
  pre-LN encoder; (b) full RoBERTa pooled output; (c) full wav2vec2 →
  1024→768 → mean-pool; (d) full VideoMAE → mean-pool; per-tower LayerNorm;
  concat 4×768 → dropout → Linear(3072, C);
- ``models/multi+late.py:328-372`` ``TAVFormer`` — scratch post-LN fusion
  encoder over the fused sequence, mean-pool → LN → Linear(768, C).

Deliberate deviations (bugs in the reference we do not copy, SURVEY.md §7):
- additive masks are applied pre-softmax with correct sign
  (the reference's ``models/tav.py:390`` precedence bug and
  ``utils/TAVFormer.py:372-375`` post-softmax add);
- no CPU↔GPU staging (``models/tav.py:344-363``) — the whole fused step is
  one jitted XLA program; memory pressure is handled by remat, not offload.

TPU-first: the PreFormer + TAVForMAE pair is fused into ONE jittable apply —
the reference runs PreFormer on CPU and the towers eagerly per micro-batch;
here all four towers and the fusion trunk compile into a single program so
XLA can overlap them.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mme_tpu.models.layers import EncoderSpec, TransformerEncoder
from mme_tpu.models.text import TextEmbeddings, TextEncoder, TextEncoderSpec
from mme_tpu.models.audio import (FeatureProjection, ConvFeatureExtractor,
                                  PositionalConvEmbedding, Wav2Vec2Model,
                                  Wav2Vec2Spec)
from mme_tpu.models.video import VideoMAEModel, VideoMAESpec
from mme_tpu.ops.attention import additive_mask
from mme_tpu.ops.audio import (apply_spec_augment,
                               feature_vector_attention_mask,
                               masked_mean_pool)
from mme_tpu.ops.layer_norm import FusedLayerNorm


@dataclasses.dataclass(frozen=True)
class TAVSpec:
    """Configuration of the triple-modal stack (reference checkpoint sizes:
    text distilroberta 768, audio wav2vec2-large 1024→768, video
    videomae-base 768)."""

    text: TextEncoderSpec = dataclasses.field(
        default_factory=TextEncoderSpec.distilroberta)
    audio: Wav2Vec2Spec = dataclasses.field(default_factory=Wav2Vec2Spec.large)
    video: VideoMAESpec = dataclasses.field(default_factory=VideoMAESpec.base)
    fusion: EncoderSpec = dataclasses.field(default_factory=lambda: EncoderSpec(
        hidden=768, heads=12, layers=12, intermediate=3072,
        ln_style="pre", qkv_bias="qv", ln_eps=1e-12))
    hidden: int = 768
    output_dim: int = 7
    dropout: float = 0.5
    learn_pos_embeddings: bool = True
    video_keep_k: int = 104   # fused-tower visible patches (≈1568/15, §ops.video)
    # One conv feature extractor shared between PreFormer and the full audio
    # tower. The reference loads the SAME checkpoint into two separate conv
    # stacks and runs both every step (models/tav.py:259+352 vs :455+476);
    # sharing ties the weights (a documented deviation) and halves the conv
    # FLOPs + activation traffic. Off by default for reference-faithful
    # parameterization; bench/CLI turn it on.
    share_audio_frontend: bool = False

    def with_scan_layers(self) -> "TAVSpec":
        """Every encoder in scan-over-layers mode (~L× faster compiles;
        convert unrolled param trees with
        models.layers.convert_tree_to_scan)."""
        def scan(e: EncoderSpec) -> EncoderSpec:
            return dataclasses.replace(e, scan_layers=True)
        return dataclasses.replace(
            self,
            text=dataclasses.replace(self.text,
                                     encoder=scan(self.text.encoder)),
            audio=dataclasses.replace(self.audio,
                                      encoder=scan(self.audio.encoder)),
            video=dataclasses.replace(self.video,
                                      encoder=scan(self.video.encoder)),
            fusion=scan(self.fusion))

    def with_compute_dtype(self, dtype: Any) -> "TAVSpec":
        """Mixed precision: params stay fp32, activations/matmuls in
        ``dtype`` (bf16 is MXU-native; softmax stays fp32 inside the
        attention ops)."""
        def cast(e: EncoderSpec) -> EncoderSpec:
            return dataclasses.replace(e, dtype=dtype)
        return dataclasses.replace(
            self,
            text=dataclasses.replace(self.text, encoder=cast(self.text.encoder)),
            audio=dataclasses.replace(self.audio,
                                      encoder=cast(self.audio.encoder)),
            video=dataclasses.replace(self.video,
                                      encoder=cast(self.video.encoder)),
            fusion=cast(self.fusion))

    def tiny(self) -> "TAVSpec":
        """Scaled-down tree for tests/dry-runs."""
        def small(e: EncoderSpec, **kw) -> EncoderSpec:
            return dataclasses.replace(e, hidden=32, heads=4, layers=2,
                                       intermediate=64, **kw)
        return dataclasses.replace(
            self,
            text=dataclasses.replace(
                TextEncoderSpec.distilroberta(), vocab_size=101,
                max_positions=80,
                encoder=small(TextEncoderSpec.distilroberta().encoder)),
            audio=dataclasses.replace(
                Wav2Vec2Spec.large(), conv_dims=(8, 8, 8),
                conv_kernels=(10, 3, 3), conv_strides=(5, 2, 2),
                encoder=small(Wav2Vec2Spec.large().encoder)),
            video=dataclasses.replace(
                VideoMAESpec.base(), image_size=32, patch_size=8,
                num_frames=4, tubelet_size=2,
                encoder=small(VideoMAESpec.base().encoder)),
            fusion=small(self.fusion),
            hidden=32, video_keep_k=4)


class PreFormer(nn.Module):
    """Embedding-stage fuser (reference ``models/tav.py:249-417``).

    Returns the fused sequence, modality-type ids (0 text / 1 audio /
    2 video), and the fused keep-mask (1 = attend). The audio branch runs:
    conv feature extractor → feature projection → SpecAugment (train only) →
    conv positional embedding → LayerNorm → dropout → Linear(audio_hidden →
    fusion hidden)."""

    spec: TAVSpec

    def setup(self):
        s = self.spec
        self.text_embeddings = TextEmbeddings(s.text)
        fe_cls = (nn.remat(ConvFeatureExtractor)
                  if (s.audio.encoder.remat or s.audio.remat_conv)
                  else ConvFeatureExtractor)
        self.feature_extractor = fe_cls(s.audio)
        self.feature_projection = FeatureProjection(s.audio)
        self.pos_conv = PositionalConvEmbedding(s.audio)
        self.audio_ln = FusedLayerNorm(epsilon=s.audio.encoder.ln_eps,
                                     dtype=s.audio.encoder.dtype,
                                     param_dtype=s.audio.encoder.param_dtype)
        self.wav_to_hidden = nn.Dense(s.hidden, dtype=s.audio.encoder.dtype,
                                      param_dtype=s.audio.encoder.param_dtype)
        self.video = VideoMAEModel(s.video)
        self.masked_spec_embed = self.param(
            "masked_spec_embed", nn.initializers.uniform(scale=1.0),
            (s.audio.encoder.hidden,), s.audio.encoder.param_dtype)

    def __call__(self, input_ids: jax.Array, text_mask: jax.Array,
                 waveform: jax.Array, audio_mask: jax.Array,
                 video: jax.Array, video_keep: jax.Array,
                 *, deterministic: bool = True,
                 audio_features: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        s = self.spec
        # text embeddings (RoBERTa embedding stage, models/tav.py:349);
        # input_ids=None → audio+video-only fusion, the TripleModels call
        # pattern (TripleModels/train_model/tav_train.py:32)
        t = None
        if input_ids is not None:
            t = self.text_embeddings(input_ids, deterministic=deterministic)

        # audio embedding stage (models/tav.py:352-363); precomputed
        # features arrive from the shared frontend (TAVSpec.share_audio_frontend)
        feats = (audio_features if audio_features is not None
                 else self.feature_extractor(waveform))
        feat_mask = feature_vector_attention_mask(
            feats.shape[1], audio_mask, s.audio.conv_kernels,
            s.audio.conv_strides)
        a, _ = self.feature_projection(feats, deterministic=deterministic)
        if not deterministic and s.audio.mask_time_prob > 0:
            a = apply_spec_augment(
                self.make_rng("spec_augment"), a, self.masked_spec_embed,
                s.audio.mask_time_prob, s.audio.mask_time_length,
                s.audio.mask_feature_prob, s.audio.mask_feature_length,
                feat_mask, s.audio.mask_time_min_masks,
                s.audio.mask_feature_min_masks)
        # zero padded frames before the conv positional embedding so pad
        # length cannot bleed into real positions (HF encoder semantics;
        # the reference PreFormer skips this — a pad-dependence bug)
        a = a * feat_mask[..., None].astype(a.dtype)
        a = a + self.pos_conv(a)
        a = self.audio_ln(a)
        a = self.wav_to_hidden(a)

        # video embedding stage over the sparse keep-mask (models/tav.py:368)
        v = self.video.embed(video, video_keep, s.video_keep_k)

        B, a_len, v_len = a.shape[0], a.shape[1], v.shape[1]
        parts = [a, v]
        type_parts = [jnp.ones((B, a_len), jnp.int32),
                      jnp.full((B, v_len), 2, jnp.int32)]
        keep_parts = [feat_mask.astype(jnp.int32),
                      jnp.ones((B, v_len), jnp.int32)]
        if t is not None:
            parts.insert(0, t)
            type_parts.insert(0, jnp.zeros((B, t.shape[1]), jnp.int32))
            keep_parts.insert(0, text_mask.astype(jnp.int32))
        # Pin the concat path batch-sharded: without these constraints the
        # SPMD partitioner sharded the small s32 mask/type tensors along the
        # SEQUENCE dim over the whole mesh and then paid an involuntary
        # full-rematerialization resharding them at the concatenate
        # (compiler-flagged, VERDICT r4). No-op off-mesh.
        from mme_tpu.parallel.sharding_rules import batch_constraint
        parts = [batch_constraint(p) for p in parts]
        type_parts = [batch_constraint(p) for p in type_parts]
        keep_parts = [batch_constraint(p) for p in keep_parts]
        fused = batch_constraint(jnp.concatenate(parts, axis=1))
        type_ids = batch_constraint(jnp.concatenate(type_parts, axis=1))
        keep = batch_constraint(jnp.concatenate(keep_parts, axis=1))
        return fused, type_ids, keep


class TAVForMAE(nn.Module):
    """Four-tower fusion classifier (reference ``models/tav.py:420-504``)."""

    spec: TAVSpec

    def setup(self):
        s = self.spec
        self.modality_embedding = nn.Embed(
            3, s.hidden, dtype=s.fusion.dtype, param_dtype=s.fusion.param_dtype)
        self.text_encoder = TextEncoder(s.text)
        self.wav2vec2 = Wav2Vec2Model(s.audio)
        self.wav_to_hidden = nn.Dense(s.hidden, dtype=s.audio.encoder.dtype,
                                      param_dtype=s.audio.encoder.param_dtype)
        self.videomae = VideoMAEModel(s.video)
        self.fusion_encoder = TransformerEncoder(s.fusion)
        self.text_norm = FusedLayerNorm(dtype=s.fusion.dtype)
        self.fusion_norm = FusedLayerNorm(dtype=s.fusion.dtype)
        self.audio_norm = FusedLayerNorm(dtype=s.fusion.dtype)
        self.video_norm = FusedLayerNorm(dtype=s.fusion.dtype)
        self.dropout = nn.Dropout(rate=s.dropout)
        self.classifier = nn.Dense(s.output_dim, dtype=s.fusion.dtype,
                                   param_dtype=s.fusion.param_dtype)

    def __call__(self, input_ids: jax.Array, text_mask: jax.Array,
                 waveform: jax.Array, audio_mask: jax.Array,
                 video: jax.Array, video_keep: jax.Array,
                 fused: jax.Array, type_ids: jax.Array,
                 fused_keep: jax.Array,
                 *, deterministic: bool = True,
                 audio_features: Optional[jax.Array] = None) -> jax.Array:
        from mme_tpu.parallel.sharding_rules import batch_constraint
        s = self.spec
        av = batch_constraint(fused + self.modality_embedding(type_ids))

        # (c) full audio tower → mean-pool (models/tav.py:476-478; the
        # reference's unmasked mean is replaced by a correct masked mean)
        aud_hidden, _, aud_feat_mask = self.wav2vec2(
            waveform, audio_mask, deterministic=deterministic,
            features=audio_features)
        aud = masked_mean_pool(self.wav_to_hidden(aud_hidden), aud_feat_mask)

        # (d) full video tower over the complement of the fused keep-mask
        # (models/tav.py:480-481: videomae(video_embeds, visual_mask) keeps
        # ~visual_mask — i.e. the tokens the fusion trunk did NOT see)
        n_patches = s.video.num_patches
        vid_hidden = self.videomae(
            video, jnp.logical_not(video_keep), n_patches - s.video_keep_k,
            deterministic=deterministic)
        vid = vid_hidden.mean(axis=1)

        # (b) full text tower pooled output (models/tav.py:485)
        _, pooled_text = self.text_encoder(
            input_ids, text_mask, deterministic=deterministic)

        # (a) fusion trunk over the fused sequence (models/tav.py:487-488)
        av = self.fusion_encoder(av, additive_mask(fused_keep),
                                 deterministic=deterministic)
        av = self.fusion_norm(masked_mean_pool(av, fused_keep))

        t = self.text_norm(pooled_text)
        aud = self.audio_norm(aud)
        vid = self.video_norm(vid)

        tav = batch_constraint(jnp.concatenate([av, t, aud, vid], axis=1))
        tav = self.dropout(tav, deterministic=deterministic)
        return self.classifier(tav)


class TAVModel(nn.Module):
    """PreFormer + TAVForMAE fused into one jittable module — the flagship
    forward step. The reference splits these across CPU/GPU with manual
    transfers (``train_model/tav_train.py:33-40``); here it's a single XLA
    program."""

    spec: TAVSpec

    def setup(self):
        s = self.spec
        self.preformer = PreFormer(s)
        self.model = TAVForMAE(s)
        if s.share_audio_frontend:
            fe_cls = (nn.remat(ConvFeatureExtractor)
                      if (s.audio.encoder.remat or s.audio.remat_conv)
                      else ConvFeatureExtractor)
            self.audio_frontend = fe_cls(s.audio)

    def __call__(self, batch: Dict[str, jax.Array],
                 *, deterministic: bool = True) -> jax.Array:
        feats = (self.audio_frontend(batch["waveform"])
                 if self.spec.share_audio_frontend else None)
        fused, type_ids, fused_keep = self.preformer(
            batch["input_ids"], batch["text_mask"], batch["waveform"],
            batch["audio_mask"], batch["video"], batch["video_keep"],
            deterministic=deterministic, audio_features=feats)
        return self.model(
            batch["input_ids"], batch["text_mask"], batch["waveform"],
            batch["audio_mask"], batch["video"], batch["video_keep"],
            fused, type_ids, fused_keep, deterministic=deterministic,
            audio_features=feats)


class TAVFormer(nn.Module):
    """Scratch-fusion alternative (reference ``models/multi+late.py:328-372``):
    the fused sequence through a post-LN scratch encoder (early_div capability
    honored via EncoderSpec.early_div), mean-pool → LN → Linear(hidden, C)."""

    spec: TAVSpec

    def setup(self):
        s = self.spec
        fusion = dataclasses.replace(s.fusion, ln_style="post",
                                     qkv_bias="none")
        self.preformer = PreFormer(s)
        self.modality_embedding = nn.Embed(3, s.hidden, dtype=fusion.dtype)
        self.encoder = TransformerEncoder(fusion)
        self.norm = FusedLayerNorm(dtype=fusion.dtype)
        self.classifier = nn.Dense(s.output_dim, dtype=fusion.dtype)

    def __call__(self, batch: Dict[str, jax.Array],
                 *, deterministic: bool = True) -> jax.Array:
        fused, type_ids, keep = self.preformer(
            batch["input_ids"], batch["text_mask"], batch["waveform"],
            batch["audio_mask"], batch["video"], batch["video_keep"],
            deterministic=deterministic)
        x = fused + self.modality_embedding(type_ids)
        x = self.encoder(x, additive_mask(keep), deterministic=deterministic)
        x = self.norm(masked_mean_pool(x, keep))
        return self.classifier(x)


class TAVForMAETwoTower(nn.Module):
    """Older 2-tower TAVForMAE (reference ``models/multi+late.py:375-423``):
    fused A+V sequence + modality embedding through a randomly-initialized
    VideoMAE-style encoder → mean → LN, concatenated with the BERT pooled
    output → dropout → Linear(1536, C)."""

    spec: TAVSpec

    def setup(self):
        s = self.spec
        self.preformer = PreFormer(s)
        self.modality_embedding = nn.Embed(3, s.hidden, dtype=s.fusion.dtype)
        self.text_encoder = TextEncoder(s.text)
        self.fusion_encoder = TransformerEncoder(s.fusion)
        self.fc_norm = FusedLayerNorm(dtype=s.fusion.dtype)
        self.dropout = nn.Dropout(rate=s.dropout)
        self.classifier = nn.Dense(s.output_dim, dtype=s.fusion.dtype)

    def __call__(self, batch: Dict[str, jax.Array],
                 *, deterministic: bool = True) -> jax.Array:
        fused, type_ids, keep = self.preformer(
            batch["input_ids"], batch["text_mask"], batch["waveform"],
            batch["audio_mask"], batch["video"], batch["video_keep"],
            deterministic=deterministic)
        av = fused + self.modality_embedding(type_ids)
        av = self.fusion_encoder(av, additive_mask(keep),
                                 deterministic=deterministic)
        av = self.fc_norm(masked_mean_pool(av, keep))
        _, t = self.text_encoder(batch["input_ids"], batch["text_mask"],
                                 deterministic=deterministic)
        x = jnp.concatenate([t, av], axis=1)
        x = self.dropout(x, deterministic=deterministic)
        return self.classifier(x)


class TAVForW2V2(nn.Module):
    """wav2vec2-base-architecture fusion trunk, randomly initialized
    (reference ``models/multi+late.py:430-476``): fused sequence + modality
    embedding through post-LN wav2vec2-style encoder layers (no conv
    positional embedding — the reference calls ``encoder.layers`` directly)
    → mean → LN → dropout → Linear(hidden, C). Per-layer checkpointing for
    batch≥8 becomes EncoderSpec.remat."""

    spec: TAVSpec

    def setup(self):
        s = self.spec
        trunk = dataclasses.replace(s.fusion, ln_style="post",
                                    qkv_bias="full")
        self.preformer = PreFormer(s)
        self.modality_embedding = nn.Embed(3, s.hidden, dtype=trunk.dtype)
        self.encoder = TransformerEncoder(trunk)
        self.fc_norm = FusedLayerNorm(dtype=trunk.dtype)
        self.dropout = nn.Dropout(rate=s.dropout)
        self.classifier = nn.Dense(s.output_dim, dtype=trunk.dtype)

    def __call__(self, batch: Dict[str, jax.Array],
                 *, deterministic: bool = True) -> jax.Array:
        fused, type_ids, keep = self.preformer(
            batch["input_ids"], batch["text_mask"], batch["waveform"],
            batch["audio_mask"], batch["video"], batch["video_keep"],
            deterministic=deterministic)
        x = fused + self.modality_embedding(type_ids)
        x = self.encoder(x, additive_mask(keep),
                         deterministic=deterministic)
        x = self.fc_norm(masked_mean_pool(x, keep))
        x = self.dropout(x, deterministic=deterministic)
        return self.classifier(x)


class TAVMoEFormer(nn.Module):
    """Sparse-MoE fusion trunk (beyond-reference capability): the fused
    sequence through a ``MoETransformerEncoder`` (every 2nd block's MLP is a
    top-2 routed expert mixture, models/moe.py), mean-pool → LN →
    Linear(hidden, C). Experts shard over an ``ep`` mesh axis when
    ``moe.ep_axis`` is set. The router's load-balancing aux loss is sown;
    train with ``make_train_step(..., has_aux_loss=True)`` and an apply_fn
    that collects it (cli/tav_nn.py)."""

    spec: TAVSpec
    moe: Any = None  # MoESpec; default built in setup to avoid import cycle

    def setup(self):
        from mme_tpu.models.moe import MoESpec, MoETransformerEncoder
        s = self.spec
        moe = self.moe if self.moe is not None else MoESpec()
        self.preformer = PreFormer(s)
        self.modality_embedding = nn.Embed(3, s.hidden, dtype=s.fusion.dtype)
        self.encoder = MoETransformerEncoder(s.fusion, moe)
        self.norm = FusedLayerNorm(dtype=s.fusion.dtype)
        self.dropout = nn.Dropout(rate=s.dropout)
        self.classifier = nn.Dense(s.output_dim, dtype=s.fusion.dtype)

    def __call__(self, batch: Dict[str, jax.Array],
                 *, deterministic: bool = True) -> jax.Array:
        fused, type_ids, keep = self.preformer(
            batch["input_ids"], batch["text_mask"], batch["waveform"],
            batch["audio_mask"], batch["video"], batch["video_keep"],
            deterministic=deterministic)
        x = fused + self.modality_embedding(type_ids)
        x = self.encoder(x, additive_mask(keep), deterministic=deterministic)
        x = self.norm(masked_mean_pool(x, keep))
        x = self.dropout(x, deterministic=deterministic)
        return self.classifier(x)


FUSION_MODELS = {
    "MAE_encoder": TAVModel,        # reference default (tav_nn.py -m)
    "TAVForMAE": TAVModel,
    "TAVFormer": TAVFormer,
    "TAVForMAE2Tower": TAVForMAETwoTower,
    "TAVForW2V2": TAVForW2V2,
    "TAVMoE": TAVMoEFormer,         # beyond-reference sparse-expert trunk
}
