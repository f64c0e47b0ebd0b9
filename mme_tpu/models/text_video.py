"""Text+Video double models (reference ``DoubleModels/models/text_video.py``).

- ``BertVideoMAEMTLShared`` (``:144-177``): multi-task model with ONE shared
  Linear(768,768) injected after BOTH towers' embedding stages (the
  CustomRobLayer/CustomOriginalLayer wrappers, ``:123-142``); each step runs
  either the text task (task 0 → BERT pooled output) or the video task
  (task 1 → VideoMAE mean-pool → LayerNorm), sampled p=[.6,.4] by the
  trainer (``DoubleModels/train_model/text_video_train.py:30``); shared
  dropout → Linear(768, C) head.
- ``BertVideoMAELateFusion`` (``:180-210``): BERT pooled ⊕ LN(mean-pooled
  VideoMAE) → dropout → Linear(1536, C).

TPU note: the task switch is a ``lax.cond`` on a traced task id — one
compiled program, no retrace when the trainer flips tasks.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mme_tpu.models.text import TextEncoder, TextEncoderSpec
from mme_tpu.models.video import VideoMAEModel, VideoMAESpec
from mme_tpu.ops.layer_norm import FusedLayerNorm


@dataclasses.dataclass(frozen=True)
class TextVideoSpec:
    text: TextEncoderSpec = dataclasses.field(
        default_factory=TextEncoderSpec.distilroberta)
    video: VideoMAESpec = dataclasses.field(default_factory=VideoMAESpec.base)
    hidden: int = 768
    output_dim: int = 7
    dropout: float = 0.5

    def tiny(self) -> "TextVideoSpec":
        def small(e):
            return dataclasses.replace(e, hidden=32, heads=4, layers=2,
                                       intermediate=64)
        return dataclasses.replace(
            self,
            text=dataclasses.replace(self.text, vocab_size=101,
                                     encoder=small(self.text.encoder)),
            video=dataclasses.replace(self.video, image_size=32, patch_size=8,
                                      num_frames=4,
                                      encoder=small(self.video.encoder)),
            hidden=32)


class SharedEmbedText(nn.Module):
    """TextEncoder whose embedding output passes through a shared layer —
    the CustomRobLayer injection point."""

    spec: TextEncoderSpec

    @nn.compact
    def __call__(self, input_ids, attention_mask, shared, *,
                 deterministic=True):
        from mme_tpu.models.layers import TransformerEncoder
        from mme_tpu.models.text import TextEmbeddings
        from mme_tpu.ops.attention import additive_mask
        s = self.spec
        x = TextEmbeddings(s, name="embeddings")(
            input_ids, deterministic=deterministic)
        x = shared(x)
        bias = additive_mask(attention_mask)
        x = TransformerEncoder(s.encoder, name="encoder")(
            x, bias, deterministic=deterministic)
        pooled = jnp.tanh(nn.Dense(s.encoder.hidden, dtype=s.encoder.dtype,
                                   name="pooler")(x[:, 0]))
        return pooled


class SharedEmbedVideo(nn.Module):
    """VideoMAE whose patch/positional embedding output passes through the
    shared layer — the CustomOriginalLayer injection point."""

    spec: VideoMAESpec

    @nn.compact
    def __call__(self, video, shared, *, deterministic=True):
        from mme_tpu.models.layers import TransformerEncoder
        from mme_tpu.models.video import TubeletEmbed
        from mme_tpu.ops.video import sinusoid_position_table
        s = self.spec
        x = TubeletEmbed(s, name="patch_embed")(video)
        pos = jnp.asarray(sinusoid_position_table(s.num_patches,
                                                  s.encoder.hidden))
        x = shared(x + pos.astype(x.dtype))
        return TransformerEncoder(s.encoder, name="encoder")(
            x, None, deterministic=deterministic)


class BertVideoMAEMTLShared(nn.Module):
    spec: TextVideoSpec

    @nn.compact
    def __call__(self, input_ids: jax.Array, text_mask: jax.Array,
                 video: jax.Array, task_id: jax.Array,
                 *, deterministic: bool = True) -> jax.Array:
        s = self.spec
        shared = nn.Dense(s.hidden, dtype=s.text.encoder.dtype,
                          kernel_init=nn.initializers.xavier_normal(),
                          name="shared_layer")
        text_pooled = SharedEmbedText(s.text, name="bert")(
            input_ids, text_mask, shared, deterministic=deterministic)
        vid_hidden = SharedEmbedVideo(s.video, name="videomae")(
            video, shared, deterministic=deterministic)
        vid_pooled = FusedLayerNorm(name="fc_norm")(vid_hidden.mean(axis=1))
        # lax.cond would skip the unused tower's FLOPs but both must run to
        # keep gradients defined under vmap/scan; a where-select matches the
        # trainer's per-step task routing while staying one program.
        out = jnp.where((task_id == 0)[..., None]
                        if task_id.ndim else task_id == 0,
                        text_pooled, vid_pooled)
        out = nn.Dropout(rate=s.dropout)(out, deterministic=deterministic)
        return nn.Dense(s.output_dim, name="classifier")(out)


class BertVideoMAELateFusion(nn.Module):
    spec: TextVideoSpec

    @nn.compact
    def __call__(self, input_ids: jax.Array, text_mask: jax.Array,
                 video: jax.Array,
                 task_id: Optional[jax.Array] = None,
                 *, deterministic: bool = True) -> jax.Array:
        s = self.spec
        _, pooled = TextEncoder(s.text, name="bert")(
            input_ids, text_mask, deterministic=deterministic)
        vid = VideoMAEModel(s.video, name="videomae")(
            video, deterministic=deterministic)
        vid = FusedLayerNorm(name="fc_norm")(vid.mean(axis=1))
        x = jnp.concatenate([pooled, vid], axis=1)
        x = nn.Dropout(rate=s.dropout)(x, deterministic=deterministic)
        return nn.Dense(s.output_dim, name="classifier")(x)
