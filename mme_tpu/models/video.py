"""Video towers: VideoMAE encoder family + classifiers.

Capability parity targets in the reference:
- HF ``VideoMAEModel`` ('MCG-NJU/videomae-base-finetuned-kinetics') used as
  the video tower in PreFormer/TAVForMAE (``models/tav.py:263,456,480``),
  including ``bool_masked_pos`` visible-token gathering;
- the copied maskable ``VideoMAEEncoder`` (``utils/TAVFormer.py:171-439``,
  ``models/VIDMAE.py``) that serves as TAVForMAE's randomly-initialized
  fusion trunk (``models/tav.py:441-442,487``) — here that trunk is just our
  shared pre-LN ``TransformerEncoder`` with correct additive masking (the
  reference adds the mask after softmax, a bug we do not replicate);
- ``SingleModels/models/visual.py:176-219`` scratch Conv3D classifier.

TPU-first: the tubelet Conv3D (kernel == stride, non-overlapping) is
implemented as reshape + one MXU matmul instead of a 3-D convolution; video
arrives channels-last ``[B, T, H, W, C]``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mme_tpu.models.layers import EncoderSpec, TransformerEncoder
from mme_tpu.ops.video import gather_visible, sinusoid_position_table


@dataclasses.dataclass(frozen=True)
class VideoMAESpec:
    image_size: int = 224
    patch_size: int = 16
    num_frames: int = 16
    tubelet_size: int = 2
    channels: int = 3
    encoder: EncoderSpec = dataclasses.field(default_factory=lambda: EncoderSpec(
        hidden=768, heads=12, layers=12, intermediate=3072,
        ln_style="pre", qkv_bias="qv", ln_eps=1e-12))

    @property
    def num_patches(self) -> int:
        side = self.image_size // self.patch_size
        return (self.num_frames // self.tubelet_size) * side * side  # 1568

    @staticmethod
    def base(**kw: Any) -> "VideoMAESpec":
        return VideoMAESpec(**kw)


class _TubeletProj(nn.Module):
    """The tubelet projection, stored as the [(t,p,p,C), hidden] matmul
    kernel (same param tree/init as the former ``nn.Dense(name="proj")``,
    so HF imports and round-2 checkpoints load unchanged) but APPLIED as
    ``t`` stride-``p`` 2-D convolutions summed over the tubelet offset.

    Why: the reshape+8-D-transpose+matmul formulation materialized the
    patch shuffle as an XLA copy running at 47 GiB/s (~2.8 ms/step at the
    bench shape — the single most expensive non-matmul op in the round-3
    profile). A kernel-sized-stride conv2d lets the TPU conv emitter do
    the patchification during the MXU operand fetch instead:
    reshape+matmul 5.42 ms → conv2d×2 2.88 ms measured standalone
    (scripts/patchify_bench.py; conv3d is slower, 6.11 ms)."""

    features: int
    tubelet_size: int
    patch_size: int
    channels: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, video: jax.Array) -> jax.Array:
        t, p, c = self.tubelet_size, self.patch_size, self.channels
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (t * p * p * c, self.features),
                            self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        B, T, H, W, C = video.shape
        x = video.astype(self.dtype)
        w = kernel.reshape(t, p, p, c, self.features).astype(self.dtype)
        out = None
        for i in range(t):
            # [B, T', H, W, C]: frames at tubelet offset i (strided slice —
            # coalesced [H,W,C] chunks, unlike the old fine-grained shuffle)
            frames = x.reshape(B, T // t, t, H, W, C)[:, :, i]
            frames = frames.reshape(B * (T // t), H, W, C)
            o = jax.lax.conv_general_dilated(
                frames, w[i], (p, p), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            out = o if out is None else out + o
        n_tok = (T // t) * (H // p) * (W // p)
        return (out.reshape(B, n_tok, self.features)
                + bias.astype(self.dtype))


class TubeletEmbed(nn.Module):
    """Non-overlapping 3-D patch embedding.

    Equivalent to HF's Conv3d(kernel=(t,p,p), stride=(t,p,p)); the importer
    reshapes the conv weight into the [(t,p,p,C), hidden] matmul kernel.
    Output token order is (t', h', w') — identical to HF's
    ``flatten(2).transpose``. Applied as summed stride-p conv2ds, see
    :class:`_TubeletProj`."""

    spec: VideoMAESpec

    @nn.compact
    def __call__(self, video: jax.Array) -> jax.Array:
        s = self.spec
        e = s.encoder
        return _TubeletProj(features=e.hidden, tubelet_size=s.tubelet_size,
                            patch_size=s.patch_size, channels=s.channels,
                            dtype=e.dtype, param_dtype=e.param_dtype,
                            name="proj")(video)


class VideoMAEModel(nn.Module):
    """VideoMAE encoder: tubelet embed + fixed sinusoid positions + pre-LN
    stack. ``visible_mask`` (keep=True, exactly ``keep_k`` per row) selects
    tokens before the encoder — the complement convention of HF's
    ``bool_masked_pos`` (masked=True), matching how the reference feeds it
    (``models/tav.py:368,480``)."""

    spec: VideoMAESpec

    def setup(self):
        self.patch_embed = TubeletEmbed(self.spec)
        self.encoder = TransformerEncoder(self.spec.encoder)

    def embed(self, video: jax.Array,
              visible_mask: Optional[jax.Array] = None,
              keep_k: Optional[int] = None) -> jax.Array:
        """Embedding stage only — the PreFormer video path
        (``models/tav.py:368``)."""
        s = self.spec
        x = self.patch_embed(video)
        pos = jnp.asarray(sinusoid_position_table(s.num_patches,
                                                  s.encoder.hidden))
        x = x + pos.astype(x.dtype)
        if visible_mask is not None:
            assert keep_k is not None, "static keep_k required with a mask"
            x = gather_visible(x, visible_mask, keep_k)
        return x

    def __call__(self, video: jax.Array,
                 visible_mask: Optional[jax.Array] = None,
                 keep_k: Optional[int] = None,
                 *, deterministic: bool = True) -> jax.Array:
        x = self.embed(video, visible_mask, keep_k)
        return self.encoder(x, None, deterministic=deterministic)


class VideoMAEClassifier(nn.Module):
    """Mean-pool classifier over VideoMAE features (the reference's video
    tower usage, ``models/tav.py:480-481``)."""

    spec: VideoMAESpec
    output_dim: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, video: jax.Array,
                 visible_mask: Optional[jax.Array] = None,
                 keep_k: Optional[int] = None,
                 *, deterministic: bool = True) -> jax.Array:
        h = VideoMAEModel(self.spec, name="videomae")(
            video, visible_mask, keep_k, deterministic=deterministic)
        pooled = h.mean(axis=1)
        pooled = nn.Dropout(rate=self.dropout)(pooled,
                                               deterministic=deterministic)
        return nn.Dense(self.output_dim, dtype=self.spec.encoder.dtype,
                        param_dtype=self.spec.encoder.param_dtype,
                        name="classifier")(pooled)


class Conv3DClassifier(nn.Module):
    """Scratch 3-D ConvNet video classifier (reference
    ``SingleModels/models/visual.py:176-219`` capability)."""

    output_dim: int
    widths: Tuple[int, ...] = (32, 64, 128)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, video: jax.Array, *, deterministic: bool = True
                 ) -> jax.Array:
        x = video  # [B, T, H, W, C]
        for i, w in enumerate(self.widths):
            x = nn.Conv(w, kernel_size=(3, 3, 3), strides=(1, 2, 2),
                        dtype=self.dtype, name=f"conv_{i}")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, window_shape=(1, 2, 2), strides=(1, 2, 2))
        x = x.mean(axis=(1, 2, 3))
        x = nn.Dense(256, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(rate=0.5)(x, deterministic=deterministic)
        return nn.Dense(self.output_dim, dtype=self.dtype, name="fc2")(x)


class Bottleneck3D(nn.Module):
    """3-D bottleneck block (slow-pathway style): temporal extent on the
    first 1×1 conv, spatial stride on the 3×3."""

    features: int
    temporal_kernel: int = 1
    strides: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        norm = lambda name: nn.BatchNorm(use_running_average=not train,
                                         momentum=0.9, epsilon=1e-5,
                                         dtype=self.dtype, name=name)
        tk = self.temporal_kernel
        residual = x
        y = nn.Conv(self.features, (tk, 1, 1),
                    padding=[(tk // 2, tk // 2), (0, 0), (0, 0)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = nn.Conv(self.features, (1, 3, 3),
                    strides=(1, self.strides, self.strides),
                    padding=[(0, 0), (1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.relu(norm("bn2")(y))
        y = nn.Conv(self.features * 4, (1, 1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = norm("bn3")(y)
        if self.downsample:
            residual = nn.Conv(self.features * 4, (1, 1, 1),
                               strides=(1, self.strides, self.strides),
                               use_bias=False, dtype=self.dtype,
                               name="down_conv")(x)
            residual = norm("down_bn")(residual)
        return nn.relu(y + residual)


class SlowR50(nn.Module):
    """Slow-pathway 3-D ResNet-50 (the capability of torch.hub ``slow_r50``
    used at ``SingleModels/models/visual.py:133-174``): 1×7×7 stem, four
    bottleneck stages with temporal kernels (1,1,3,3), global avg-pool →
    projection head → classifier (the reference replaces the head with a
    proj→768 Linear)."""

    output_dim: int
    proj_dim: int = 768
    stage_sizes: Tuple[int, ...] = (3, 4, 6, 3)
    temporal_kernels: Tuple[int, ...] = (1, 1, 3, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, video: jax.Array, *, train: bool = False,
                 features_only: bool = False) -> jax.Array:
        # video: [B, T, H, W, C]
        y = nn.Conv(64, (1, 7, 7), strides=(1, 2, 2),
                    padding=[(0, 0), (3, 3), (3, 3)], use_bias=False,
                    dtype=self.dtype, name="stem_conv")(video)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="stem_bn")(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (1, 3, 3), strides=(1, 2, 2),
                        padding=[(0, 0), (1, 1), (1, 1)])
        widths = (64, 128, 256, 512)
        for stage, (blocks, w, tk) in enumerate(
                zip(self.stage_sizes, widths, self.temporal_kernels)):
            for b in range(blocks):
                strides = 2 if (stage > 0 and b == 0) else 1
                y = Bottleneck3D(w, temporal_kernel=tk, strides=strides,
                                 downsample=(b == 0), dtype=self.dtype,
                                 name=f"layer{stage + 1}_{b}")(y, train=train)
        pooled = y.mean(axis=(1, 2, 3))
        if features_only:
            return pooled
        proj = nn.Dense(self.proj_dim, dtype=self.dtype, name="proj")(pooled)
        proj = nn.relu(proj)
        return nn.Dense(self.output_dim, dtype=self.dtype,
                        name="classifier")(proj)
