"""Image towers: ResNet-50 (v1.5) and the scratch ConvNet.

Capability parity targets in the reference:
- ``SingleModels/models/image.py:30-60`` ``ResnetClassification`` — frozen
  torchvision resnet50 backbone with a fresh fc head (Hateful Memes);
- ``SingleModels/models/image.py:64-101`` ``ImageClassification`` — small
  ConvNet with sigmoid output;
- the VisualBERT feature extractor (``DoubleModels/models/visualBert.py:51-56``)
  — resnet50 with fc→1024 + ReLU, which the reference re-instantiates INSIDE
  collate on every batch (a bug we obviously don't copy: here it is a normal
  module applied once per batch on device).

The architecture matches torchvision's Bottleneck resnet50 exactly (stride on
the 3×3 conv) so pretrained weights import 1:1; BatchNorm runs in inference
mode with imported running statistics (the reference never calls ``.eval()``,
SURVEY.md §2.6 item 6 — a parity trap we document, not replicate).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class Bottleneck(nn.Module):
    features: int          # bottleneck width; output is 4*features
    strides: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        norm = lambda name: nn.BatchNorm(use_running_average=not train,
                                         momentum=0.9, epsilon=1e-5,
                                         dtype=self.dtype, name=name)
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = norm("bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.strides,) * 2,
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = norm("bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = norm("bn3")(y)
        if self.downsample:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.strides,) * 2, use_bias=False,
                               dtype=self.dtype, name="down_conv")(x)
            residual = norm("down_bn")(residual)
        return nn.relu(y + residual)


class ResNet50(nn.Module):
    """torchvision-compatible resnet50 backbone → pooled features + fc."""

    num_classes: int = 1000
    dtype: Dtype = jnp.float32
    stage_sizes: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False
                 ) -> Tuple[jax.Array, jax.Array]:
        """x: [B, H, W, 3] → (logits, pooled_features[B, 2048])."""
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        y = nn.max_pool(y, (3, 3), strides=(2, 2))
        widths = (64, 128, 256, 512)
        for stage, (blocks, w) in enumerate(zip(self.stage_sizes, widths)):
            for b in range(blocks):
                strides = 2 if (stage > 0 and b == 0) else 1
                y = Bottleneck(w, strides=strides, downsample=(b == 0),
                               dtype=self.dtype,
                               name=f"layer{stage + 1}_{b}")(y, train=train)
        pooled = y.mean(axis=(1, 2))
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          name="fc")(pooled)
        return logits, pooled


class ResnetClassifier(nn.Module):
    """Frozen-backbone classifier (reference ``ResnetClassification``).
    Freezing is a training-policy concern handled by the optimizer's
    trainable-param filter (train/policies.py), not the module."""

    output_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        _, pooled = ResNet50(num_classes=1, dtype=self.dtype,
                             name="backbone")(x, train=train)
        return nn.Dense(self.output_dim, dtype=self.dtype, name="fc")(pooled)


class ConvNetClassifier(nn.Module):
    """Scratch ConvNet (reference ``ImageClassification``): stacked 3×3
    convs + ReLU → flatten → Linear → sigmoid, squeezed to [B] for the
    binary Hateful-Memes task."""

    hidden_dims: Sequence[int] = (32, 32)
    output_dim: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, w in enumerate(self.hidden_dims):
            x = nn.Conv(w, (3, 3), padding="VALID", dtype=self.dtype,
                        name=f"conv_{i}")(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.output_dim, dtype=self.dtype, name="fc")(x)
        x = jax.nn.sigmoid(x)
        # the reference's binary head flattens to [B] (image.py:100)
        return x.reshape(-1) if self.output_dim == 1 else x


class ResNetFeatureExtractor(nn.Module):
    """resnet50 + fc→feature_dim + ReLU: the VisualBERT visual-feature path
    (``DoubleModels/models/visualBert.py:51-56``), as a proper on-device
    module instead of a per-batch re-instantiated torchvision model."""

    feature_dim: int = 1024
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        _, pooled = ResNet50(num_classes=1, dtype=self.dtype,
                             name="backbone")(x, train=train)
        feat = nn.Dense(self.feature_dim, dtype=self.dtype, name="fc")(pooled)
        return nn.relu(feat)[:, None, :]  # [B, 1, feature_dim]
