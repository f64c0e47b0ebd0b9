"""Misc tensor transforms from the reference utility layer.

- ``pool``: mean/max/median over the leading axis
  (``utils/global_functions.py:86-99``);
- ``crop_video``: fixed-box crop per frame — the IEMOCAP left/right speaker
  isolation (``utils/global_functions.py:101-112``; boxes at
  ``models/tav.py:86``);
- ``random_flip``: horizontal/vertical train-time flips of video batches
  (``models/tav.py:91-92``) as a jitted RNG-keyed op (the reference flips
  per sample on CPU inside collate).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

IEMOCAP_LEFT_BOX = (120, 2, 245, 355)    # (top, left, height, width)
IEMOCAP_RIGHT_BOX = (120, 362, 245, 355)


def pool(x: jax.Array, mode: str) -> jax.Array:
    if mode == "mean":
        return x.mean(axis=0)
    if mode == "max":
        return x.max(axis=0)
    if mode == "median":
        return jnp.median(x, axis=0)
    raise NotImplementedError(
        "The supported modes are 'mean', 'max' and 'median'")


def crop_video(video: jax.Array, box: Tuple[int, int, int, int]) -> jax.Array:
    """video: [..., H, W, C]; box: (top, left, height, width)."""
    t, l, h, w = box
    return video[..., t:t + h, l:l + w, :]


def random_flip(rng: jax.Array, video: jax.Array,
                p_horizontal: float = 0.5,
                p_vertical: float = 0.5) -> jax.Array:
    """Per-sample random H/V flips of [B, T, H, W, C] video batches."""
    B = video.shape[0]
    kh, kv = jax.random.split(rng)
    do_h = jax.random.uniform(kh, (B, 1, 1, 1, 1)) < p_horizontal
    do_v = jax.random.uniform(kv, (B, 1, 1, 1, 1)) < p_vertical
    flipped_h = jnp.flip(video, axis=3)
    out = jnp.where(do_h, flipped_h, video)
    flipped_v = jnp.flip(out, axis=2)
    return jnp.where(do_v, flipped_v, out)
