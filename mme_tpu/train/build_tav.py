"""Assembly of the flagship TAV training setup (model+optimizer+steps).

Shared by the CLI (cli/tav_nn.py), the benchmark (bench.py), and the driver
entry (__graft_entry__.py). Mirrors the reference wiring in
``tav_nn.py:59-112`` + ``train_model/tav_train.py:147-160``: AdamW over
trainable params, cosine warm restarts, PreFormer+TAVForMAE — but as one
jitted step on sharded batches.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mme_tpu.core.config import ExperimentConfig
from mme_tpu.models.fusion import TAVModel, TAVSpec
from mme_tpu.ops.video import balanced_keep_mask, uniform_keep_mask
from mme_tpu.train.schedules import cosine_warm_restarts
from mme_tpu.train.steps import (TrainState, make_eval_step, make_optimizer,
                                 make_train_step)


def example_tav_batch(spec: TAVSpec, batch_size: int, text_len: int,
                      audio_len: int, rng: Optional[jax.Array] = None
                      ) -> Dict[str, jax.Array]:
    if rng is None:
        rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "input_ids": jax.random.randint(
            k1, (batch_size, text_len), 0, spec.text.vocab_size, jnp.int32),
        "text_mask": jnp.ones((batch_size, text_len), jnp.int32),
        "waveform": jax.random.normal(k2, (batch_size, audio_len),
                                      jnp.float32),
        "audio_mask": jnp.ones((batch_size, audio_len), jnp.int32),
        "video": jax.random.normal(
            k3, (batch_size, spec.video.num_frames, spec.video.image_size,
                 spec.video.image_size, 3), jnp.float32),
        "video_keep": balanced_keep_mask(rng, batch_size,
                                         spec.video.num_patches,
                                         spec.video_keep_k),
    }


def make_video_keep_transform(spec: TAVSpec, random_mask: bool = True):
    """Per-batch visual keep-mask + on-device video normalization.

    ``random_mask=True``: random balanced mask resampled every batch — the
    reference's collate behavior (``models/tav.py:207-217``).
    ``random_mask=False``: a fixed evenly-strided mask — the ``--mask``
    flag's off position (the reference parses the flag but never reads it,
    ``tav_nn.py:78``; here it genuinely gates the masking augmentations).

    uint8 video (records built with ``video_uint8=True``) is ImageNet-
    normalized here on device — the record/transfer stays 4× smaller than
    fp32. Padding frames (all-zero uint8) map back to exact 0.0 to match
    the fp32 path's zero-pad semantics (reference pads AFTER normalization,
    ``models/tav.py:154-160``; an all-black real frame is indistinguishable
    from padding in uint8 and is also zeroed — a documented edge)."""
    from mme_tpu.data.records import IMAGENET_MEAN, IMAGENET_STD
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)

    def transform(rng: jax.Array, batch: Dict[str, Any]) -> Dict[str, Any]:
        b = dict(batch)
        n = len(next(iter(batch.values())))
        v = b.get("video")
        if v is not None and jnp.asarray(v).dtype == jnp.uint8:
            v = jnp.asarray(v)
            valid = (v.reshape(v.shape[0], v.shape[1], -1).max(axis=-1)
                     > 0)
            vf = (v.astype(jnp.float32) / 255.0 - mean) / std
            b["video"] = vf * valid[:, :, None, None, None]
        if random_mask:
            b["video_keep"] = balanced_keep_mask(
                rng, n, spec.video.num_patches, spec.video_keep_k)
        else:
            b["video_keep"] = uniform_keep_mask(
                n, spec.video.num_patches, spec.video_keep_k)
        return b

    return transform


def modality_embedding_trainable_mask(params: Any, learn: bool):
    """``learn_PosEmbeddings`` flag: the reference toggles ``requires_grad``
    on the 3-way modality embedding (``models/tav.py:435-436``). Expressed
    here as an optax trainable mask: returns None when everything trains
    (no masking overhead), else a bool pytree freezing every leaf under a
    ``modality_embedding`` module."""
    if learn:
        return None

    def keep(path) -> bool:
        return not any(getattr(k, "key", None) == "modality_embedding"
                       for k in path)

    return jax.tree_util.tree_map_with_path(lambda p, _: keep(p), params)


def build_tav(spec: TAVSpec, cfg: ExperimentConfig, steps_per_epoch: int,
              example_batch: Optional[Dict[str, jax.Array]] = None,
              remat=True, use_accum: bool = True
              ) -> Tuple[TAVModel, TrainState, Any, Any]:
    """Returns (model, state, train_step, eval_step).

    ``remat``: True → remat every encoder; ``"av"`` → remat only the audio
    and video encoders (the activation hogs: 24 layers × ~300 frames and
    12 layers × 1464 tokens) keeping text/fusion unremat'd; False → none.
    The conv feature-extractor remat is independent (spec.audio.remat_conv).
    """
    if remat:
        av_only = remat == "av"
        spec = dataclasses.replace(
            spec,
            text=spec.text if av_only else dataclasses.replace(
                spec.text, encoder=dataclasses.replace(
                    spec.text.encoder, remat=True)),
            audio=dataclasses.replace(
                spec.audio, encoder=dataclasses.replace(
                    spec.audio.encoder, remat=True)),
            video=dataclasses.replace(
                spec.video, encoder=dataclasses.replace(
                    spec.video.encoder, remat=True)),
            fusion=spec.fusion if av_only
            else dataclasses.replace(spec.fusion, remat=True))
    model = TAVModel(spec)
    if example_batch is None:
        example_batch = example_tav_batch(spec, 1, cfg.text_max_len,
                                          cfg.audio_max_samples)
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(cfg.seed), example_batch)
    )()["params"]

    tx = make_optimizer(
        cosine_warm_restarts(cfg.learning_rate, cfg.T_max, steps_per_epoch),
        cfg.weight_decay, cfg.clip,
        modality_embedding_trainable_mask(params, spec.learn_pos_embeddings))
    state = TrainState.create(params, tx, use_accum=use_accum)

    def apply_fn(variables, batch, deterministic=True, rngs=None,
                 mutable=None):
        return model.apply(variables, batch, deterministic=deterministic,
                           rngs=rngs)

    train_step = make_train_step(apply_fn, tx, num_classes=spec.output_dim,
                                 rng_names=("dropout", "spec_augment"))
    eval_step = make_eval_step(apply_fn, num_classes=spec.output_dim)
    return model, state, train_step, eval_step
