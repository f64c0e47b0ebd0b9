"""The ``learn_PosEmbeddings`` and ``mask`` flags must change behavior.

Round-1 regression: both flags were parsed and stored but read by nothing
(a flag surface that parses-but-ignores is worse than absent). Reference
semantics: ``learn_PosEmbeddings`` toggles ``requires_grad`` on the 3-way
modality embedding (``models/tav.py:435-436``); ``mask`` is dead in the
reference (``tav_nn.py:78``) and here gates the masking augmentations
(SpecAugment + random visual keep-mask).
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from mme_tpu.core.config import ExperimentConfig
from mme_tpu.models.fusion import TAVSpec
from mme_tpu.ops.video import uniform_keep_mask
from mme_tpu.train.build_tav import (build_tav, example_tav_batch,
                                     make_video_keep_transform,
                                     modality_embedding_trainable_mask)


def _one_update(learn: bool):
    spec = dataclasses.replace(TAVSpec(output_dim=7).tiny(),
                               learn_pos_embeddings=learn)
    cfg = ExperimentConfig(batch_size=2, text_max_len=12,
                           audio_max_samples=400, learning_rate=1e-2)
    batch = example_tav_batch(spec, 2, 12, 400)
    _m, state, train_step, _e = build_tav(spec, cfg, steps_per_epoch=10,
                                          example_batch=batch, remat=False)
    before = jax.tree.map(np.asarray, state.params)
    state, loss, _, _ = train_step(
        state, batch, jnp.asarray([0, 1]), jnp.ones((2,), jnp.int32),
        jnp.ones((7,), jnp.float32), jnp.asarray(1.0, jnp.float32),
        jnp.asarray(True), jax.random.PRNGKey(0))
    return before, jax.tree.map(np.asarray, state.params)


def test_learn_pos_embeddings_false_freezes_modality_embedding():
    before, after = _one_update(learn=False)
    me_b = before["model"]["modality_embedding"]["embedding"]
    me_a = after["model"]["modality_embedding"]["embedding"]
    np.testing.assert_array_equal(me_b, me_a)
    # everything else still trains
    cls_b = before["model"]["classifier"]["kernel"]
    cls_a = after["model"]["classifier"]["kernel"]
    assert np.abs(cls_a - cls_b).max() > 0


def test_learn_pos_embeddings_true_trains_modality_embedding():
    before, after = _one_update(learn=True)
    me_b = before["model"]["modality_embedding"]["embedding"]
    me_a = after["model"]["modality_embedding"]["embedding"]
    assert np.abs(me_a - me_b).max() > 0


def test_trainable_mask_none_when_learning():
    assert modality_embedding_trainable_mask({"a": 1}, True) is None


def test_make_optimizer_trainable_mask_actually_freezes():
    # optax.masked passes raw grads through for mask=False leaves — the
    # round-1 wiring silently trained "frozen" params (images_nn backbone).
    from mme_tpu.train.steps import make_optimizer
    params = {"a": jnp.ones((3,)), "b": jnp.ones((3,))}
    tx = make_optimizer(lambda s: 0.1, 0.0, 1.0,
                        trainable_mask={"a": True, "b": False})
    opt_state = tx.init(params)
    grads = {"a": jnp.ones((3,)), "b": jnp.ones((3,))}
    updates, _ = tx.update(grads, opt_state, params)
    assert np.abs(np.asarray(updates["a"])).max() > 0
    np.testing.assert_array_equal(np.asarray(updates["b"]), 0.0)


def test_uniform_keep_mask_exact_k_and_deterministic():
    m = uniform_keep_mask(3, 40, 7)
    assert m.shape == (3, 40)
    np.testing.assert_array_equal(np.asarray(m).sum(-1), [7, 7, 7])
    np.testing.assert_array_equal(np.asarray(m[0]), np.asarray(m[2]))


def test_mask_flag_gates_random_visual_mask():
    spec = TAVSpec(output_dim=7).tiny()
    batch = {"x": jnp.zeros((2, 3))}
    fixed = make_video_keep_transform(spec, random_mask=False)
    rnd = make_video_keep_transform(spec, random_mask=True)
    f1 = fixed(jax.random.PRNGKey(0), batch)["video_keep"]
    f2 = fixed(jax.random.PRNGKey(1), batch)["video_keep"]
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    r1 = rnd(jax.random.PRNGKey(0), batch)["video_keep"]
    r2 = rnd(jax.random.PRNGKey(1), batch)["video_keep"]
    assert (np.asarray(r1) != np.asarray(r2)).any()
    # exact-k contract holds for all variants
    for m in (f1, r1):
        np.testing.assert_array_equal(np.asarray(m).sum(-1),
                                      [spec.video_keep_k] * 2)
