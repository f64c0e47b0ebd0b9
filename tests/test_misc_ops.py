"""Transforms, GloVe loading, AV-only PreFormer, and resume tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mme_tpu.ops.transforms import crop_video, pool, random_flip
from mme_tpu.data.glove import (load_glove_txt, set_embedding_table,
                                tokenize_with_vocab)


def test_pool_modes():
    x = jnp.asarray(np.arange(12).reshape(4, 3).astype(np.float32))
    np.testing.assert_allclose(pool(x, "mean"), x.mean(0))
    np.testing.assert_allclose(pool(x, "max"), x.max(0))
    np.testing.assert_allclose(pool(x, "median"), np.median(np.asarray(x), 0))
    with pytest.raises(NotImplementedError):
        pool(x, "sum")


def test_crop_video_box():
    v = jnp.asarray(np.random.RandomState(0).rand(2, 4, 50, 60, 3))
    out = crop_video(v, (10, 5, 20, 30))
    assert out.shape == (2, 4, 20, 30, 3)
    np.testing.assert_allclose(out, np.asarray(v)[:, :, 10:30, 5:35, :])


def test_random_flip_shapes_and_determinism():
    v = jnp.asarray(np.random.RandomState(1).rand(4, 2, 8, 8, 3)
                    .astype(np.float32))
    a = random_flip(jax.random.PRNGKey(0), v)
    b = random_flip(jax.random.PRNGKey(0), v)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = random_flip(jax.random.PRNGKey(0), v, p_horizontal=0, p_vertical=0)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(v))
    d = random_flip(jax.random.PRNGKey(0), v, p_horizontal=1, p_vertical=0)
    np.testing.assert_array_equal(np.asarray(d), np.asarray(v)[:, :, :, ::-1])


def test_glove_roundtrip(tmp_path):
    p = tmp_path / "glove.txt"
    rng = np.random.RandomState(0)
    words = ["the", "cat", "sat", "on", "mat"]
    with open(p, "w") as f:
        for w in words:
            vec = rng.randn(16)
            f.write(w + " " + " ".join(f"{x:.5f}" for x in vec) + "\n")
    vocab, table = load_glove_txt(str(p))
    assert table.shape == (7, 16)  # pad + unk + 5 words
    assert vocab["the"] == 2 and vocab["<pad>"] == 0
    ids = tokenize_with_vocab(["the cat flew", ""], vocab, max_len=4)
    assert ids.shape == (2, 4)
    assert ids[0, 2] == vocab["<unk>"]  # 'flew' not in vocab
    assert ids[1].sum() == 0

    params = {"embedding": {"embedding": np.zeros((7, 16), np.float32)}}
    params = set_embedding_table(params, table)
    np.testing.assert_allclose(params["embedding"]["embedding"], table)


def test_preformer_audio_video_only():
    from mme_tpu.models.fusion import PreFormer, TAVSpec
    spec = TAVSpec(output_dim=7).tiny()
    rng = np.random.RandomState(0)
    B, T = 2, 400
    from mme_tpu.ops.video import balanced_keep_mask
    kw = dict(
        input_ids=None, text_mask=None,
        waveform=jnp.asarray(rng.randn(B, T).astype(np.float32)),
        audio_mask=jnp.ones((B, T), jnp.int32),
        video=jnp.asarray(rng.randn(B, spec.video.num_frames,
                                    spec.video.image_size,
                                    spec.video.image_size,
                                    3).astype(np.float32)),
        video_keep=balanced_keep_mask(jax.random.PRNGKey(0), B,
                                      spec.video.num_patches,
                                      spec.video_keep_k))
    pf = PreFormer(spec)
    params = pf.init(jax.random.PRNGKey(0), **kw)
    fused, type_ids, keep = pf.apply(params, **kw)
    ids = np.asarray(type_ids)
    assert (ids >= 1).all()  # no text type
    assert fused.shape[1] == keep.shape[1] == ids.shape[1]


def test_train_resume(tmp_path):
    """Warm-start restores the best checkpoint and its val loss."""
    import sys
    sys.path.insert(0, "tests")
    from test_train_loop import TinyMLP, _synthetic
    from mme_tpu.core.config import ExperimentConfig
    from mme_tpu.evals.metrics import Metrics
    from mme_tpu.train.loop import train_network
    from mme_tpu.train.losses import class_weights_from_counts
    from mme_tpu.train.policies import sample_weights_from_labels
    from mme_tpu.train.schedules import cosine_warm_restarts
    from mme_tpu.train.steps import (TrainState, make_eval_step,
                                     make_optimizer, make_train_step)

    cfg = ExperimentConfig(epoch=1, batch_size=16, learning_rate=5e-3,
                           log_val=5, output_dim=3, patience=50,
                           checkpoint_dir=str(tmp_path / "ck"))
    train_ds, val_ds = _synthetic(seed=0), _synthetic(n=48, seed=1)
    model = TinyMLP()
    params = model.init(jax.random.PRNGKey(0),
                        {"x": jnp.zeros((1, 8), jnp.float32)})["params"]

    def apply_fn(variables, batch, deterministic=True, rngs=None,
                 mutable=None):
        return model.apply(variables, batch, deterministic=deterministic,
                           rngs=rngs)

    tx = make_optimizer(cosine_warm_restarts(5e-3, 2, 15), 1e-4, 1.0)
    train_step = make_train_step(apply_fn, tx, num_classes=3)
    eval_step = make_eval_step(apply_fn, num_classes=3)
    cw = class_weights_from_counts(np.bincount(train_ds.labels, minlength=3))
    sw = sample_weights_from_labels(train_ds.labels, cw)

    m = Metrics(3, {i: str(i) for i in range(3)})
    s1 = train_network(train_step, eval_step, TrainState.create(params, tx),
                       train_ds, val_ds, cfg, m, cw, sw,
                       jax.random.PRNGKey(0))
    step_after_first = int(s1.step)

    # second run resumes from the saved best rather than step 0
    s2 = train_network(train_step, eval_step, TrainState.create(params, tx),
                       train_ds, val_ds, cfg, m, cw, sw,
                       jax.random.PRNGKey(0), resume=True)
    assert int(s2.step) >= step_after_first
