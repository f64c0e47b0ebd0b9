"""Length-bucketed batching wired into the train loop (audio path).

Round-1 gap: bucketed_batches existed but nothing used it — every real run
padded to the 160k-sample cap. Now BucketedBatchIter plugs into
train_network/evaluate and the audio CLI builds it by default.
"""

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from mme_tpu.core.config import ExperimentConfig
from mme_tpu.data.dataset import ArrayDataset, BucketedBatchIter
from mme_tpu.evals.metrics import Metrics
from mme_tpu.train.loop import evaluate, train_network
from mme_tpu.train.steps import TrainState, make_eval_step, make_optimizer, \
    make_train_step


def _audio_ds(n, max_len=64, seed=0):
    rng = np.random.RandomState(seed)
    lengths = rng.randint(8, max_len + 1, n)
    wave = rng.randn(n, max_len).astype(np.float32)
    mask = (np.arange(max_len)[None, :] < lengths[:, None]).astype(np.int32)
    wave = wave * mask
    labels = (lengths > max_len // 2).astype(np.int64)  # learnable signal
    return ArrayDataset({"waveform": wave, "audio_mask": mask}, labels)


def test_bucketed_epoch_visits_every_sample_once_with_correct_masks():
    ds = _audio_ds(37, max_len=64)
    it = BucketedBatchIter((16, 32, 64))
    order = np.arange(len(ds))
    seen = []
    n_batches = 0
    for batch, labels, mask, idx in it(ds, order, batch_size=4):
        n_batches += 1
        real = np.asarray(mask).astype(bool)
        seen += list(np.asarray(idx)[real])
        w, m = batch["waveform"], batch["audio_mask"]
        assert w.shape == m.shape and w.shape[1] in (16, 32, 64)
        # every real row's true length fits the bucket, mask is intact
        true_len = np.asarray(ds.features["audio_mask"])[idx].sum(1)
        assert (true_len[real] <= w.shape[1]).all()
        np.testing.assert_array_equal(
            m.sum(1)[real], true_len[real])
        # sliced waveform content matches the source rows
        np.testing.assert_array_equal(
            w, np.asarray(ds.features["waveform"])[idx][:, :w.shape[1]])
    assert sorted(seen) == list(range(37))  # each sample exactly once
    assert n_batches == it.epoch_len(ds, order, 4)


def test_loop_trains_with_bucketed_iter(tmp_path):
    class M(nn.Module):
        @nn.compact
        def __call__(self, batch, *, deterministic=True):
            m = batch["audio_mask"].astype(jnp.float32)
            # masked mean + normalized true length: the label is a pure
            # function of the mask, so correctness of bucket slicing is
            # exactly what decides accuracy here
            mean = (batch["waveform"] * m).sum(1, keepdims=True) \
                / jnp.maximum(m.sum(1, keepdims=True), 1.0)
            feats = jnp.concatenate(
                [mean, m.sum(1, keepdims=True) / 64.0], axis=1)
            return nn.Dense(2)(feats)

    model = M()
    train_ds, val_ds, test_ds = (_audio_ds(64, seed=0), _audio_ds(16, seed=1),
                                 _audio_ds(16, seed=2))
    cfg = ExperimentConfig(epoch=6, batch_size=8, learning_rate=2e-1,
                           output_dim=2, log_val=100, patience=50,
                           checkpoint_dir=str(tmp_path / "ck"))
    params = model.init(jax.random.PRNGKey(0),
                        {k: jnp.asarray(v[:1])
                         for k, v in train_ds.features.items()})["params"]

    def apply_fn(variables, batch, deterministic=True, rngs=None,
                 mutable=None):
        return model.apply(variables, batch, deterministic=deterministic)

    tx = make_optimizer(lambda s: cfg.learning_rate, 0.0, 1.0)
    state = TrainState.create(params, tx)
    train_step = make_train_step(apply_fn, tx, num_classes=2)
    eval_step = make_eval_step(apply_fn, num_classes=2)
    metric = Metrics(2, {0: "short", 1: "long"})
    it = BucketedBatchIter((16, 32, 64))
    state = train_network(train_step, eval_step, state, train_ds, val_ds,
                          cfg, metric, np.ones(2, np.float32),
                          np.ones(64, np.float32), jax.random.PRNGKey(0),
                          batch_iter=it)
    summary = evaluate(eval_step, state, test_ds, cfg, metric, batch_iter=it)
    # the mask-length signal is trivially learnable → bucketing kept masks
    # correct end-to-end
    assert summary["test/acc"] > 0.8, summary


def test_bucketed_training_composes_with_dp_mesh(tmp_path):
    """Round-2 gap: bucketing and the mesh were mutually exclusive
    (train/loop.py asserted; the CLI silently dropped the mesh, so a
    multi-device audio run paid the full-length pad). Now bucketed batches
    dp-shard (parallel/data.py::shard_batches): the mesh run must match
    the single-device bucketed run exactly — same samples visited, same
    final numerics, same test accuracy."""
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device CPU mesh")
    from mme_tpu.parallel.mesh import make_mesh

    class M(nn.Module):
        @nn.compact
        def __call__(self, batch, *, deterministic=True):
            m = batch["audio_mask"].astype(jnp.float32)
            mean = (batch["waveform"] * m).sum(1, keepdims=True) \
                / jnp.maximum(m.sum(1, keepdims=True), 1.0)
            feats = jnp.concatenate(
                [mean, m.sum(1, keepdims=True) / 64.0], axis=1)
            return nn.Dense(2)(feats)

    model = M()
    train_ds, val_ds, test_ds = (_audio_ds(64, seed=0),
                                 _audio_ds(16, seed=1),
                                 _audio_ds(16, seed=2))
    params = model.init(jax.random.PRNGKey(0),
                        {k: jnp.asarray(v[:1])
                         for k, v in train_ds.features.items()})["params"]

    def apply_fn(variables, batch, deterministic=True, rngs=None,
                 mutable=None):
        return model.apply(variables, batch, deterministic=deterministic)

    def run(mesh, tag):
        cfg = ExperimentConfig(epoch=4, batch_size=8, learning_rate=2e-1,
                               output_dim=2, log_val=100, patience=50,
                               checkpoint_dir=str(tmp_path / f"ck_{tag}"))
        tx = make_optimizer(lambda s: cfg.learning_rate, 0.0, 1.0)
        # fresh buffers per run: the donating train step deletes its inputs
        state = TrainState.create(
            jax.tree.map(lambda x: jnp.array(np.asarray(x)), params), tx)
        train_step = make_train_step(apply_fn, tx, num_classes=2)
        eval_step = make_eval_step(apply_fn, num_classes=2)
        metric = Metrics(2, {0: "short", 1: "long"})
        it = BucketedBatchIter((16, 32, 64))
        state = train_network(train_step, eval_step, state, train_ds,
                              val_ds, cfg, metric, np.ones(2, np.float32),
                              np.ones(64, np.float32), jax.random.PRNGKey(0),
                              batch_iter=it, mesh=mesh)
        summary = evaluate(eval_step, state, test_ds, cfg, metric,
                           batch_iter=it, mesh=mesh)
        return state, summary

    mesh = make_mesh(8, 1, devices=jax.devices()[:8])
    s_mesh, sum_mesh = run(mesh, "dp8")
    s_one, sum_one = run(None, "dp1")
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        s_mesh.params, s_one.params)
    assert sum_mesh["test/acc"] == sum_one["test/acc"] > 0.8
    np.testing.assert_array_equal(
        np.asarray(sum_mesh["test/confusion_matrix"]),
        np.asarray(sum_one["test/confusion_matrix"]))


def test_bucket_tail_promotion():
    """Round 5: every bucket's sub-batch remainder rides up into the next
    bucket — only the LARGEST bound ever yields a padded tail batch, and
    promoted rows run at a larger (valid) bound with intact masks."""
    ds = _audio_ds(37, max_len=64)        # lengths uniform over [8, 64]
    it = BucketedBatchIter((16, 32, 64))
    order = np.arange(len(ds))
    padded_tails = []
    for batch, labels, mask, idx in it(ds, order, batch_size=4):
        if np.asarray(mask).sum() < 4:
            padded_tails.append(batch["waveform"].shape[1])
        # every real row's true length fits its (possibly promoted) bound
        real = np.asarray(mask).astype(bool)
        true_len = np.asarray(ds.features["audio_mask"])[idx].sum(1)
        assert (true_len[real] <= batch["waveform"].shape[1]).all()
    # padded tails only at the largest bound (at most one)
    assert padded_tails in ([], [64])


def test_epoch_len_matches_yield_count_under_promotion():
    """epoch_len's carry arithmetic must mirror bucketed_batches' tail
    promotion exactly, for any length distribution — the train loop's
    end-of-epoch bookkeeping (mid-epoch val/save points) depends on it.
    Sweeps sizes that exercise every carry edge: all-in-one-bucket,
    sub-batch totals, empty last bucket, exact multiples."""
    for seed, n, bs in [(0, 37, 4), (1, 3, 8), (2, 64, 8), (3, 11, 5),
                        (4, 1, 4), (5, 40, 8)]:
        ds = _audio_ds(n, max_len=64, seed=seed)
        it = BucketedBatchIter((16, 32, 64))
        order = np.arange(n)
        got = sum(1 for _ in it(ds, order, bs))
        want = it.epoch_len(ds, order, bs)
        assert got == want, (seed, n, bs, got, want)
        # every sample appears exactly once among real (mask=1) rows
        real_idx = np.concatenate([
            np.asarray(idx)[np.asarray(m).astype(bool)]
            for _, _, m, idx in it(ds, order, bs)])
        np.testing.assert_array_equal(np.sort(real_idx), order)
