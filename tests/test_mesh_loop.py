"""Multi-device training through the LOOP (not just one step).

Round-1 gap: the sharded step was proven in tests but train_network never
built or accepted a mesh, so a multi-chip machine would still train on one
device. Now the loop takes a mesh, shards batches via
parallel/data.py::global_batches, and re-shards state after checkpoint
reloads — and the full loop must match the single-device run.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from mme_tpu.core.config import ExperimentConfig
from mme_tpu.data.dataset import ArrayDataset
from mme_tpu.evals.metrics import Metrics
from mme_tpu.parallel.mesh import make_mesh
from mme_tpu.train.loop import evaluate, train_network
from mme_tpu.train.losses import class_weights_from_counts
from mme_tpu.train.policies import sample_weights_from_labels
from mme_tpu.train.steps import (TrainState, make_eval_step, make_optimizer,
                                 make_train_step)


class TinyMLP(nn.Module):
    classes: int = 3

    @nn.compact
    def __call__(self, batch, *, deterministic=True):
        x = nn.Dense(32)(batch["x"])
        x = nn.relu(x)
        return nn.Dense(self.classes)(x)


_CENTERS = np.random.RandomState(7).randn(3, 8) * 3


def _ds(n, seed):
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, 3, n)
    x = (_CENTERS[labels] + rng.randn(n, 8)).astype(np.float32)
    return ArrayDataset({"x": x}, labels.astype(np.int64))


def _run(tmp_path, mesh, tag):
    cfg = ExperimentConfig(epoch=2, batch_size=16, learning_rate=5e-3,
                           epoch_switch=2, patience=50, T_max=2, log_val=100,
                           output_dim=3,
                           checkpoint_dir=str(tmp_path / f"ck_{tag}"))
    train_ds, val_ds, test_ds = _ds(128, 0), _ds(32, 1), _ds(32, 2)
    model = TinyMLP()
    params = model.init(jax.random.PRNGKey(0),
                        {"x": jnp.zeros((1, 8), jnp.float32)})["params"]

    def apply_fn(variables, batch, deterministic=True, rngs=None,
                 mutable=None):
        return model.apply(variables, batch, deterministic=deterministic)

    tx = make_optimizer(lambda s: cfg.learning_rate, cfg.weight_decay,
                        cfg.clip)
    state = TrainState.create(params, tx)
    train_step = make_train_step(apply_fn, tx, num_classes=3, donate=False)
    eval_step = make_eval_step(apply_fn, num_classes=3)
    counts = np.bincount(train_ds.labels, minlength=3)
    cw = class_weights_from_counts(counts)
    sw = sample_weights_from_labels(train_ds.labels, cw)
    metric = Metrics(3, {i: str(i) for i in range(3)})
    state = train_network(train_step, eval_step, state, train_ds, val_ds,
                          cfg, metric, cw, sw, jax.random.PRNGKey(0),
                          mesh=mesh)
    summary = evaluate(eval_step, state, test_ds, cfg, metric, mesh=mesh)
    return state, summary


@pytest.mark.parametrize("shape", [(8, 1), (4, 2)])
def test_mesh_loop_matches_single_device(tmp_path, shape):
    dp, mp = shape
    if len(jax.devices()) < dp * mp:
        pytest.skip("needs the virtual 8-device CPU mesh")
    s_ref, sum_ref = _run(tmp_path, None, "single")
    mesh = make_mesh(dp, mp, devices=jax.devices()[:dp * mp])
    s_mesh, sum_mesh = _run(tmp_path, mesh, f"mesh{dp}x{mp}")
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
        s_ref.params, s_mesh.params)
    assert abs(sum_ref["test/loss"] - sum_mesh["test/loss"]) < 1e-3
    np.testing.assert_array_equal(
        np.asarray(sum_ref["test/confusion_matrix"]),
        np.asarray(sum_mesh["test/confusion_matrix"]))
