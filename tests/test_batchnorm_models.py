"""BatchNorm-model training path: tiny ResNet through the full loop
(batch_stats threading + frozen-backbone trainable mask)."""

import numpy as np

import jax
import jax.numpy as jnp

from mme_tpu.core.config import ExperimentConfig
from mme_tpu.data.synthetic import synthetic_image_dataset
from mme_tpu.evals.metrics import Metrics
from mme_tpu.models.image import ResNet50
from mme_tpu.train.loop import evaluate, train_network
from mme_tpu.train.losses import class_weights_from_counts
from mme_tpu.train.policies import sample_weights_from_labels
from mme_tpu.train.schedules import cosine_warm_restarts
from mme_tpu.train.steps import (TrainState, make_eval_step, make_optimizer,
                                 make_train_step)


def test_resnet_loop_with_batch_stats(tmp_path):
    cfg = ExperimentConfig(epoch=2, batch_size=16, learning_rate=1e-2,
                           log_val=4, output_dim=2, patience=50,
                           checkpoint_dir=str(tmp_path / "ck"))
    model = ResNet50(num_classes=2, stage_sizes=(1, 1, 1, 1))

    def apply_fn(variables, batch, deterministic=True, rngs=None,
                 mutable=None):
        kw = {"mutable": mutable} if mutable else {}
        out = model.apply(variables, batch["image"],
                          train=not deterministic, **kw)
        if mutable:
            (logits, _pooled), mutated = out
            return logits, mutated
        logits, _pooled = out
        return logits

    train_ds = synthetic_image_dataset(96, size=16, num_classes=2, seed=0)
    val_ds = synthetic_image_dataset(32, size=16, num_classes=2, seed=1)
    test_ds = synthetic_image_dataset(32, size=16, num_classes=2, seed=2)

    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 16, 16, 3)), train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]

    tx = make_optimizer(cosine_warm_restarts(cfg.learning_rate, 2, 6),
                        cfg.weight_decay, cfg.clip)
    state = TrainState.create(params, tx, batch_stats=batch_stats)
    train_step = make_train_step(apply_fn, tx, num_classes=2,
                                 has_batch_stats=True)
    eval_step = make_eval_step(apply_fn, num_classes=2,
                               has_batch_stats=True)

    cw = class_weights_from_counts(np.bincount(train_ds.labels, minlength=2))
    sw = sample_weights_from_labels(train_ds.labels, cw)
    metric = Metrics(2, {0: "a", 1: "b"})
    # the train step donates the state → snapshot stats to host first
    stats_before = jax.device_get(state.batch_stats)
    state2 = train_network(train_step, eval_step, state, train_ds, val_ds,
                           cfg, metric, cw, sw, jax.random.PRNGKey(0))
    # batch_stats actually updated during training
    diff = jax.tree_util.tree_reduce(
        lambda acc, xy: acc + float(jnp.abs(xy).sum()),
        jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b), stats_before,
                     jax.device_get(state2.batch_stats)), 0.0)
    assert diff > 0.0
    summary = evaluate(eval_step, state2, test_ds, cfg, metric)
    assert summary["test/acc"] >= 0.5
