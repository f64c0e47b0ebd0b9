"""Text+Video entry point (reference ``DoubleModels/text_video_nn.py``):
``-m 1MTL`` → shared-layer multi-task model with stochastic task routing
(p=[.6,.4], ``DoubleModels/train_model/text_video_train.py:30``);
``-m LateFusion`` → BERT ⊕ VideoMAE late fusion."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mme_tpu.core.config import arg_parse, config_from_args
from mme_tpu.cli.common import run_classifier
from mme_tpu.data.dataset import ArrayDataset
from mme_tpu.models.text_video import (BertVideoMAELateFusion,
                                       BertVideoMAEMTLShared, TextVideoSpec)

TASK_PROBS = (0.6, 0.4)


def _synthetic_tv(spec, n, text_len, num_classes, seed):
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, num_classes, n)
    ids = rng.randint(5, spec.text.vocab_size, size=(n, text_len))
    ids[:, 1:3] = labels[:, None] + 5
    F, S = spec.video.num_frames, spec.video.image_size
    video = rng.rand(n, F, S, S, 3).astype(np.float32)
    video += (labels / num_classes)[:, None, None, None, None]
    return ArrayDataset({
        "input_ids": ids.astype(np.int32),
        "text_mask": np.ones((n, text_len), np.int32),
        "video": video,
    }, labels.astype(np.int64))


def make_task_transform(rng_seed: int = 0):
    """Per-step Bernoulli task routing for the MTL model."""
    def transform(rng, batch):
        b = dict(batch)
        b["task_id"] = (jax.random.uniform(rng, ()) > TASK_PROBS[0]
                        ).astype(jnp.int32)
        return b
    return transform


def main(argv=None):
    args = arg_parse("text_video_nn", argv)
    cfg = config_from_args(args)
    np.random.seed(cfg.seed)

    spec = TextVideoSpec(output_dim=cfg.output_dim, dropout=cfg.dropout)
    text_len = cfg.text_max_len
    if cfg.dataset == "synthetic":
        spec = spec.tiny()
        text_len = 12

    mtl = cfg.model == "1MTL"
    model_cls = BertVideoMAEMTLShared if mtl else BertVideoMAELateFusion
    model = model_cls(spec)

    def apply_fn(variables, batch, deterministic=True, rngs=None,
                 mutable=None):
        task = batch.get("task_id", jnp.asarray(0))
        return model.apply(variables, batch["input_ids"],
                           batch["text_mask"], batch["video"], task,
                           deterministic=deterministic, rngs=rngs)

    n_train = 64 if cfg.dataset == "synthetic" else 9989
    mk = lambda n, s: _synthetic_tv(spec, n, text_len, cfg.output_dim, s)
    train_ds, val_ds, test_ds = mk(n_train, 0), mk(16, 1), mk(16, 2)

    ex = {k: jnp.asarray(v[:1]) for k, v in train_ds.features.items()}
    params = model.init(jax.random.PRNGKey(cfg.seed), ex["input_ids"],
                        ex["text_mask"], ex["video"],
                        jnp.asarray(0))["params"]
    kwargs = {}
    if mtl:
        kwargs["batch_transform"] = make_task_transform()
    return run_classifier(cfg, apply_fn, params, train_ds, val_ds, test_ds,
                          **kwargs)


if __name__ == "__main__":
    main()
