"""Video classifier entry point (reference ``SingleModels/visual_nn.py``):
``-m ResNet`` → slow_r50-style 3-D ResNet with proj→768 head; anything else →
the scratch Conv3D classifier (``SingleModels/models/visual.py``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mme_tpu.core.config import arg_parse, config_from_args
from mme_tpu.cli.common import run_classifier
from mme_tpu.data.dataset import ArrayDataset
from mme_tpu.models.video import Conv3DClassifier, SlowR50


def _synthetic_video(n, frames, size, num_classes, seed):
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, num_classes, n)
    video = rng.rand(n, frames, size, size, 3).astype(np.float32)
    video += (labels / num_classes)[:, None, None, None, None]
    return ArrayDataset({"video": video}, labels.astype(np.int64))


def main(argv=None):
    args = arg_parse("visual_nn", argv)
    cfg = config_from_args(args)
    np.random.seed(cfg.seed)

    frames, size = (8, 64) if cfg.dataset == "synthetic" else (8, 224)
    if cfg.model.lower() == "resnet":
        stages = (1, 1, 1, 1) if cfg.dataset == "synthetic" else (3, 4, 6, 3)
        model = SlowR50(output_dim=cfg.output_dim, stage_sizes=stages)
        has_bn = True
    else:
        model = Conv3DClassifier(output_dim=cfg.output_dim)
        has_bn = False

    def apply_fn(variables, batch, deterministic=True, rngs=None,
                 mutable=None):
        if has_bn:
            kw = {"mutable": mutable} if mutable else {}
            return model.apply(variables, batch["video"],
                               train=not deterministic, rngs=rngs, **kw)
        return model.apply(variables, batch["video"],
                           deterministic=deterministic, rngs=rngs)

    n_train = 64 if cfg.dataset == "synthetic" else 9989
    mk = lambda n, s: _synthetic_video(n, frames, size, cfg.output_dim, s)
    train_ds, val_ds, test_ds = mk(n_train, 0), mk(16, 1), mk(16, 2)

    example = jnp.asarray(train_ds.features["video"][:1])
    if has_bn:
        variables = model.init(jax.random.PRNGKey(cfg.seed), example,
                               train=False)
        params, batch_stats = variables["params"], variables["batch_stats"]
    else:
        params = model.init(jax.random.PRNGKey(cfg.seed), example)["params"]
        batch_stats = None
    return run_classifier(cfg, apply_fn, params, train_ds, val_ds, test_ds,
                          batch_stats=batch_stats)


if __name__ == "__main__":
    main()
