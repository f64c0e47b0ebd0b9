"""Video classifier entry point (reference ``SingleModels/visual_nn.py``):
``-m ResNet`` → slow_r50-style 3-D ResNet with proj→768 head; anything else →
the scratch Conv3D classifier (``SingleModels/models/visual.py``). Real
datasets come from the reference pickle contract (video paths decoded with
timings + IEMOCAP speaker crop, or keyframe dirs via MME_KEYFRAME_GLOB);
``--dataset synthetic`` keeps the smoke-scale path. slow_r50 backbone
weights load from MME_PRETRAINED when present (the reference's torch.hub
load, ``SingleModels/models/visual.py:152``)."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from mme_tpu.core.config import arg_parse, config_from_args
from mme_tpu.cli.common import resolve_pickle, run_classifier
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

    tiny = cfg.dataset == "synthetic" or bool(os.environ.get("MME_TINY"))
    frames, size = (8, 64) if tiny else (16, 224)
    stages = (1, 1, 1, 1) if tiny else (3, 4, 6, 3)
    if cfg.model.lower() == "resnet":
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

    pkl = resolve_pickle(cfg.dataset)
    if pkl is not None:
        import pandas as pd
        from mme_tpu.data.records import (PickleDatasetConfig,
                                          build_label_map,
                                          build_video_dataset,
                                          split_dataframe)
        df = pd.read_pickle(pkl)
        rcfg = PickleDatasetConfig(label_col=cfg.label_task, seed=cfg.seed)
        rcfg.label_map = build_label_map(df, rcfg.label_col)
        from mme_tpu.cli.common import invert_label_map
        id2label = invert_label_map(rcfg.label_map)
        kf = os.environ.get("MME_KEYFRAME_GLOB")
        train_ds, val_ds, test_ds = (
            build_video_dataset(x, rcfg, frames, size, keyframe_glob=kf)
            for x in split_dataframe(df, rcfg))
    else:
        id2label = None
        mk = lambda n, s: _synthetic_video(n, frames, size, cfg.output_dim, s)
        train_ds, val_ds, test_ds = mk(64, 0), mk(16, 1), mk(16, 2)

    example = jnp.asarray(train_ds.features["video"][:1])
    if has_bn:
        variables = model.init(jax.random.PRNGKey(cfg.seed), example,
                               train=False)
        params, batch_stats = variables["params"], variables["batch_stats"]
        from mme_tpu.models.pretrained import load_slow_r50, pretrained_root
        root = pretrained_root()
        if root:
            params, batch_stats, ok = load_slow_r50(params, batch_stats,
                                                    root, stages)
            if ok:
                print("loaded pretrained slow_r50 backbone", flush=True)
    else:
        params = model.init(jax.random.PRNGKey(cfg.seed), example)["params"]
        batch_stats = None
    return run_classifier(cfg, apply_fn, params, train_ds, val_ds, test_ds,
                          batch_stats=batch_stats, id2label=id2label)


if __name__ == "__main__":
    main()
