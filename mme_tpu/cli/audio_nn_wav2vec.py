"""Audio classifier entry point (reference ``SingleModels/audio_nn.py``; the
README calls it ``audio_nn_wav2vec.py``): wav2vec2 on raw waveforms →
mean-pool → classifier."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mme_tpu.core.config import arg_parse, config_from_args
from mme_tpu.cli.common import run_classifier
from mme_tpu.data.synthetic import synthetic_audio_dataset
from mme_tpu.models.audio import Wav2Vec2Classifier, Wav2Vec2Spec


def main(argv=None):
    args = arg_parse("audio_nn_wav2vec", argv)
    cfg = config_from_args(args)
    np.random.seed(cfg.seed)

    spec = Wav2Vec2Spec.base()
    audio_len = cfg.audio_max_samples
    import os as _os
    if cfg.dataset == "synthetic" or _os.environ.get("MME_TINY"):
        spec = dataclasses.replace(
            spec, conv_dims=(32, 32, 32), conv_kernels=(10, 3, 3),
            conv_strides=(5, 2, 2),
            encoder=dataclasses.replace(spec.encoder, hidden=64, heads=4,
                                        layers=2, intermediate=128))
        audio_len = 4000
    model = Wav2Vec2Classifier(spec, output_dim=cfg.output_dim,
                               dropout=cfg.dropout)

    def apply_fn(variables, batch, deterministic=True, rngs=None,
                 mutable=None):
        return model.apply(variables, batch["waveform"], batch["audio_mask"],
                           deterministic=deterministic, rngs=rngs)

    from mme_tpu.cli.common import resolve_pickle
    pkl = resolve_pickle(cfg.dataset)
    if pkl is not None:
        # reference pickle path: wav paths decoded by the native loader,
        # audio_shape filter as in SingleModels/audio_nn.py:115
        import pandas as pd
        from mme_tpu.data.records import (PickleDatasetConfig, apply_filters,
                                          build_audio_dataset,
                                          build_label_map, split_dataframe)
        df = pd.read_pickle(pkl)
        rcfg = PickleDatasetConfig(label_col=cfg.label_task,
                                   audio_max_samples=audio_len,
                                   min_audio_shape=10000, seed=cfg.seed)
        df = apply_filters(df, rcfg)
        # label ids factorize over the FULL (post-filter) frame so a class
        # missing from one split cannot shift val/test ids
        rcfg.label_map = build_label_map(df, rcfg.label_col)
        from mme_tpu.cli.common import invert_label_map
        id2label = invert_label_map(rcfg.label_map)
        tr, va, te = split_dataframe(df, rcfg)
        train_ds, val_ds, test_ds = (build_audio_dataset(x, rcfg)
                                     for x in (tr, va, te))
    else:
        id2label = None
        mk = lambda n, s: synthetic_audio_dataset(
            n, audio_len=audio_len, num_classes=cfg.output_dim, seed=s)
        train_ds, val_ds, test_ds = mk(128, 0), mk(32, 1), mk(32, 2)

    example = {k: jnp.asarray(v[:1]) for k, v in train_ds.features.items()}
    params = model.init(
        jax.random.PRNGKey(cfg.seed), example["waveform"],
        example["audio_mask"])["params"]
    from mme_tpu.models.pretrained import (AUDIO_SUPERB,
                                           load_audio_classifier,
                                           pretrained_root)
    root = pretrained_root()
    if root and spec.conv_dims == (512,) * 7:  # full-size tower only
        params, ok = load_audio_classifier(params, spec, root)
        if ok:
            print(f"loaded pretrained audio tower from {root} "
                  f"({AUDIO_SUPERB})", flush=True)

    # length bucketing: one compiled step per bound instead of padding every
    # utterance to the audio cap (shared helper — MME_BUCKETS="a,b,c"
    # overrides; "off" disables). The reference pads per batch dynamically
    # (models/tav.py:228) — on TPU that would recompile every batch.
    from mme_tpu.cli.common import make_bucket_iter
    batch_iter = make_bucket_iter(audio_len)
    return run_classifier(cfg, apply_fn, params, train_ds, val_ds, test_ds,
                          rng_names=("dropout", "spec_augment"),
                          batch_iter=batch_iter, id2label=id2label)


if __name__ == "__main__":
    main()
