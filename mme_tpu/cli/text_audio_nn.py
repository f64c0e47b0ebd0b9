"""Text+Audio entry point (the reference ``DoubleModels/text_audio_nn.py``
CLI, whose model file was dead code — implemented as a working BERT ⊕
wav2vec2 late-fusion classifier)."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from mme_tpu.core.config import arg_parse, config_from_args
from mme_tpu.cli.common import run_classifier
from mme_tpu.data.dataset import ArrayDataset
from mme_tpu.models.text_audio import BertAudioClassifier, TextAudioSpec


def _synthetic_ta(spec, n, text_len, audio_len, num_classes, seed):
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, num_classes, n)
    ids = rng.randint(5, spec.text.vocab_size, size=(n, text_len))
    ids[:, 1:3] = labels[:, None] + 5
    t = np.arange(audio_len)[None, :]
    lengths = rng.randint(audio_len // 2, audio_len + 1, size=n)
    mask = (t < lengths[:, None]).astype(np.int32)
    wave = ((np.sin(2 * np.pi * 0.01 * (1 + labels[:, None]) * t)
             + 0.1 * rng.randn(n, audio_len)) * mask).astype(np.float32)
    return ArrayDataset({
        "input_ids": ids.astype(np.int32),
        "text_mask": np.ones((n, text_len), np.int32),
        "waveform": wave, "audio_mask": mask,
    }, labels.astype(np.int64))


def main(argv=None):
    args = arg_parse("text_audio_nn", argv)
    cfg = config_from_args(args)
    np.random.seed(cfg.seed)

    spec = TextAudioSpec(output_dim=cfg.output_dim, dropout=cfg.dropout)
    text_len, audio_len = cfg.text_max_len, cfg.audio_max_samples
    if cfg.dataset == "synthetic" or os.environ.get("MME_TINY"):
        spec = spec.tiny()
        text_len, audio_len = 12, 2000
    model = BertAudioClassifier(spec)

    def apply_fn(variables, batch, deterministic=True, rngs=None,
                 mutable=None):
        return model.apply(variables, batch["input_ids"],
                           batch["text_mask"], batch["waveform"],
                           batch["audio_mask"],
                           deterministic=deterministic, rngs=rngs)

    mk = lambda n, s: _synthetic_ta(spec, n, text_len, audio_len,
                                    cfg.output_dim, s)
    train_ds, val_ds, test_ds = mk(64, 0), mk(16, 1), mk(16, 2)

    ex = {k: jnp.asarray(v[:1]) for k, v in train_ds.features.items()}
    params = model.init(jax.random.PRNGKey(cfg.seed), ex["input_ids"],
                        ex["text_mask"], ex["waveform"],
                        ex["audio_mask"])["params"]
    return run_classifier(cfg, apply_fn, params, train_ds, val_ds, test_ds,
                          rng_names=("dropout", "spec_augment"))


if __name__ == "__main__":
    main()
