"""Text classifier entry point (reference ``SingleModels/text_nn.py``).

``-m Bert`` → DistilRoBERTa-architecture classifier; ``-m LSTM`` → the
GloVe-LSTM capability. ``--dataset synthetic`` trains on generated MELD-shaped
records (real pickles need the media toolchain; see data/records.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mme_tpu.core.config import arg_parse, config_from_args
from mme_tpu.cli.common import run_classifier
from mme_tpu.data.synthetic import synthetic_text_dataset
from mme_tpu.models.layers import EncoderSpec
from mme_tpu.models.text import BertClassifier, LSTMClassifier, TextEncoderSpec


def main(argv=None):
    args = arg_parse("text_nn", argv)
    cfg = config_from_args(args)
    np.random.seed(cfg.seed)

    if cfg.model.lower() == "lstm":
        vocab = 5000
        model = LSTMClassifier(vocab_size=vocab, num_layers=cfg.lstm_layers,
                               output_dim=cfg.output_dim)
        spec_vocab = vocab

        def apply_fn(variables, batch, deterministic=True, rngs=None,
                     mutable=None):
            return model.apply(variables, batch["input_ids"],
                               deterministic=deterministic, rngs=rngs)
    else:
        # tiny-ified when running synthetic smoke; full distilroberta shape
        # otherwise
        spec = TextEncoderSpec.distilroberta()
        if cfg.dataset == "synthetic":
            spec = dataclasses.replace(
                spec, vocab_size=512,
                encoder=dataclasses.replace(spec.encoder, hidden=64, heads=4,
                                            layers=2, intermediate=128))
        spec_vocab = spec.vocab_size
        model = BertClassifier(spec, output_dim=cfg.output_dim,
                               dropout=cfg.dropout)

        def apply_fn(variables, batch, deterministic=True, rngs=None,
                     mutable=None):
            return model.apply(variables, batch["input_ids"],
                               batch["text_mask"],
                               deterministic=deterministic, rngs=rngs)

    n_train = 256 if cfg.dataset == "synthetic" else 9989
    train_ds = synthetic_text_dataset(spec_vocab, n_train,
                                      text_len=cfg.text_max_len,
                                      num_classes=cfg.output_dim, seed=0)
    val_ds = synthetic_text_dataset(spec_vocab, max(n_train // 8, 32),
                                    text_len=cfg.text_max_len,
                                    num_classes=cfg.output_dim, seed=1)
    test_ds = synthetic_text_dataset(spec_vocab, max(n_train // 8, 32),
                                     text_len=cfg.text_max_len,
                                     num_classes=cfg.output_dim, seed=2)

    example = {k: jnp.asarray(v[:1]) for k, v in train_ds.features.items()}
    if cfg.model.lower() == "lstm":
        params = model.init(jax.random.PRNGKey(cfg.seed),
                            example["input_ids"])["params"]
    else:
        params = model.init(jax.random.PRNGKey(cfg.seed),
                            example["input_ids"],
                            example["text_mask"])["params"]
    return run_classifier(cfg, apply_fn, params, train_ds, val_ds, test_ds)


if __name__ == "__main__":
    main()
