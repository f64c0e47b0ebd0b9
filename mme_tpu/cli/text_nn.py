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


def _load_datasets(cfg, vocab_size, tokenizer=None):
    """Reference pickle when the path exists (utils/data_loaders.py:256-273
    BertDataset contract); synthetic otherwise. Returns (train, val, test,
    id2label) — id2label is the pickle's actual alphabetical-factorization
    name map (None for synthetic/int labels)."""
    from mme_tpu.cli.common import resolve_pickle
    pkl = resolve_pickle(cfg.dataset)
    if pkl is not None:
        import pandas as pd
        from mme_tpu.data.records import (PickleDatasetConfig,
                                          build_label_map, get_tokenizer,
                                          build_text_dataset,
                                          split_dataframe)
        df = pd.read_pickle(pkl)
        rcfg = PickleDatasetConfig(label_col=cfg.label_task,
                                   text_max_len=cfg.text_max_len,
                                   seed=cfg.seed)
        rcfg.label_map = build_label_map(df, rcfg.label_col)
        from mme_tpu.cli.common import invert_label_map
        id2label = invert_label_map(rcfg.label_map)
        # hash tokenizer must match the model's (possibly reduced) vocab
        tok = tokenizer or get_tokenizer(
            None if vocab_size != 50265 else
            "j-hartmann/emotion-english-distilroberta-base",
            vocab_size)
        tr, va, te = split_dataframe(df, rcfg)
        return (build_text_dataset(tr, rcfg, tok),
                build_text_dataset(va, rcfg, tok),
                build_text_dataset(te, rcfg, tok), id2label)
    n_train = 256
    mk = lambda n, s: synthetic_text_dataset(
        vocab_size, n, text_len=cfg.text_max_len,
        num_classes=cfg.output_dim, seed=s)
    return mk(n_train, 0), mk(max(n_train // 8, 32), 1), \
        mk(max(n_train // 8, 32), 2), None


def main(argv=None):
    args = arg_parse("text_nn", argv)
    cfg = config_from_args(args)
    np.random.seed(cfg.seed)

    glove_table, glove_tokenizer = None, None
    if cfg.model.lower() == "lstm":
        vocab, embed_dim = 5000, 300
        import os as _os
        glove_path = _os.environ.get("MME_GLOVE")
        if glove_path and _os.path.exists(glove_path):
            # pretrained GloVe vectors into the LSTM embedding (reference
            # SingleModels/models/text.py:22 via torchtext)
            from mme_tpu.data.glove import load_glove_txt, tokenize_with_vocab
            max_words = int(_os.environ.get("MME_GLOVE_MAX", "50000"))
            gvocab, glove_table = load_glove_txt(glove_path, max_words)
            vocab, embed_dim = glove_table.shape

            def glove_tokenizer(text, max_length=70):
                ids = tokenize_with_vocab([text], gvocab, max_length)[0]
                return ids.tolist(), (ids != 0).astype(int).tolist()
        model = LSTMClassifier(vocab_size=vocab, embed_dim=embed_dim,
                               num_layers=cfg.lstm_layers,
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
        import os as _os
        if cfg.dataset == "synthetic" or _os.environ.get("MME_TINY"):
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

    train_ds, val_ds, test_ds, id2label = _load_datasets(
        cfg, spec_vocab, tokenizer=glove_tokenizer)

    example = {k: jnp.asarray(v[:1]) for k, v in train_ds.features.items()}
    if cfg.model.lower() == "lstm":
        params = model.init(jax.random.PRNGKey(cfg.seed),
                            example["input_ids"])["params"]
        if glove_table is not None:
            from mme_tpu.data.glove import set_embedding_table
            params = set_embedding_table(params, glove_table)
            print(f"loaded GloVe vectors {glove_table.shape} into "
                  "LSTM embedding", flush=True)
    else:
        params = model.init(jax.random.PRNGKey(cfg.seed),
                            example["input_ids"],
                            example["text_mask"])["params"]
        from mme_tpu.models.pretrained import (load_text_classifier,
                                               pretrained_root)
        root = pretrained_root()
        if root and spec.vocab_size == 50265:
            params, ok = load_text_classifier(params, spec, root)
            if ok:
                print("loaded pretrained text tower from "
                      f"{root} (j-hartmann/emotion-english-distilroberta-"
                      "base)", flush=True)
    return run_classifier(cfg, apply_fn, params, train_ds, val_ds, test_ds,
                          id2label=id2label)


if __name__ == "__main__":
    main()
