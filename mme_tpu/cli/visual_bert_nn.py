"""VisualBERT entry point (reference ``DoubleModels/visual_bert_nn.py``):
Hateful-Memes text+image classification through the VisualBertForPreTraining
MLM logits head. Visual features are ResNet-50 fc→1024 vectors — precomputed
into the records (the reference recomputed them inside collate every batch,
``DoubleModels/models/visualBert.py:51-56``)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mme_tpu.core.config import arg_parse, config_from_args
from mme_tpu.cli.common import run_classifier
from mme_tpu.data.dataset import ArrayDataset
from mme_tpu.models.visualbert import VBertClassifier, VisualBertSpec


def _synthetic_vbert(n, text_len, vdim, vocab, num_classes, seed):
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, num_classes, n)
    ids = rng.randint(5, vocab, size=(n, text_len))
    ids[:, 1:3] = labels[:, None] + 5
    feats = rng.randn(n, 1, vdim).astype(np.float32)
    feats += labels[:, None, None]
    return ArrayDataset({
        "input_ids": ids.astype(np.int32),
        "text_mask": np.ones((n, text_len), np.int32),
        "token_type_ids": np.zeros((n, text_len), np.int32),
        "visual_embeds": feats,
    }, labels.astype(np.int64))


def main(argv=None):
    args = arg_parse("visual_bert_nn", argv)
    cfg = config_from_args(args)
    if cfg.output_dim == 7:
        cfg = cfg.replace(output_dim=2)  # Hateful Memes is binary
    np.random.seed(cfg.seed)

    spec = VisualBertSpec()
    text_len = cfg.text_max_len
    if cfg.dataset == "synthetic":
        spec = dataclasses.replace(
            spec, vocab_size=128, visual_embedding_dim=16,
            encoder=dataclasses.replace(spec.encoder, hidden=32, heads=4,
                                        layers=2, intermediate=64))
        text_len = 12
    model = VBertClassifier(spec, output_dim=cfg.output_dim,
                            dropout=cfg.dropout)

    def apply_fn(variables, batch, deterministic=True, rngs=None,
                 mutable=None):
        return model.apply(
            variables, batch["input_ids"],
            attention_mask=batch["text_mask"],
            token_type_ids=batch["token_type_ids"],
            visual_embeds=batch["visual_embeds"],
            deterministic=deterministic, rngs=rngs)

    n_train = 64 if cfg.dataset == "synthetic" else 6750
    mk = lambda n, s: _synthetic_vbert(n, text_len,
                                       spec.visual_embedding_dim,
                                       spec.vocab_size, cfg.output_dim, s)
    train_ds, val_ds, test_ds = mk(n_train, 0), mk(16, 1), mk(16, 2)

    ex = {k: jnp.asarray(v[:1]) for k, v in train_ds.features.items()}
    params = model.init(
        jax.random.PRNGKey(cfg.seed), ex["input_ids"],
        attention_mask=ex["text_mask"], token_type_ids=ex["token_type_ids"],
        visual_embeds=ex["visual_embeds"])["params"]
    return run_classifier(cfg, apply_fn, params, train_ds, val_ds, test_ds)


if __name__ == "__main__":
    main()
