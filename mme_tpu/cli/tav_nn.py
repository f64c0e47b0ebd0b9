"""TAV triple-fusion entry point (reference ``tav_nn.py``): the flagship.

``--dataset synthetic`` trains the tiny-spec fusion stack end-to-end on
generated MELD-shaped records (smoke-scale); MELD/IEMOCAP pickles plug in
via data/records.py once media decoding is available. The full policy stack
runs either way: weighted multinomial sampler ↔ sequential by epoch parity,
NewCrossEntropy switching, dialog-aligned accumulation, mid-epoch
val/ckpt/patience, best-reload.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mme_tpu.core.config import arg_parse, config_from_args
from mme_tpu.cli.common import run_classifier
from mme_tpu.data.synthetic import synthetic_tav_dataset
from mme_tpu.models.fusion import FUSION_MODELS, TAVSpec
from mme_tpu.train.build_tav import (make_video_keep_transform,
                                     modality_embedding_trainable_mask)


def main(argv=None):
    args = arg_parse("tav_nn", argv)
    cfg = config_from_args(args)
    np.random.seed(cfg.seed)

    spec = TAVSpec(output_dim=cfg.output_dim, dropout=cfg.dropout,
                   learn_pos_embeddings=cfg.learn_PosEmbeddings)
    if not cfg.mask:
        # --mask gates the masking augmentations for real (the reference
        # parses it and ignores it, tav_nn.py:78): off → no SpecAugment,
        # deterministic visual keep-mask below.
        import dataclasses as _dc
        spec = _dc.replace(spec, audio=_dc.replace(
            spec.audio, mask_time_prob=0.0, mask_feature_prob=0.0))
    audio_len = cfg.audio_max_samples
    text_len = cfg.text_max_len
    import os as _os
    if cfg.dataset == "synthetic" or _os.environ.get("MME_TINY"):
        spec = spec.tiny()
        audio_len, text_len = 2000, 16

    # -m selects the fusion architecture (reference tav_nn.py model flag;
    # 'MAE_encoder' is its default)
    model_cls = FUSION_MODELS.get(cfg.model, FUSION_MODELS["MAE_encoder"])
    model = model_cls(spec)
    is_moe = cfg.model == "TAVMoE"

    def apply_fn(variables, batch, deterministic=True, rngs=None,
                 mutable=None):
        if is_moe:
            # MoE trunk sows its load-balancing loss; collect it so the
            # train step can add it to the CE term (has_aux_loss=True)
            from mme_tpu.models.moe import collect_aux_loss
            logits, inter = model.apply(
                variables, batch, deterministic=deterministic, rngs=rngs,
                mutable=["intermediates"])
            return logits, collect_aux_loss(inter["intermediates"])
        return model.apply(variables, batch, deterministic=deterministic,
                           rngs=rngs)

    import os
    pkl = cfg.dataset if cfg.dataset.endswith(".pkl") else f"{cfg.dataset}.pkl"
    if cfg.dataset != "synthetic" and os.path.exists(pkl):
        # reference pickle contract (tav_nn.py:146-163): split column,
        # dialog ids for accumulation, keyframe video via MME_KEYFRAME_GLOB
        import pandas as pd
        from mme_tpu.data.records import (PickleDatasetConfig, get_tokenizer,
                                          build_tav_dataset, split_dataframe)
        df = pd.read_pickle(pkl)
        rcfg = PickleDatasetConfig(label_col=cfg.label_task,
                                   text_max_len=text_len,
                                   audio_max_samples=audio_len,
                                   seed=cfg.seed,
                                   # uint8 video transport: 4× smaller
                                   # records + host→device copies; the
                                   # batch transform normalizes on device
                                   video_uint8=True)
        tok = get_tokenizer(
            None if spec.text.vocab_size != 50265 else
            "j-hartmann/emotion-english-distilroberta-base",
            spec.text.vocab_size)
        tr, va, te = split_dataframe(df, rcfg)
        kf = os.environ.get("MME_KEYFRAME_GLOB")
        train_ds, val_ds, test_ds = (
            build_tav_dataset(x, rcfg, spec.video.num_frames,
                              spec.video.image_size, tokenizer=tok,
                              keyframe_glob=kf)
            for x in (tr, va, te))
    else:
        mk = lambda n, s: synthetic_tav_dataset(
            spec, n, text_len=text_len, audio_len=audio_len,
            num_classes=cfg.output_dim, seed=s)
        train_ds, val_ds, test_ds = mk(64, 0), mk(16, 1), mk(16, 2)

    transform = make_video_keep_transform(spec, random_mask=cfg.mask)
    example = transform(jax.random.PRNGKey(0),
                        {k: jnp.asarray(v[:1])
                         for k, v in train_ds.features.items()})
    params = model.init(jax.random.PRNGKey(cfg.seed), example)["params"]
    from mme_tpu.models.pretrained import load_tav, pretrained_root
    root = pretrained_root()
    if root and spec.hidden == 768 and model_cls.__name__ == "TAVModel":
        params, loaded = load_tav(params, spec, root)
        for name in loaded:
            print(f"loaded pretrained tower: {name}", flush=True)
    if _os.environ.get("MME_SCAN_LAYERS") == "1":
        # scan-over-layers twin: same numerics, ~L× faster first compile
        # (dev iteration through the slow remote-compile tunnel;
        # BASELINE.md: ~11% step cost at bench scale)
        from mme_tpu.models.layers import convert_tree_to_scan
        model = model_cls(spec.with_scan_layers())
        params = convert_tree_to_scan(params)
        print("scan-over-layers mode on (MME_SCAN_LAYERS)", flush=True)
    return run_classifier(cfg, apply_fn, params, train_ds, val_ds, test_ds,
                          batch_transform=transform,
                          trainable_mask=modality_embedding_trainable_mask(
                              params, spec.learn_pos_embeddings),
                          rng_names=("dropout", "spec_augment"),
                          has_aux_loss=is_moe)


if __name__ == "__main__":
    main()
