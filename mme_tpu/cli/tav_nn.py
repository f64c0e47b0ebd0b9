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
    if _os.environ.get("MME_DTYPE", "") in ("bfloat16", "bf16"):
        # mixed precision from the CLI (bench.py's BENCH_DTYPE, promoted):
        # params fp32, activations/matmuls bf16, softmax/LN fp32
        spec = spec.with_compute_dtype(jnp.bfloat16)
        print("compute dtype: bfloat16", flush=True)
    if _os.environ.get("MME_SHARE_FRONTEND", "0") == "1":
        # one conv audio frontend feeds PreFormer AND the audio tower
        # (TAVSpec.share_audio_frontend — the documented deviation bench.py
        # defaults to via BENCH_SHARE=1; the reference runs two separate
        # conv stacks, models/tav.py:259+352 vs :455+476). Quality-gated by
        # tests/test_quality_gate_tav.py::test_tied_frontend_matches.
        import dataclasses as _dcs
        spec = _dcs.replace(spec, share_audio_frontend=True)
        print("shared audio frontend (tied conv stacks)", flush=True)

    # -m selects the fusion architecture (reference tav_nn.py model flag;
    # 'MAE_encoder' is its default)
    model_cls = FUSION_MODELS.get(cfg.model, FUSION_MODELS["MAE_encoder"])

    # Sequence/pipeline parallelism on a named tower (beyond-reference
    # scaling axes, SURVEY §5.7/§2.9): MME_SP=<n> runs the chosen tower's
    # attention as ring attention sequence-sharded over n devices;
    # MME_PP=<n> streams its layers as an n-stage GPipe pipeline
    # (MME_PP_MICRO microbatches, default 4). MME_SP_TOWER / MME_PP_TOWER
    # select the tower: fusion (default) | video | audio | text — the
    # video tower is the dominant per-step cost (BASELINE.md tower table)
    # and the audio tower is §5.7's motivating case (lifting the
    # audio_shape cap). Remaining devices form a dp axis; dp×sp / dp×pp
    # compose. These change EXECUTION, not params — checkpoints and
    # pretrained trees are unaffected.
    mesh = None
    sp = int(_os.environ.get("MME_SP", "0") or 0)
    pp = int(_os.environ.get("MME_PP", "0") or 0)
    if sp > 1 or pp > 1:
        import dataclasses as _dc
        assert not (sp > 1 and pp > 1), "MME_SP and MME_PP are exclusive"
        n_dev = len(jax.devices())
        par, axis = (sp, "sp") if sp > 1 else (pp, "pp")
        tower = _os.environ.get(
            "MME_SP_TOWER" if sp > 1 else "MME_PP_TOWER", "fusion")
        assert tower in ("fusion", "video", "audio", "text"), tower
        assert n_dev % par == 0, f"{n_dev} devices not divisible by {par}"
        dp = n_dev // par
        assert cfg.batch_size % dp == 0, (
            f"batch {cfg.batch_size} not divisible by dp={dp}")
        from mme_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(dp, par, axis_names=("dp", axis))

        def tower_encoder(s):
            return s.fusion if tower == "fusion" else \
                getattr(s, tower).encoder

        def with_tower_encoder(s, enc):
            if tower == "fusion":
                return _dc.replace(s, fusion=enc)
            sub = getattr(s, tower)
            return _dc.replace(s, **{tower: _dc.replace(sub, encoder=enc)})

        enc = tower_encoder(spec)
        if sp > 1:
            enc = _dc.replace(enc, seq_mesh=mesh, seq_axis="sp",
                              batch_axis="dp")
        else:
            micro = int(_os.environ.get("MME_PP_MICRO", "4"))
            assert enc.layers % par == 0, (
                f"{enc.layers} {tower} layers not divisible into "
                f"{par} stages")
            # the global batch splits into microbatches FIRST, then each
            # microbatch's rows shard over dp
            assert cfg.batch_size % micro == 0 and \
                (cfg.batch_size // micro) % dp == 0, (
                    f"batch {cfg.batch_size} must split into {micro} "
                    f"microbatches of a dp={dp} multiple (MME_PP_MICRO)")
            enc = _dc.replace(enc, pp_mesh=mesh, pp_axis="pp",
                              pp_micro=micro, batch_axis="dp")
        spec = with_tower_encoder(spec, enc)
        print(f"{tower} tower {axis}={par} dp={dp} "
              f"({'ring attention' if sp > 1 else 'GPipe pipeline'})",
              flush=True)

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

    from mme_tpu.cli.common import resolve_pickle
    pkl = resolve_pickle(cfg.dataset)
    if pkl is not None:
        # reference pickle contract (tav_nn.py:146-163): split column,
        # dialog ids for accumulation, keyframe video via MME_KEYFRAME_GLOB
        import pandas as pd
        from mme_tpu.data.records import (PickleDatasetConfig,
                                          build_label_map, get_tokenizer,
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
        rcfg.label_map = build_label_map(df, rcfg.label_col)
        from mme_tpu.cli.common import invert_label_map
        id2label = invert_label_map(rcfg.label_map)
        tok = get_tokenizer(
            None if spec.text.vocab_size != 50265 else
            "j-hartmann/emotion-english-distilroberta-base",
            spec.text.vocab_size)
        tr, va, te = split_dataframe(df, rcfg)
        kf = _os.environ.get("MME_KEYFRAME_GLOB")
        train_ds, val_ds, test_ds = (
            build_tav_dataset(x, rcfg, spec.video.num_frames,
                              spec.video.image_size, tokenizer=tok,
                              keyframe_glob=kf)
            for x in (tr, va, te))
    else:
        id2label = None
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
    # length bucketing (shared helper with the audio CLI): one compiled
    # step per bound instead of padding every utterance to the audio cap —
    # MELD utterances are typically 2-4 s under the 6 s cap, so fixed-cap
    # padding wastes audio-tower FLOPs (the reference pads per batch
    # dynamically instead, models/tav.py:228 — a recompile per batch on
    # TPU). Default ON for pickle (real-data) runs; synthetic runs are
    # fixed-length so bucketing only engages there when asked for.
    from mme_tpu.cli.common import make_bucket_iter
    batch_iter = make_bucket_iter(audio_len, default_on=pkl is not None)
    return run_classifier(cfg, apply_fn, params, train_ds, val_ds, test_ds,
                          batch_transform=transform,
                          trainable_mask=modality_embedding_trainable_mask(
                              params, spec.learn_pos_embeddings),
                          rng_names=("dropout", "spec_augment"),
                          has_aux_loss=is_moe, mesh=mesh,
                          id2label=id2label, batch_iter=batch_iter)


if __name__ == "__main__":
    main()
