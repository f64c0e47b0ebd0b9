"""Flagship benchmark: MELD-shaped TAV fusion TRAINING throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: utterances/sec/chip for the full TAV fusion train step (PreFormer +
TAVForMAE four towers, forward+backward+AdamW) at MELD-like shapes (text 70
tokens, audio 6 s @ 16 kHz, video 16×224×224).

vs_baseline: the reference records NO throughput (BASELINE.md). Its V100
envelope (batch 1-2, per-batch Python A/V decode in 2 dataloader workers,
``hyper_parameter_config/tav.yaml:22``) bounds it at ~2 utterances/sec, and
``scripts/measure_torch_baseline.py`` measures the reference-faithful torch
train step on this host (BASELINE_MEASURED.json). The denominator is the
LARGER of the two — i.e. the comparison stays conservative: the measured
same-host torch-CPU rate can only raise the bar, never lower it below the
V100 envelope estimate.
"""

from __future__ import annotations

import json
import os
import time

V100_ENVELOPE_UTT_PER_SEC = 2.0


def baseline_utt_per_sec() -> float:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    measured = 0.0
    try:
        with open(path) as f:
            measured = float(json.load(f).get("torch_utt_per_sec", 0.0))
    except Exception:
        pass
    return max(V100_ENVELOPE_UTT_PER_SEC, measured)


def bench_meld_distribution(jax, jnp, state, train_step, template_batch,
                            labels, mask, cw, one, yes, rng, batch_size,
                            audio_len, steps):
    """Train-step throughput under a MELD-like utterance-length
    distribution through length buckets (4 compiled shapes). Prints the
    one JSON line and returns."""
    import sys
    import numpy as np

    n_utt = int(os.environ.get("BENCH_DIST_N", str(batch_size * steps)))
    rs = np.random.RandomState(0)
    secs = np.clip(np.exp(rs.normal(np.log(2.8), 0.55, n_utt)), 0.75, 6.0)
    lengths = np.minimum((secs * 16000).astype(np.int64), audio_len)
    n_buckets = int(os.environ.get("BENCH_BUCKETS_N", "4"))
    bounds = [audio_len * i // n_buckets for i in range(1, n_buckets + 1)]
    bucket_of = np.searchsorted(bounds, lengths)

    wave_full = np.asarray(template_batch["waveform"])
    arange = np.arange(audio_len)

    def make_batches():
        """(batch, n_real) per bucket-grouped batch — the iteration the
        CLI's BucketedBatchIter drives (incl. its tail promotion: each
        bucket's remainder rides up to the next bound; only the largest
        bucket wraps a padded tail), with text/video held at bench shapes
        (length variation is an audio-path property)."""
        out = []
        carry = np.empty((0,), np.int64)
        for b, bound in enumerate(bounds):
            idx = np.concatenate([carry, np.where(bucket_of == b)[0]])
            if b < len(bounds) - 1:
                keep = len(idx) - len(idx) % batch_size
                carry = idx[keep:]
                idx = idx[:keep]
            for s in range(0, len(idx), batch_size):
                sel = idx[s:s + batch_size].astype(np.int64)
                n_real = len(sel)
                if n_real < batch_size:   # wrap the tail to a full batch
                    sel = np.concatenate(
                        [sel, idx[:batch_size - n_real].astype(np.int64)]
                    ) if len(idx) >= batch_size else np.resize(
                        sel, batch_size)
                lens = lengths[sel]
                am = (arange[None, :bound] < lens[:, None]).astype(np.int32)
                wav = wave_full[np.arange(batch_size) % wave_full.shape[0],
                                :bound] * am
                batch = dict(template_batch)
                batch["waveform"] = jnp.asarray(wav, jnp.float32)
                batch["audio_mask"] = jnp.asarray(am)
                out.append((batch, n_real))
        return out

    bucket_batches = make_batches()
    n_real_total = sum(n for _, n in bucket_batches)
    assert n_real_total == n_utt

    # warmup: compile every bucket shape once
    t_c = time.perf_counter()
    seen = set()
    st = state
    for batch, _ in bucket_batches:
        shape = batch["waveform"].shape
        if shape in seen:
            continue
        seen.add(shape)
        st, loss, _, _ = train_step(st, batch, labels, mask, cw, one, yes,
                                    rng)
    _ = float(loss)
    print(f"# compile ({len(seen)} bucket shapes): "
          f"{time.perf_counter() - t_c:.1f}s", file=sys.stderr, flush=True)

    # thread st continuously — the step donates its state buffers, so the
    # pre-warmup `state` is already consumed
    windows = int(os.environ.get("BENCH_WINDOWS", "3"))
    best_dt = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for batch, _ in bucket_batches:
            st, loss, _, _ = train_step(st, batch, labels, mask, cw, one,
                                        yes, rng)
        last_loss = float(loss)   # host transfer = true device sync
        best_dt = min(best_dt, time.perf_counter() - t0)
    import math
    assert math.isfinite(last_loss), f"non-finite loss {last_loss}"

    n_chips = max(len(jax.devices()), 1)
    eff = n_real_total / best_dt / n_chips
    # executed audio samples = each batch's bound × its rows (promotion
    # runs some rows at a larger bound; wrap rows count as executed)
    pad_bucketed = float(lengths.sum()) / float(
        sum(b["waveform"].shape[0] * b["waveform"].shape[1]
            for b, _ in bucket_batches))
    pad_fixed = float(lengths.sum()) / float(n_utt * audio_len)
    print(json.dumps({
        "metric": "MELD utterances/sec/chip (TAV fusion train, "
                  "realistic length distribution, bucketed)",
        "value": round(eff, 3),
        "unit": "utt/s/chip",
        "vs_baseline": round(eff / baseline_utt_per_sec(), 2),
        "audio_padding_efficiency_bucketed": round(pad_bucketed, 3),
        "audio_padding_efficiency_fixed_cap": round(pad_fixed, 3),
        "n_utterances": n_utt,
        "length_note": "lognormal median 2.8s sigma 0.55 clip [0.75, 6]s "
                       "(assumed; no MELD media on host)",
    }))


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/.cache/jax_mme")
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    # Dropout/SpecAugment mask bits come from the TPU hardware RNG by
    # default (rbg): threefry is a long VPU op chain and the train step
    # draws ~200M random bits/step across ~24 dropout sites — measured
    # 33.9 → 35.1 utt/s at batch 8 (BASELINE.md). BENCH_PRNG=threefry2x32
    # restores the splittable default (reproducible across topologies).
    if jax.default_backend() == "tpu":
        jax.config.update("jax_default_prng_impl",
                          os.environ.get("BENCH_PRNG", "rbg"))
    elif os.environ.get("BENCH_PRNG"):
        jax.config.update("jax_default_prng_impl", os.environ["BENCH_PRNG"])

    from mme_tpu.core.config import ExperimentConfig
    from mme_tpu.models.fusion import TAVSpec
    from mme_tpu.train.build_tav import build_tav, example_tav_batch

    import jax.numpy as jnp_  # local alias for the dtype switch

    # bf16 Adam moments (rbg-noise stochastic rounding, train/optim.py) are
    # the measured-best default: 32.6 vs 32.2 utt/s fp32 at batch 8, and
    # ~4.8 GB less HBM (MME_OPT_STATE=fp32 reverts)
    os.environ.setdefault("MME_OPT_STATE", "bf16")
    # Flash-attention block sizes: BQ=512 with a full-sequence FORWARD K
    # block (1464 = video-tower seq; the kernel caps bk at each tower's
    # seq_k) measured 37.4 utt/s vs 33.9 at 512/512 and 33.1 at the
    # 256/512 kernel defaults — one K pass per q block. The BACKWARD
    # keeps its own small k-tile (MME_FLASH_BK_BWD, default 512 — must
    # be a multiple of 128 or the full padded seq, lane rule): its
    # [bk, bq] fp32 temporaries put bk=1464 at ~16.3 MB scoped VMEM —
    # over the 16 MB budget once the round-3 fusion-trunk flash path
    # shifted allocator luck — and bwd tile size was measured a wash.
    os.environ.setdefault("MME_FLASH_BQ", "512")
    os.environ.setdefault("MME_FLASH_BK", "1464")
    batch_size = int(os.environ.get("BENCH_BATCH", "8"))
    audio_len = int(os.environ.get("BENCH_AUDIO_LEN", "96000"))  # 6 s
    text_len = 70
    steps = int(os.environ.get("BENCH_STEPS", "20"))

    spec = TAVSpec(output_dim=7)
    if os.environ.get("BENCH_DTYPE", "bfloat16") == "bfloat16":
        spec = spec.with_compute_dtype(jnp_.bfloat16)
    # No remat is the measured-best default at batch 8 (33.3 vs 32.6 utt/s
    # conv-only): bf16 opt state + flash head-packing freed enough HBM that
    # even the conv stack's activations fit, saving ~0.5 TFLOP of backward
    # recompute. BENCH_REMAT=conv|av|full restore the remat ladder for
    # larger batches / longer audio.
    import dataclasses as _dc
    remat_mode = os.environ.get("BENCH_REMAT", "none")  # none|conv|av|full
    if remat_mode != "none":
        spec = _dc.replace(spec,
                           audio=_dc.replace(spec.audio, remat_conv=True))
    # Ablation probes for the VPU-interlude decomposition (BASELINE.md) —
    # measurement knobs, not production configs:
    #   BENCH_GELU=gelu_new|relu  swap every encoder's activation (bounds
    #       the exact-erf GELU's VPU cost; relu is the upper bound)
    #   BENCH_DROPOUT0=1          disable every dropout site (bounds mask
    #       RNG generation + mask-apply + bwd-mask HBM cost)
    def _map_enc(s, fn):
        return _dc.replace(
            s,
            text=_dc.replace(s.text, encoder=fn(s.text.encoder)),
            audio=_dc.replace(s.audio, encoder=fn(s.audio.encoder)),
            video=_dc.replace(s.video, encoder=fn(s.video.encoder)),
            fusion=fn(s.fusion))
    if os.environ.get("BENCH_GELU"):
        act = os.environ["BENCH_GELU"]
        spec = _map_enc(spec, lambda e: _dc.replace(e, act=act))
    if os.environ.get("BENCH_DROPOUT0", "0") == "1":
        spec = _dc.replace(
            _map_enc(spec, lambda e: _dc.replace(
                e, dropout=0.0, attention_dropout=0.0)),
            dropout=0.0)
    if os.environ.get("BENCH_SHARE", "1") == "1":
        # one conv frontend for PreFormer + audio tower (ablation: the
        # duplicate conv stack is ~5% of the step)
        spec = _dc.replace(spec, share_audio_frontend=True)
    if os.environ.get("BENCH_SCAN", "0") == "1":
        # scan-over-layers: ~L× faster compiles (first compile through the
        # remote tunnel is minutes); step-time impact measured vs unrolled
        spec = spec.with_scan_layers()
    full_remat = (True if remat_mode == "full"
                  else "av" if remat_mode == "av" else False)
    cfg = ExperimentConfig(batch_size=batch_size, learning_rate=5e-6,
                           text_max_len=text_len,
                           audio_max_samples=audio_len)
    batch = example_tav_batch(spec, batch_size, text_len, audio_len)
    _model, state, train_step, _ = build_tav(
        spec, cfg, steps_per_epoch=1000, example_batch=batch,
        remat=full_remat,
        # the bench has no dialog accumulation → drop the params-sized
        # fp32 accumulation buffer (~2.4 GB of HBM back)
        use_accum=os.environ.get("BENCH_ACCUM", "0") == "1")

    labels = jnp.zeros((batch_size,), jnp.int32)
    mask = jnp.ones((batch_size,), jnp.int32)
    cw = jnp.ones((7,), jnp.float32)
    one = jnp.asarray(1.0, jnp.float32)
    yes = jnp.asarray(True)
    rng = jax.random.PRNGKey(0)

    if os.environ.get("BENCH_DIST") == "meld":
        # Realistic-length-distribution throughput (VERDICT r4 weak #2):
        # the fixed-shape headline pads every utterance to the 6 s cap,
        # but MELD utterances are typically 2-4 s — this mode samples a
        # MELD-like duration distribution, routes it through the length
        # buckets the CLI uses (data/dataset.py::bucketed_batches
        # semantics: one compiled shape per bound), and reports EFFECTIVE
        # utterances/sec/chip plus padding efficiency. Distribution is an
        # ASSUMPTION (no MELD media on this host): lognormal, median
        # ~2.8 s, σ=0.55, clipped to [0.75 s, 6 s] — the cap matches the
        # reference's audio_shape filter (SingleModels/audio_nn.py:115).
        return bench_meld_distribution(
            jax, jnp, state, train_step, batch, labels, mask, cw, one,
            yes, rng, batch_size, audio_len, steps)

    # warmup / compile
    import sys
    if os.environ.get("BENCH_AUTO_LAYOUT", "0") == "1":
        # One-pass attack on the profile's copy-done tail (5.3%, 5678
        # async copies — VERDICT r4 next #9): compile the step with AUTO
        # input layouts and device_put the state into exactly the layouts
        # the compiled program wants, so XLA has no per-step relayout
        # copies to insert for parameters feeding the conv/matmul fusions.
        from jax.experimental.layout import Format, Layout
        # AUTO layouts on the state only (in arg 0 / out 0): the scalar
        # loss/cm/grad-norm outputs must keep default layouts — the tunnel
        # backend rejects host transfers of AUTO-laid-out scalars
        train_step = jax.jit(
            train_step,
            in_shardings=(Format(Layout.AUTO),) + (None,) * 7,
            out_shardings=(Format(Layout.AUTO), None, None, None),
            donate_argnums=(0,))
        args = (state, batch, labels, mask, cw, one, yes, rng)
        shapes = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x),
                                           jnp.asarray(x).dtype), args)
        compiled = train_step.lower(*shapes).compile()
        fmts = compiled.input_formats[0]
        def relayout(x, f):
            if f is None:
                return x
            try:
                return jax.device_put(x, f, donate=True)
            except TypeError:        # older device_put: no donate kwarg
                return jax.device_put(x, f)
        state, batch, labels, mask, cw, one, yes, rng = jax.tree.map(
            relayout, args, fmts)
        train_step = compiled   # AOT executable accepts the laid-out args
        print("# auto input layouts applied", file=sys.stderr, flush=True)
    t_c = time.perf_counter()
    state, loss, _, _ = train_step(state, batch, labels, mask, cw, one, yes, rng)
    loss.block_until_ready()
    print(f"# compile+first-step: {time.perf_counter() - t_c:.1f}s",
          file=sys.stderr, flush=True)
    state, loss, _, _ = train_step(state, batch, labels, mask, cw, one, yes, rng)
    loss.block_until_ready()

    # the shared-tunnel TPU shows heavy run-to-run contention noise; take
    # the best of several windows. Sync by TRANSFERRING the final loss:
    # through this relay, block_until_ready can resolve before device
    # completion under deep queues, while float() needs the real bytes —
    # and the loss depends on every step through the threaded state.
    windows = int(os.environ.get("BENCH_WINDOWS", "3"))
    best_dt = float("inf")
    last_loss = float("nan")
    from mme_tpu.utils.profiling import profile_trace
    with profile_trace(os.environ.get("MME_PROFILE_DIR")):
        for _ in range(windows):
            t0 = time.perf_counter()
            for _ in range(steps):
                state, loss, _, _ = train_step(state, batch, labels, mask,
                                               cw, one, yes, rng)
            last_loss = float(loss)  # host transfer = true device sync
            best_dt = min(best_dt, time.perf_counter() - t0)
    import math
    assert math.isfinite(last_loss), f"non-finite training loss {last_loss}"

    n_chips = max(len(jax.devices()), 1)
    utt_per_sec_per_chip = batch_size * steps / best_dt / n_chips
    # MFU: ~2.6 TFLOP/sample fwd+bwd (ESTIMATED analytically from the
    # tower shapes — BASELINE.md roofline row) against the 197 TFLOP/s
    # v5e bf16 peak; only meaningful on TPU at default bench shapes.
    tflop_per_sample = 2.6
    peak_tflops = 197.0
    print(json.dumps({
        "metric": "MELD utterances/sec/chip (TAV fusion train)",
        "value": round(utt_per_sec_per_chip, 3),
        "unit": "utt/s/chip",
        "vs_baseline": round(utt_per_sec_per_chip / baseline_utt_per_sec(),
                             2),
        "mfu": round(utt_per_sec_per_chip * tflop_per_sample / peak_tflops,
                     4),
        "mfu_note": "est. 2.6 TFLOP/sample / 197 TFLOP/s v5e bf16 peak",
        "baseline_note": "denominator is the ESTIMATED 2.0 utt/s V100 "
                         "envelope (reference records no throughput; "
                         "same-host torch-CPU measured 0.028 utt/s can "
                         "only raise it) — the multiple is an estimated-x",
    }))


if __name__ == "__main__":
    main()
