"""Decompose the TAV train-step time by component (bench shapes, batch 8).

The remote-tunnel TPU can't ship jax.profiler device traces, so this
measures instead: each tower's fwd+bwd is jitted and timed standalone at
the exact bench shapes, plus the AdamW update alone. The sum ≈ the full
step (XLA overlaps some), and the per-component share tells where the
remaining roofline gap lives (BASELINE.md ~75 utt/s bound vs measured).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_towers.py
Env: PROF_BATCH (8), PROF_STEPS (10), PROF_WINDOWS (3).
"""

from __future__ import annotations

import json
import os
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_mme")

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args, steps, windows, sync, name=None):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        outs = [sync(fn(*args)) for _ in range(steps)]
        # host transfer of a value depending on EVERY dispatch in the
        # window (CLAUDE.md timing rule: through the tunnel, a sync on
        # just the last call can resolve before earlier work completes)
        _ = float(sum(o.astype(jnp.float32).sum() if hasattr(o, "astype")
                      else o for o in outs))
        best = min(best, time.perf_counter() - t0)
    if name:
        print(f"# {name}: {best / steps * 1000:.1f} ms", flush=True)
    return best / steps


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import dataclasses as dc

    from mme_tpu.models.fusion import TAVSpec, TAVModel
    from mme_tpu.models.text import TextEncoder
    from mme_tpu.models.audio import Wav2Vec2Model
    from mme_tpu.models.video import VideoMAEModel
    from mme_tpu.models.layers import TransformerEncoder
    from mme_tpu.train.build_tav import example_tav_batch
    from mme_tpu.ops.attention import additive_mask

    B = int(os.environ.get("PROF_BATCH", "8"))
    steps = int(os.environ.get("PROF_STEPS", "10"))
    windows = int(os.environ.get("PROF_WINDOWS", "3"))
    audio_len, text_len = 96000, 70

    spec = TAVSpec(output_dim=7).with_compute_dtype(jnp.bfloat16)
    spec = dc.replace(spec, audio=dc.replace(spec.audio, remat_conv=True),
                      share_audio_frontend=True)
    batch = example_tav_batch(spec, B, text_len, audio_len)
    rng = jax.random.PRNGKey(0)

    results = {}

    def fwd_bwd(module, variables, *args, **kw):
        def loss(v):
            out = module.apply(v, *args, **kw)
            if isinstance(out, tuple):
                out = out[0]
            return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6
        return jax.jit(jax.value_and_grad(loss)), variables

    # --- text tower (distilroberta 6L, S=70)
    text_enc = TextEncoder(spec.text)
    tv = text_enc.init(rng, batch["input_ids"], batch["text_mask"])
    f, v = fwd_bwd(text_enc, tv, batch["input_ids"], batch["text_mask"])
    results["text_tower"] = timed(f, (v,), steps, windows,
                                  lambda o: o[0], name="text_tower")
    del f, v, tv

    # --- audio tower (conv frontend + 24L wav2vec2-large, ~299 frames)
    aud = Wav2Vec2Model(spec.audio)
    av = aud.init(rng, batch["waveform"], batch["audio_mask"])
    f, v = fwd_bwd(aud, av, batch["waveform"], batch["audio_mask"])
    results["audio_tower_with_conv"] = timed(
        f, (v,), steps, windows, lambda o: o[0],
        name="audio_tower_with_conv")
    del f, v, av

    # --- video tower (12L over the 1464-token complement)
    vid = VideoMAEModel(spec.video)
    n_patches = spec.video.num_patches
    comp_keep = jnp.logical_not(batch["video_keep"])
    k_comp = n_patches - spec.video_keep_k
    vv = vid.init(rng, batch["video"], comp_keep, k_comp)
    f, v = fwd_bwd(vid, vv, batch["video"], comp_keep, k_comp)
    results["video_tower_1464"] = timed(
        f, (v,), steps, windows, lambda o: o[0],
        name="video_tower_1464")
    del f, v, vv

    # --- fusion trunk (12L over 70+299+104=473 tokens)
    S_f = 473
    fuse = TransformerEncoder(spec.fusion)
    x = jax.random.normal(rng, (B, S_f, 768), jnp.float32)
    keep = jnp.ones((B, S_f), jnp.int32)
    fv = fuse.init(rng, x, additive_mask(keep))
    f, v = fwd_bwd(fuse, fv, x, additive_mask(keep))
    results["fusion_trunk_473"] = timed(
        f, (v,), steps, windows, lambda o: o[0],
        name="fusion_trunk_473")
    del f, v, fv, x

    # --- full model fwd+bwd (no optimizer, no donation — can exceed HBM
    # where the donating bench step fits; bench.py is the full-step truth)
    model = TAVModel(spec)
    mv = jax.jit(lambda: model.init(rng, batch))()
    try:
        f, v = fwd_bwd(model, mv, batch)
        results["full_model_fwd_bwd"] = timed(
            f, (v,), steps, windows, lambda o: o[0],
            name="full_model_fwd_bwd")
        del f, v
    except Exception as e:  # noqa: BLE001
        print(f"# full_model_fwd_bwd skipped: {type(e).__name__}",
              flush=True)

    # --- optimizer alone (AdamW over the full tree)
    import optax
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(1e-5, weight_decay=1e-4))
    params = mv["params"]
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)

    n_params = sum(x.size for x in jax.tree.leaves(params))
    del mv

    @partial(jax.jit, donate_argnums=(0, 1))
    def opt_step(p, s, g):
        updates, s2 = tx.update(g, s, p)
        return optax.apply_updates(p, updates), s2

    pp, ss = opt_step(params, opt_state, grads)
    jax.block_until_ready(pp)
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(steps):
            pp, ss = opt_step(pp, ss, grads)
        _ = float(jax.tree.leaves(pp)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    results["adamw_update"] = best / steps
    report = {
        "batch": B,
        "n_params": n_params,
        "ms": {k: round(v * 1000, 1) for k, v in results.items()},
        "sum_towers_ms": round(sum(
            v for k, v in results.items()
            if k not in ("full_model_fwd_bwd",)) * 1000, 1),
        "utt_per_sec_full_fwd_bwd": (
            round(B / results["full_model_fwd_bwd"], 2)
            if "full_model_fwd_bwd" in results else None),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
