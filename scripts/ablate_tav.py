"""Component-level ablation of the TAV train step on real hardware.

Times forward+backward of each tower in isolation (same shapes as
bench.py's flagship step: batch 8, text 70, audio 96k samples, video
16x224x224) so the utt/s gap to the roofline can be attributed. Honest
sync: every window ends in a host transfer of a value that data-depends on
the timed work; best-of-N windows against tunnel contention.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/ablate_tav.py
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_mme")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mme_tpu.models.fusion import PreFormer, TAVSpec
from mme_tpu.models.audio import ConvFeatureExtractor, Wav2Vec2Model
from mme_tpu.models.video import VideoMAEModel
from mme_tpu.models.text import TextEncoder
from mme_tpu.models.layers import TransformerEncoder
from mme_tpu.ops.attention import additive_mask
from mme_tpu.train.build_tav import build_tav, example_tav_batch
from mme_tpu.core.config import ExperimentConfig

B = int(os.environ.get("BENCH_BATCH", "8"))
AUDIO = int(os.environ.get("BENCH_AUDIO_LEN", "96000"))
TEXT = 70
STEPS = int(os.environ.get("BENCH_STEPS", "10"))
WINDOWS = int(os.environ.get("BENCH_WINDOWS", "3"))


def timed(name, fn, *args):
    """fn(*args) -> scalar; returns best-of-WINDOWS seconds per call."""
    out = fn(*args)
    _ = float(out)  # compile + sync
    best = float("inf")
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        acc = None
        for _ in range(STEPS):
            acc = fn(*args)
        _ = float(acc)
        best = min(best, (time.perf_counter() - t0) / STEPS)
    print(json.dumps({"component": name, "ms_per_step": round(best * 1e3, 2),
                      "utt_per_s": round(B / best, 2)}), flush=True)
    return best


def fwd_bwd(apply_fn, params, *inputs):
    """Jitted forward+backward scalar loss of sum(output)."""

    @jax.jit
    def run(p, *xs):
        def loss(p_):
            return jnp.sum(apply_fn(p_, *xs) ** 2)
        l, g = jax.value_and_grad(loss)(p)
        # fold the grads into the scalar so the host transfer syncs them
        return l + sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(g)) * 0.0

    return run


def main():
    import dataclasses as dc
    spec = TAVSpec(output_dim=7).with_compute_dtype(jnp.bfloat16)
    spec = dc.replace(spec, audio=dc.replace(spec.audio, remat_conv=True))
    batch = example_tav_batch(spec, B, TEXT, AUDIO)
    rng = jax.random.PRNGKey(0)

    # --- full train step (bench parity) ---
    cfg = ExperimentConfig(batch_size=B, learning_rate=5e-6,
                           text_max_len=TEXT, audio_max_samples=AUDIO)
    _m, state, train_step, _ = build_tav(spec, cfg, 1000,
                                         example_batch=batch, remat=False)
    labels = jnp.zeros((B,), jnp.int32)
    mask = jnp.ones((B,), jnp.int32)
    cw = jnp.ones((7,), jnp.float32)
    one = jnp.asarray(1.0, jnp.float32)
    yes = jnp.asarray(True)

    def full(_):
        nonlocal state
        state, loss, _, _ = train_step(state, batch, labels, mask, cw, one,
                                       yes, rng)
        return loss
    timed("full_train_step", full, 0)

    # --- audio tower (24-layer large w2v2) fwd+bwd ---
    aud = Wav2Vec2Model(spec.audio)
    p_aud = jax.jit(lambda: aud.init(rng, batch["waveform"],
                                     batch["audio_mask"]))()["params"]
    run_aud = fwd_bwd(
        lambda p, w, m: aud.apply({"params": p}, w, m)[0], p_aud)
    timed("audio_tower", lambda _: run_aud(p_aud, batch["waveform"],
                                           batch["audio_mask"]), 0)

    # --- conv feature extractor alone fwd+bwd ---
    fe = ConvFeatureExtractor(spec.audio)
    p_fe = jax.jit(lambda: fe.init(rng, batch["waveform"]))()["params"]
    run_fe = fwd_bwd(lambda p, w: fe.apply({"params": p}, w), p_fe)
    timed("conv_extractor", lambda _: run_fe(p_fe, batch["waveform"]), 0)

    # --- video tower over complement mask (1464 visible tokens) ---
    vid = VideoMAEModel(spec.video)
    keep = jnp.logical_not(batch["video_keep"])
    k = spec.video.num_patches - spec.video_keep_k
    p_vid = jax.jit(lambda: vid.init(rng, batch["video"], keep, k))()["params"]
    run_vid = fwd_bwd(lambda p, v: vid.apply({"params": p}, v, keep, k), p_vid)
    timed("video_tower_1464", lambda _: run_vid(p_vid, batch["video"]), 0)

    # --- text tower ---
    txt = TextEncoder(spec.text)
    p_txt = jax.jit(lambda: txt.init(rng, batch["input_ids"],
                                     batch["text_mask"]))()["params"]
    run_txt = fwd_bwd(
        lambda p, i, m: txt.apply({"params": p}, i, m)[1], p_txt)
    timed("text_tower", lambda _: run_txt(p_txt, batch["input_ids"],
                                          batch["text_mask"]), 0)

    # --- fusion trunk over the fused sequence (~474 tokens) ---
    S = TEXT + 299 + spec.video_keep_k + 1  # text + audio frames + video + cls-ish
    enc = TransformerEncoder(spec.fusion)
    x = jax.random.normal(rng, (B, S, spec.hidden), jnp.float32)
    keep1 = jnp.ones((B, S), jnp.int32)
    p_enc = jax.jit(lambda: enc.init(rng, x, additive_mask(keep1)))()["params"]
    run_enc = fwd_bwd(
        lambda p, h: enc.apply({"params": p}, h, additive_mask(keep1)), p_enc)
    timed(f"fusion_trunk_S{S}", lambda _: run_enc(p_enc, x), 0)

    # --- PreFormer (embedding stages incl. second conv extractor) ---
    pre = PreFormer(spec)
    p_pre = jax.jit(lambda: pre.init(
        rng, batch["input_ids"], batch["text_mask"], batch["waveform"],
        batch["audio_mask"], batch["video"], batch["video_keep"]))()["params"]
    run_pre = fwd_bwd(
        lambda p, w: pre.apply({"params": p}, batch["input_ids"],
                               batch["text_mask"], w, batch["audio_mask"],
                               batch["video"], batch["video_keep"])[0], p_pre)
    timed("preformer", lambda _: run_pre(p_pre, batch["waveform"]), 0)


if __name__ == "__main__":
    main()
