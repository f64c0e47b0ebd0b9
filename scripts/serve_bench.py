"""Serving throughput bench: the flagship TAV classifier behind
``mme_tpu.serve.Predictor`` at bench shapes (text 70 tok / audio 6 s /
video 16×224×224), batched fixed-shape inference on one chip.

Honest timing: the Predictor already synchronizes per chunk (np.asarray
host transfer of preds/probs), so wall-clock over the window IS device
time + transfer. Best-of-N windows against tunnel contention.

Usage: python scripts/serve_bench.py          (~5 min: one compile/batch)
       SERVE_BATCHES=8,32 SERVE_PARAM_DTYPE=bfloat16 python scripts/serve_bench.py
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from mme_tpu.models.fusion import TAVSpec, TAVModel
from mme_tpu.serve import Predictor
from mme_tpu.train.build_tav import example_tav_batch

N_UTT = 64      # utterances per timing window
BEST_OF = 4


def main():
    spec = TAVSpec(output_dim=7).with_compute_dtype(jnp.bfloat16)
    batches = [int(b) for b in
               os.environ.get("SERVE_BATCHES", "8,32").split(",")]
    pdt = os.environ.get("SERVE_PARAM_DTYPE")
    param_dtype = jnp.bfloat16 if pdt == "bfloat16" else None
    model = TAVModel(spec)
    ex = example_tav_batch(spec, 1, 70, 96000)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), ex)
                     )()["params"]

    def apply_fn(variables, batch, deterministic=True, rngs=None):
        return model.apply(variables, batch, deterministic=deterministic,
                           rngs=rngs)

    results = []
    lat_calls = int(os.environ.get("SERVE_LAT_CALLS", "20"))
    for bs in batches:
        pred = Predictor(apply_fn, params, batch_size=bs,
                         param_dtype=param_dtype)
        window = {k: np.repeat(np.asarray(v), N_UTT, axis=0)
                  for k, v in example_tav_batch(spec, 1, 70, 96000).items()}
        # uint8 video twin: what a 4x-lighter client request ships — the
        # Predictor normalizes on device (serve.py round 5)
        window_u8 = dict(window)
        window_u8["video"] = np.clip(
            (window["video"] * 64 + 128), 0, 255).astype(np.uint8)

        def run_mode(tag, win):
            one = {k: v[:bs] for k, v in win.items()}
            pred(one)                                  # compile
            best = float("inf")
            for _ in range(BEST_OF):
                t0 = time.perf_counter()
                preds, probs = pred(win)
                dt = time.perf_counter() - t0
                assert preds.shape == (N_UTT,) and probs.shape == (N_UTT, 7)
                best = min(best, dt)
            # request latency: ONE batch-of-bs request at a time (the
            # Predictor's concurrency model IS synchronous chunking);
            # p50/p99 include the host->device ingress — through the
            # remote-tunnel chip of this host that ingress dominates
            lats = []
            for _ in range(lat_calls):
                t0 = time.perf_counter()
                pred(one)
                lats.append(time.perf_counter() - t0)
            p50, p99 = np.percentile(lats, [50, 99])
            print(f"serve batch={bs:3d} {tag:15s}: "
                  f"{N_UTT/best:7.1f} utt/s/chip ({best/N_UTT*1e3:7.2f} "
                  f"ms/utt, request p50 {p50*1e3:.1f} / "
                  f"p99 {p99*1e3:.1f} ms)", flush=True)
            results.append({
                "batch": bs, "mode": tag,
                "param_dtype": pdt or "float32",
                "utt_per_sec_per_chip": round(N_UTT / best, 1),
                "ms_per_utt": round(best / N_UTT * 1e3, 2),
                "request_p50_ms": round(p50 * 1e3, 1),
                "request_p99_ms": round(p99 * 1e3, 1),
                "concurrency_model": "synchronous chunking",
            })

        run_mode("fp32-ingress", window)
        run_mode("uint8-ingress", window_u8)

        # device-resident capacity: inputs already on device — the chip's
        # forward throughput with ingress factored out (what a host-attached
        # deployment with pipelined transfers approaches)
        import jax as _jax
        one_dev = _jax.device_put({k: v[:bs] for k, v in window.items()})
        fwd = pred._forward
        var = pred._variables
        p, pr = fwd(var, one_dev)
        _ = np.asarray(p)
        n_calls = max(N_UTT // bs, 1)
        # chain call i+1 on call i's probs (CLAUDE.md tunnel-timing rule:
        # the sync value must data-depend on the FULL window — an
        # unchained last-call sync can resolve before earlier dispatches)
        chain = _jax.jit(lambda b, prr: dict(
            b, waveform=b["waveform"] + 0.0 * prr.sum()))
        best = float("inf")
        for _ in range(BEST_OF):
            b_dev = one_dev
            t0 = time.perf_counter()
            for _ in range(n_calls):
                p, pr = fwd(var, b_dev)
                b_dev = chain(one_dev, pr)
            _ = np.asarray(p)                  # depends on every call
            best = min(best, time.perf_counter() - t0)
        upsc = n_calls * bs / best
        print(f"serve batch={bs:3d} {'device-resident':15s}: "
              f"{upsc:7.1f} utt/s/chip ({best/(n_calls*bs)*1e3:7.2f} "
              f"ms/utt, compute only)", flush=True)
        results.append({
            "batch": bs, "mode": "device-resident-compute",
            "param_dtype": pdt or "float32",
            "utt_per_sec_per_chip": round(upsc, 1),
            "ms_per_utt": round(best / (n_calls * bs) * 1e3, 2),
        })
    out = os.environ.get("SERVE_JSON")
    if out:
        import json
        with open(out, "w") as f:
            json.dump({"n_utt_per_window": N_UTT, "best_of": BEST_OF,
                       "results": results}, f, indent=1)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
