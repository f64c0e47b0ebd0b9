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
    for bs in batches:
        pred = Predictor(apply_fn, params, batch_size=bs,
                         param_dtype=param_dtype)
        window = {k: np.repeat(np.asarray(v), N_UTT, axis=0)
                  for k, v in example_tav_batch(spec, 1, 70, 96000).items()}
        one = {k: v[:bs] for k, v in window.items()}
        pred(one)                                      # compile
        best = float("inf")
        for _ in range(BEST_OF):
            t0 = time.perf_counter()
            preds, probs = pred(window)
            dt = time.perf_counter() - t0
            assert preds.shape == (N_UTT,) and probs.shape == (N_UTT, 7)
            best = min(best, dt)
        # request latency: a client submitting ONE batch-of-bs request at a
        # time (the Predictor's concurrency model IS synchronous chunking —
        # one jitted forward per chunk, host transfer per chunk); p50/p99
        # over repeated single-chunk calls, tail includes tunnel contention
        lats = []
        for _ in range(int(os.environ.get("SERVE_LAT_CALLS", "30"))):
            t0 = time.perf_counter()
            pred(one)
            lats.append(time.perf_counter() - t0)
        p50, p99 = np.percentile(lats, [50, 99])
        print(f"serve batch={bs:3d}"
              f"{' bf16-weights' if param_dtype else '':14s}: "
              f"{N_UTT/best:7.1f} utt/s/chip  ({best/N_UTT*1e3:.2f} ms/utt"
              f", request p50 {p50*1e3:.1f} ms / p99 {p99*1e3:.1f} ms)")
        results.append({
            "batch": bs, "param_dtype": pdt or "float32",
            "utt_per_sec_per_chip": round(N_UTT / best, 1),
            "ms_per_utt": round(best / N_UTT * 1e3, 2),
            "request_p50_ms": round(p50 * 1e3, 1),
            "request_p99_ms": round(p99 * 1e3, 1),
            "concurrency_model": "synchronous chunking",
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
