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

    for bs in batches:
        pred = Predictor(apply_fn, params, batch_size=bs,
                         param_dtype=param_dtype)
        window = {k: np.repeat(np.asarray(v), N_UTT, axis=0)
                  for k, v in example_tav_batch(spec, 1, 70, 96000).items()}
        pred({k: v[:bs] for k, v in window.items()})   # compile
        best = float("inf")
        for _ in range(BEST_OF):
            t0 = time.perf_counter()
            preds, probs = pred(window)
            dt = time.perf_counter() - t0
            assert preds.shape == (N_UTT,) and probs.shape == (N_UTT, 7)
            best = min(best, dt)
        print(f"serve batch={bs:3d}"
              f"{' bf16-weights' if param_dtype else '':14s}: "
              f"{N_UTT/best:7.1f} utt/s/chip  ({best/N_UTT*1e3:.2f} ms/utt)")


if __name__ == "__main__":
    main()
