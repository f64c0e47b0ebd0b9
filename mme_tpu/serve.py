"""Batched inference serving: one compiled forward, padded ragged batches.

The reference has no inference path beyond re-running its eval notebooks
(``EvaluationScripts/*_eval.ipynb``); deployment means hand-loading a
checkpoint into the training model. Here serving is first-class and
TPU-shaped:

- ONE jitted program per batch shape: requests are padded up to the fixed
  ``batch_size`` (static shapes — no recompiles at serve time) and masked
  back out of the response;
- deterministic forward (no dropout/SpecAugment), params live on device
  once (``device_put``), softmax probabilities in fp32;
- works with any classifier ``apply_fn`` used by the CLIs (text / audio /
  TAV / image / ...), so a trained checkpoint serves with the exact same
  model code that trained it (restore via train/checkpoint.py).

Use: ``p = Predictor(apply_fn, params, batch_size=8); p(batch_dict)``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Predictor:
    """Fixed-shape batched predictor around a classifier ``apply_fn``.

    ``apply_fn(variables, batch, deterministic=True, rngs=None) -> logits``
    — the same callable the CLIs hand to ``run_classifier``. Models whose
    apply returns ``(logits, aux)`` (MoE) are unwrapped automatically.
    """

    def __init__(self, apply_fn: Callable, params: Any,
                 batch_size: int = 8, batch_stats: Any = None,
                 param_dtype: Any = None):
        """``param_dtype=jnp.bfloat16`` stores the weights bf16 on device —
        half the serving HBM (→ bigger batch), matmuls already run bf16
        under the compute-dtype specs; logits/probabilities stay fp32."""
        self.batch_size = int(batch_size)
        if param_dtype is not None:
            cast = lambda x: (x.astype(param_dtype)
                              if hasattr(x, "astype")
                              and jnp.issubdtype(
                                  jnp.asarray(x).dtype, jnp.floating)
                              else x)
            params = jax.tree.map(cast, params)
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        self._variables = jax.device_put(variables)

        def forward(variables, batch):
            logits = apply_fn(variables, batch, deterministic=True,
                              rngs=None)
            if isinstance(logits, tuple):
                logits = logits[0]
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            return jnp.argmax(logits, axis=-1), probs

        self._forward = jax.jit(forward)

    def _pad(self, arr: np.ndarray, n: int) -> np.ndarray:
        if arr.shape[0] == n:
            return arr
        pad = [(0, n - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
        return np.pad(arr, pad)

    def __call__(self, batch: Dict[str, Any]
                 ) -> Tuple[np.ndarray, np.ndarray]:
        """batch: dict of arrays with a common leading dim ≤ batch_size
        (larger inputs are chunked). Returns (preds [N], probs [N, C])."""
        n = len(next(iter(batch.values())))
        preds, probs = [], []
        for lo in range(0, n, self.batch_size):
            hi = min(lo + self.batch_size, n)
            chunk = {k: self._pad(np.asarray(v[lo:hi]), self.batch_size)
                     for k, v in batch.items()}
            p, pr = self._forward(self._variables, chunk)
            preds.append(np.asarray(p)[: hi - lo])
            probs.append(np.asarray(pr)[: hi - lo])
        return np.concatenate(preds), np.concatenate(probs)

    def predict_dataset(self, dataset, id2label: Optional[Dict[int, str]]
                        = None, batch_transform: Optional[Callable] = None,
                        rng: Optional[jax.Array] = None):
        """Predict an ArrayDataset (data/dataset.py); yields dict rows
        (serving-log shaped: index, pred, label name, prob vector).

        Streams in ``batch_size`` chunks — the transform (e.g. uint8 video
        normalization) runs per chunk, so only one fixed-shape batch is
        ever resident on device, never the whole split."""
        feats = dataset.features
        n = len(dataset)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        for lo in range(0, n, self.batch_size):
            hi = min(lo + self.batch_size, n)
            chunk = {k: np.asarray(v[lo:hi]) for k, v in feats.items()}
            if batch_transform is not None:
                rng, sub = jax.random.split(rng)
                chunk = batch_transform(sub, {k: jnp.asarray(v)
                                              for k, v in chunk.items()})
                chunk = {k: np.asarray(v) for k, v in chunk.items()}
            preds, probs = self(chunk)
            for i in range(hi - lo):
                row = {"index": lo + i, "pred": int(preds[i]),
                       "probs": [round(float(x), 6) for x in probs[i]]}
                if id2label:
                    row["label"] = id2label.get(int(preds[i]),
                                                str(preds[i]))
                yield row
