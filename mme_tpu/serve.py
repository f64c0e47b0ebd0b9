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

import json
import os
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _pad_rows(arr: np.ndarray, n: int) -> np.ndarray:
    if arr.shape[0] == n:
        return arr
    pad = [(0, n - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad)


def _batched_call(forward: Callable, variables: Any,
                  batch: Dict[str, Any], batch_size: int,
                  prepare_chunk: Optional[Callable] = None
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Pad ragged requests up to ``batch_size`` fixed-shape chunks, run
    ``forward(variables, chunk)`` and mask the padding back out.
    ``prepare_chunk``: optional chunk transform (e.g. device_put with a
    dp sharding for mesh serving)."""
    n = len(next(iter(batch.values())))
    preds, probs = [], []
    for lo in range(0, n, batch_size):
        hi = min(lo + batch_size, n)
        chunk = {k: _pad_rows(np.asarray(v[lo:hi]), batch_size)
                 for k, v in batch.items()}
        if prepare_chunk is not None:
            chunk = prepare_chunk(chunk)
        p, pr = forward(variables, chunk)
        preds.append(np.asarray(p)[: hi - lo])
        probs.append(np.asarray(pr)[: hi - lo])
    return np.concatenate(preds), np.concatenate(probs)


class Predictor:
    """Fixed-shape batched predictor around a classifier ``apply_fn``.

    ``apply_fn(variables, batch, deterministic=True, rngs=None) -> logits``
    — the same callable the CLIs hand to ``run_classifier``. Models whose
    apply returns ``(logits, aux)`` (MoE) are unwrapped automatically.
    """

    def __init__(self, apply_fn: Callable, params: Any,
                 batch_size: int = 8, batch_stats: Any = None,
                 param_dtype: Any = None, mesh: Any = None,
                 batch_axis: str = "dp"):
        """``param_dtype=jnp.bfloat16`` stores the weights bf16 on device —
        half the serving HBM (→ bigger batch), matmuls already run bf16
        under the compute-dtype specs; logits/probabilities stay fp32.

        ``mesh``: serve across chips — params replicate over the mesh and
        every fixed-shape chunk shards its batch dim along ``batch_axis``
        (XLA SPMD splits the forward; each chip computes batch_size/dp
        rows). Same recipe as training's dp (parallel/mesh.py); batch_size
        must divide the axis."""
        self.batch_size = int(batch_size)
        self._mesh = mesh
        self._chunk_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            assert self.batch_size % mesh.shape[batch_axis] == 0, (
                f"batch_size {batch_size} not divisible by "
                f"{batch_axis}={mesh.shape[batch_axis]}")
            self._chunk_sharding = NamedSharding(mesh, P(batch_axis))
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
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            rep = NamedSharding(mesh, P())
            self._variables = jax.tree.map(
                lambda x: jax.device_put(x, rep), variables)
        else:
            self._variables = jax.device_put(variables)

        def forward(variables, batch):
            v = batch.get("video") if isinstance(batch, dict) else None
            if v is not None and jnp.asarray(v).dtype == jnp.uint8:
                # uint8 video ingress: clients ship 4× fewer bytes over
                # the serving link (the measured bottleneck through a
                # network-attached chip) and the ImageNet normalization
                # runs on device — same math as the training transform
                # (train/build_tav.py::make_video_keep_transform),
                # including all-zero pad frames mapping back to exact 0.0
                from mme_tpu.data.records import IMAGENET_MEAN, IMAGENET_STD
                v = jnp.asarray(v)
                valid = (v.reshape(v.shape[0], v.shape[1], -1).max(axis=-1)
                         > 0)
                vf = ((v.astype(jnp.float32) / 255.0
                       - jnp.asarray(IMAGENET_MEAN, jnp.float32))
                      / jnp.asarray(IMAGENET_STD, jnp.float32))
                batch = dict(batch)
                batch["video"] = vf * valid[:, :, None, None, None]
            logits = apply_fn(variables, batch, deterministic=True,
                              rngs=None)
            if isinstance(logits, tuple):
                logits = logits[0]
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            return jnp.argmax(logits, axis=-1), probs

        self._forward = jax.jit(forward)

    def _pad(self, arr: np.ndarray, n: int) -> np.ndarray:
        return _pad_rows(arr, n)

    def __call__(self, batch: Dict[str, Any]
                 ) -> Tuple[np.ndarray, np.ndarray]:
        """batch: dict of arrays with a common leading dim ≤ batch_size
        (larger inputs are chunked). Returns (preds [N], probs [N, C])."""
        prepare = None
        if self._chunk_sharding is not None:
            prepare = lambda c: jax.tree.map(
                lambda x: jax.device_put(x, self._chunk_sharding), c)
        return _batched_call(self._forward, self._variables, batch,
                             self.batch_size, prepare)

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


# ---------------------------------------------------------------------------
# Model-code-free serving bundles (jax.export / StableHLO)
# ---------------------------------------------------------------------------
# The reference's only deployment story is re-running its eval notebooks
# against a checkpoint loaded into the full training codebase
# (EvaluationScripts/*_eval.ipynb). A bundle decouples serving from the
# framework: the deterministic forward is serialized as a versioned
# StableHLO artifact (jax.export) next to the raw weights, and
# load_bundle() rebuilds a Predictor-shaped callable from the two files
# alone — no model classes, config system, or checkpoint manager on the
# serving host, and the artifact is compiled by whatever XLA backs that
# host (TPU or CPU; export with platforms=("tpu", "cpu") for both).

_BUNDLE_FORWARD = "forward.jaxexp"
_BUNDLE_PARAMS = "params.npz"
_BUNDLE_META = "meta.json"


def _plain_mappings(tree: Any) -> Any:
    """Variables trees are nested string-keyed mappings (dict/FrozenDict)
    with array leaves; normalize every container to a plain dict so the
    exported in_tree is reconstructible without flax on the serving host."""
    if hasattr(tree, "items"):
        return {str(k): _plain_mappings(v) for k, v in tree.items()}
    return tree


def _flatten_mapping(tree: Any, prefix: str = ""):
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from _flatten_mapping(tree[k], f"{prefix}/{k}" if prefix
                                        else k)
    else:
        yield prefix, np.asarray(tree)


def _np_dtype(name: str) -> np.dtype:
    try:
        return np.dtype(name)
    except TypeError:
        import ml_dtypes  # bfloat16 & friends aren't name-registered
        return np.dtype(getattr(ml_dtypes, name))


def export_bundle(apply_fn: Callable, params: Any,
                  example_batch: Dict[str, Any], path: str, *,
                  batch_size: int = 8, batch_stats: Any = None,
                  id2label: Optional[Dict[int, str]] = None,
                  platforms: Optional[Tuple[str, ...]] = None) -> None:
    """Write a standalone serving bundle directory.

    ``example_batch`` fixes the feature spec (shapes beyond the leading
    dim, dtypes); serving requests are padded/chunked to ``batch_size``
    exactly like :class:`Predictor`. ``platforms``: lowering targets
    (default: the current backend), e.g. ``("tpu", "cpu")``.
    """
    from jax import export as jexport

    batch_size = int(batch_size)
    variables = _plain_mappings(
        {"params": params} if batch_stats is None
        else {"params": params, "batch_stats": batch_stats})

    def forward(variables, batch):
        logits = apply_fn(variables, batch, deterministic=True, rngs=None)
        if isinstance(logits, tuple):
            logits = logits[0]
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.argmax(logits, axis=-1), probs

    feats = {k: _pad_rows(np.asarray(v)[:batch_size], batch_size)
             for k, v in example_batch.items()}
    var_spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        variables)
    batch_spec = {k: jax.ShapeDtypeStruct(v.shape, v.dtype)
                  for k, v in feats.items()}
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    # the flash-attention Pallas kernel lowers to a TPU custom call, which
    # jax.export flags as non-portable by default; serving artifacts are
    # rebuilt per release, so pin-to-libtpu compatibility is acceptable
    exp = jexport.export(
        jax.jit(forward),
        disabled_checks=[jexport.DisabledSafetyCheck.custom_call(
            "tpu_custom_call")],
        **kwargs)(var_spec, batch_spec)

    manifest, arrays = [], {}
    for i, (key, arr) in enumerate(_flatten_mapping(variables)):
        arrays[f"leaf_{i}"] = np.frombuffer(arr.tobytes(), np.uint8)
        manifest.append({"key": key, "shape": list(arr.shape),
                         "dtype": arr.dtype.name})
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _BUNDLE_FORWARD), "wb") as fh:
        fh.write(exp.serialize())
    np.savez(os.path.join(path, _BUNDLE_PARAMS), **arrays)
    meta = {
        "batch_size": batch_size,
        "platforms": list(exp.platforms),
        "id2label": ({str(k): v for k, v in id2label.items()}
                     if id2label else None),
        "features": {k: {"shape": list(v.shape), "dtype": v.dtype.name}
                     for k, v in feats.items()},
        "leaves": manifest,
    }
    with open(os.path.join(path, _BUNDLE_META), "w") as fh:
        json.dump(meta, fh, indent=1)


def load_bundle(path: str) -> "ExportedPredictor":
    """Rebuild a serving callable from an :func:`export_bundle` directory."""
    return ExportedPredictor(path)


class ExportedPredictor:
    """Predictor-shaped callable over a serialized bundle: same pad/chunk
    request handling, but the forward comes from the StableHLO artifact —
    no model code involved."""

    def __init__(self, path: str):
        from jax import export as jexport

        with open(os.path.join(path, _BUNDLE_META)) as fh:
            meta = json.load(fh)
        self.batch_size = int(meta["batch_size"])
        self.platforms = tuple(meta["platforms"])
        self.features = meta["features"]
        self.id2label = ({int(k): v for k, v in meta["id2label"].items()}
                         if meta.get("id2label") else None)
        with open(os.path.join(path, _BUNDLE_FORWARD), "rb") as fh:
            exp = jexport.deserialize(fh.read())
        npz = np.load(os.path.join(path, _BUNDLE_PARAMS))
        variables: Dict[str, Any] = {}
        for i, leaf in enumerate(meta["leaves"]):
            arr = np.frombuffer(
                npz[f"leaf_{i}"].tobytes(),
                _np_dtype(leaf["dtype"])).reshape(leaf["shape"])
            node = variables
            *parents, last = leaf["key"].split("/")
            for p in parents:
                node = node.setdefault(p, {})
            node[last] = arr
        self._variables = jax.device_put(variables)
        self._forward = jax.jit(exp.call)

    def __call__(self, batch: Dict[str, Any]
                 ) -> Tuple[np.ndarray, np.ndarray]:
        return _batched_call(self._forward, self._variables, batch,
                             self.batch_size)
