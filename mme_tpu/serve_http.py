"""Stdlib HTTP serving daemon around the batched predictors.

The reference's only "serving" is re-running its eval notebooks
(``EvaluationScripts/*_eval.ipynb``); ``mme_tpu.serve`` already gives a
batched fixed-shape ``Predictor`` and model-code-free StableHLO bundles —
this module puts either behind a dependency-free HTTP endpoint
(``http.server`` only; nothing to install in a hermetic image):

    POST /predict   {"instances": [{<feature>: nested-list, ...}, ...]}
                 →  {"predictions": [{"pred": i, "label": "joy"?,
                                      "probs": [...]}, ...]}
    GET  /healthz   {"status": "ok", "batch_size": N, ...}

Concurrency model (stated, as BASELINE.md's serving table requires):
**synchronous chunking** — the ThreadingHTTPServer accepts requests
concurrently, but a lock serializes device work; each request's batch is
padded/chunked to the predictor's fixed batch size (one jitted forward
per chunk, no recompiles at serve time). uint8 video requests are
supported end-to-end (the Predictor normalizes on device — 4× fewer
request bytes than fp32, the measured ingress bottleneck).

CLI: ``python -m mme_tpu.cli.serve --bundle DIR --port 8000``
(cli/serve.py; ``--bundle`` is an ``export_bundle`` directory, the
deployment artifact run_classifier writes under ``MME_EXPORT_BUNDLE``).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Callable, Dict, Optional

import numpy as np

# JSON carries no dtype; coerce the python defaults onto the device-side
# convention (fp32 activations, int32 ids/masks) unless the feature spec
# (bundle meta) says otherwise.
_DEFAULT_CASTS = {"float64": "float32", "int64": "int32"}


class PredictionService:
    """JSON ↔ predictor adapter shared by the HTTP handler and tests.

    ``predictor``: a ``serve.Predictor`` or ``serve.ExportedPredictor``
    (anything callable as ``predictor(batch) -> (preds, probs)`` with a
    ``batch_size`` attribute). ``feature_spec``: optional
    ``{name: {"dtype": ..., "shape": [...]}}`` — the bundle's meta — used
    to cast and validate instances; without it, only the default
    float64→float32 / int64→int32 coercions apply."""

    def __init__(self, predictor: Callable, *,
                 id2label: Optional[Dict[int, str]] = None,
                 feature_spec: Optional[Dict[str, Any]] = None):
        self.predictor = predictor
        self.id2label = id2label
        self.feature_spec = feature_spec
        self._lock = threading.Lock()

    def _to_batch(self, instances) -> Dict[str, np.ndarray]:
        if not instances:
            raise ValueError("empty instances")
        keys = set(instances[0].keys())
        for i, inst in enumerate(instances):
            if set(inst.keys()) != keys:
                raise ValueError(
                    f"instance {i} keys {sorted(inst.keys())} != "
                    f"instance 0 keys {sorted(keys)}")
        from mme_tpu.serve import Predictor
        live = isinstance(self.predictor, Predictor)
        batch = {}
        for k in keys:
            arr = np.asarray([inst[k] for inst in instances])
            # JSON has no uint8: integer-valued video in [0, 255] IS the
            # uint8 request — against a live Predictor it stays raw and
            # normalizes on device; a StableHLO bundle's artifact is
            # fixed-dtype fp32-normalized, which raw pixels cannot
            # satisfy, so there it's a request error, not a silent cast
            if k == "video" and np.issubdtype(arr.dtype, np.integer):
                if arr.min() < 0 or arr.max() > 255:
                    raise ValueError(
                        "integer video values outside [0, 255]")
                if live:
                    arr = arr.astype(np.uint8)
                else:
                    raise ValueError(
                        "this bundle expects ImageNet-normalized float "
                        "video; integer pixel requests need a live "
                        "Predictor service (it normalizes on device)")
            if self.feature_spec is not None:
                spec = self.feature_spec.get(k)
                if spec is None:
                    raise ValueError(f"unknown feature {k!r}")
                want_shape = tuple(spec["shape"][1:])
                if arr.shape[1:] != want_shape:
                    raise ValueError(
                        f"feature {k!r}: shape {arr.shape[1:]} != "
                        f"expected {want_shape}")
                want = spec["dtype"]
                keep_u8 = (arr.dtype.name == "uint8" and want == "float32"
                           and live)
                if not keep_u8:
                    arr = arr.astype(want)
            if arr.dtype.name in _DEFAULT_CASTS:
                arr = arr.astype(_DEFAULT_CASTS[arr.dtype.name])
            batch[k] = arr
        return batch

    def predict_json(self, payload: Dict[str, Any]) -> Dict[str, Any]:
        instances = payload.get("instances")
        if not isinstance(instances, list):
            raise ValueError('payload must be {"instances": [...]}')
        batch = self._to_batch(instances)
        with self._lock:                 # synchronous chunking
            preds, probs = self.predictor(batch)
        out = []
        for i in range(len(instances)):
            row: Dict[str, Any] = {
                "pred": int(preds[i]),
                "probs": [round(float(x), 6) for x in probs[i]]}
            if self.id2label:
                row["label"] = self.id2label.get(int(preds[i]),
                                                 str(int(preds[i])))
            out.append(row)
        return {"predictions": out}

    def health(self) -> Dict[str, Any]:
        info: Dict[str, Any] = {"status": "ok",
                                "batch_size": self.predictor.batch_size,
                                "concurrency": "synchronous chunking"}
        if self.feature_spec is not None:
            info["features"] = self.feature_spec
        return info


def _make_handler(service: PredictionService):
    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, obj: Dict[str, Any]) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, service.health())
            else:
                self._reply(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            if self.path != "/predict":
                self._reply(404, {"error": f"no route {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(n))
                self._reply(200, service.predict_json(payload))
            except ValueError as e:
                self._reply(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — surface, don't crash
                self._reply(500, {"error": repr(e)})

        def log_message(self, fmt, *args):   # quiet by default
            pass

    return Handler


def make_server(service: PredictionService, host: str = "127.0.0.1",
                port: int = 0) -> ThreadingHTTPServer:
    """Bind (port 0 → ephemeral; read ``server.server_address``).
    Run with ``server.serve_forever()`` / stop with ``shutdown()``."""
    return ThreadingHTTPServer((host, port), _make_handler(service))


def serve_bundle(bundle_dir: str, host: str = "0.0.0.0",
                 port: int = 8000) -> ThreadingHTTPServer:
    """Service a StableHLO bundle directory (no model code involved)."""
    from mme_tpu.serve import load_bundle

    pred = load_bundle(bundle_dir)
    service = PredictionService(pred, id2label=pred.id2label,
                                feature_spec=pred.features)
    return make_server(service, host, port)
