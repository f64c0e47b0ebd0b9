"""HTTP serving daemon (mme_tpu/serve_http.py): Predictor / StableHLO
bundle behind a stdlib http.server endpoint — POST /predict, GET /healthz,
JSON in/out, synchronous-chunking concurrency."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax.numpy as jnp

from mme_tpu.serve import Predictor, export_bundle
from mme_tpu.serve_http import PredictionService, make_server, serve_bundle


def toy_apply(variables, batch, deterministic=True, rngs=None):
    h = batch["x"] @ variables["params"]["w"] + variables["params"]["b"]
    return jnp.tanh(h) @ variables["params"]["head"]


@pytest.fixture(scope="module")
def toy_params():
    rng = np.random.RandomState(7)
    return {
        "w": jnp.asarray(rng.randn(5, 16).astype(np.float32)),
        "b": jnp.asarray(rng.randn(16).astype(np.float32)),
        "head": jnp.asarray(rng.randn(16, 3).astype(np.float32)),
    }


def _post(url, obj):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def _serve(server):
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    host, port = server.server_address[:2]
    return f"http://{host}:{port}"


def test_http_predict_matches_direct(toy_params):
    pred = Predictor(toy_apply, toy_params, batch_size=4)
    service = PredictionService(pred, id2label={0: "neg", 1: "neu",
                                                2: "pos"})
    server = make_server(service)
    try:
        url = _serve(server)
        health = json.loads(urllib.request.urlopen(f"{url}/healthz").read())
        assert health["status"] == "ok" and health["batch_size"] == 4
        assert health["concurrency"] == "synchronous chunking"

        rng = np.random.RandomState(0)
        x = rng.randn(6, 5).astype(np.float32)   # 6 = pad + chunk at 4
        out = _post(f"{url}/predict",
                    {"instances": [{"x": row.tolist()} for row in x]})
        preds_direct, probs_direct = pred({"x": x})
        got = out["predictions"]
        assert [r["pred"] for r in got] == [int(p) for p in preds_direct]
        np.testing.assert_allclose(
            np.asarray([r["probs"] for r in got]), probs_direct, atol=1e-5)
        assert got[0]["label"] in ("neg", "neu", "pos")
    finally:
        server.shutdown()


def test_http_bundle_service_and_errors(tmp_path, toy_params):
    rng = np.random.RandomState(1)
    x = rng.randn(4, 5).astype(np.float32)
    bundle = tmp_path / "bundle"
    export_bundle(toy_apply, toy_params, {"x": x}, str(bundle),
                  batch_size=4, id2label={0: "neg", 1: "neu", 2: "pos"})
    server = serve_bundle(str(bundle), host="127.0.0.1", port=0)
    try:
        url = _serve(server)
        # float64 JSON payloads cast onto the spec dtype (fp32)
        out = _post(f"{url}/predict",
                    {"instances": [{"x": [0.1, 0.2, 0.3, 0.4, 0.5]}]})
        assert len(out["predictions"]) == 1
        assert set(out["predictions"][0]) == {"pred", "probs", "label"}

        # wrong shape → 400 with a message, server stays up
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(f"{url}/predict", {"instances": [{"x": [1.0, 2.0]}]})
        assert ei.value.code == 400
        assert "shape" in json.loads(ei.value.read())["error"]

        # unknown feature → 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(f"{url}/predict", {"instances": [{"nope": [1.0]}]})
        assert ei.value.code == 400

        # malformed route → 404
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(f"{url}/elsewhere", {})
        assert ei.value.code == 404

        # still healthy after the errors
        health = json.loads(urllib.request.urlopen(f"{url}/healthz").read())
        assert health["status"] == "ok" and "x" in health["features"]
    finally:
        server.shutdown()


def test_http_concurrent_requests(toy_params):
    """ThreadingHTTPServer + the service lock: concurrent clients all get
    correct answers (device work serialized — the stated model)."""
    pred = Predictor(toy_apply, toy_params, batch_size=4)
    server = make_server(PredictionService(pred))
    try:
        url = _serve(server)
        rng = np.random.RandomState(2)
        xs = [rng.randn(3, 5).astype(np.float32) for _ in range(6)]
        want = [[int(p) for p in pred({"x": x})[0]] for x in xs]
        got = [None] * len(xs)

        def worker(i):
            out = _post(f"{url}/predict",
                        {"instances": [{"x": r.tolist()} for r in xs[i]]})
            got[i] = [r["pred"] for r in out["predictions"]]

        ts = [threading.Thread(target=worker, args=(i,))
              for i in range(len(xs))]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert got == want
    finally:
        server.shutdown()


def test_http_integer_video_routes_to_uint8_normalization():
    """JSON has no uint8 — integer video in [0, 255] over HTTP must reach
    the live Predictor as uint8 (on-device ImageNet normalization) and
    match a client that pre-normalized to fp32; out-of-range ints are a
    400 (code-review r5 fix: they previously cast to int32 silently)."""
    from mme_tpu.data.records import IMAGENET_MEAN, IMAGENET_STD

    rng = np.random.RandomState(9)
    T, S = 2, 4
    w = rng.randn(T * S * S * 3, 3).astype(np.float32)

    def video_apply(variables, batch, deterministic=True, rngs=None):
        v = batch["video"].reshape(batch["video"].shape[0], -1)
        return v @ variables["params"]["w"]

    pred = Predictor(video_apply, {"w": jnp.asarray(w)}, batch_size=4)
    server = make_server(PredictionService(pred))
    try:
        url = _serve(server)
        vid = rng.randint(1, 256, (2, T, S, S, 3))
        out_int = _post(f"{url}/predict", {"instances": [
            {"video": v.tolist()} for v in vid]})
        vf = ((vid.astype(np.float32) / 255.0
               - np.asarray(IMAGENET_MEAN, np.float32))
              / np.asarray(IMAGENET_STD, np.float32))
        out_f32 = _post(f"{url}/predict", {"instances": [
            {"video": v.tolist()} for v in vf]})
        assert [r["pred"] for r in out_int["predictions"]] == \
            [r["pred"] for r in out_f32["predictions"]]
        np.testing.assert_allclose(
            np.asarray([r["probs"] for r in out_int["predictions"]]),
            np.asarray([r["probs"] for r in out_f32["predictions"]]),
            atol=1e-4)

        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(f"{url}/predict",
                  {"instances": [{"video": (vid[0] + 300).tolist()}]})
        assert ei.value.code == 400
        assert "outside" in json.loads(ei.value.read())["error"]
    finally:
        server.shutdown()
