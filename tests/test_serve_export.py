"""Serving bundles (mme_tpu/serve.py export_bundle/load_bundle): the
deterministic forward serialized as a StableHLO artifact + raw weights,
re-served with NO model code.

The reference's deployment story is re-running eval notebooks against a
checkpoint inside the full training codebase (EvaluationScripts/
*_eval.ipynb); the bundle decouples serving from the framework entirely.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mme_tpu.serve import Predictor, export_bundle, load_bundle


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


def test_bundle_round_trip_matches_live_predictor(tmp_path, toy_params):
    rng = np.random.RandomState(0)
    x = rng.randn(11, 5).astype(np.float32)   # ragged: pad + chunk at b=4
    live = Predictor(toy_apply, toy_params, batch_size=4)
    p_live, pr_live = live({"x": x})

    bundle = tmp_path / "bundle"
    export_bundle(toy_apply, toy_params, {"x": x}, str(bundle),
                  batch_size=4, id2label={0: "neg", 1: "neu", 2: "pos"})
    served = load_bundle(str(bundle))
    p_exp, pr_exp = served({"x": x})

    np.testing.assert_array_equal(p_exp, p_live)
    np.testing.assert_allclose(pr_exp, pr_live, rtol=1e-6, atol=1e-7)
    assert served.batch_size == 4
    assert served.id2label == {0: "neg", 1: "neu", 2: "pos"}


def test_bundle_files_and_meta(tmp_path, toy_params):
    bundle = tmp_path / "b"
    x = np.zeros((2, 5), np.float32)
    export_bundle(toy_apply, toy_params, {"x": x}, str(bundle), batch_size=2)
    for name in ("forward.jaxexp", "params.npz", "meta.json"):
        assert os.path.exists(bundle / name), name
    meta = json.loads((bundle / "meta.json").read_text())
    assert meta["batch_size"] == 2
    assert meta["features"]["x"]["shape"] == [2, 5]
    assert meta["platforms"]  # records what the artifact was lowered for
    # every param leaf present with dtype+shape
    keys = {l["key"] for l in meta["leaves"]}
    assert keys == {"params/w", "params/b", "params/head"}


def test_bundle_preserves_bf16_leaves(tmp_path, toy_params):
    """bf16 weights survive the raw-bytes round trip (numpy can't name-
    resolve bfloat16 — the loader goes through ml_dtypes)."""
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), toy_params)
    x = np.ones((3, 5), np.float32)
    bundle = tmp_path / "bf16"
    export_bundle(toy_apply, params, {"x": x}, str(bundle), batch_size=4)
    served = load_bundle(str(bundle))
    live = Predictor(toy_apply, params, batch_size=4)
    p1, pr1 = live({"x": x})
    p2, pr2 = served({"x": x})
    np.testing.assert_array_equal(p2, p1)
    np.testing.assert_allclose(pr2, pr1, rtol=1e-5, atol=1e-6)


def test_bundle_cli_wiring(tmp_path, monkeypatch):
    """MME_EXPORT_BUNDLE on a real CLI run leaves a loadable bundle whose
    predictions agree with the checkpointed model on the test split."""
    bundle = tmp_path / "bundle"
    monkeypatch.setenv("MME_RUN_DIR", str(tmp_path))
    monkeypatch.setenv("MME_EXPORT_BUNDLE", str(bundle))
    from mme_tpu.cli import text_nn
    text_nn.main(["-d", "synthetic", "-e", "1", "-b", "8", "-y", "3",
                  "-s", "32"])
    served = load_bundle(str(bundle))
    n_feats = served.features
    batch = {k: np.zeros([3] + spec["shape"][1:],
                         dtype=np.dtype(spec["dtype"])
                         if spec["dtype"] != "bfloat16" else np.float32)
             for k, spec in n_feats.items()}
    preds, probs = served(batch)
    assert preds.shape == (3,)
    assert probs.shape[1] == 3
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)
