"""Serving path (mme_tpu/serve.py): padded fixed-shape batched inference.

Covers: pad/chunk correctness vs a direct forward, MoE tuple unwrap, and
the MME_PREDICT_OUT CLI wiring end-to-end."""

import json

import numpy as np

import jax
import jax.numpy as jnp

from mme_tpu.serve import Predictor


def toy_apply(variables, batch, deterministic=True, rngs=None):
    return batch["x"] @ variables["params"]["w"]


def test_predictor_pad_and_chunk_matches_direct():
    rng = np.random.RandomState(0)
    w = rng.randn(5, 3).astype(np.float32)
    x = rng.randn(11, 5).astype(np.float32)   # 11 = 8 + 3 → pad + chunk
    pred = Predictor(toy_apply, {"w": jnp.asarray(w)}, batch_size=8)
    preds, probs = pred({"x": x})
    ref_logits = x @ w
    np.testing.assert_array_equal(preds, ref_logits.argmax(-1))
    ref_probs = np.asarray(jax.nn.softmax(jnp.asarray(ref_logits), axis=-1))
    np.testing.assert_allclose(probs, ref_probs, rtol=1e-5, atol=1e-6)
    assert preds.shape == (11,) and probs.shape == (11, 3)


def test_predictor_unwraps_aux_tuple():
    w = np.eye(4, 2, dtype=np.float32)

    def moe_like_apply(variables, batch, deterministic=True, rngs=None):
        return batch["x"] @ variables["params"]["w"], jnp.asarray(0.5)

    pred = Predictor(moe_like_apply, {"w": jnp.asarray(w)}, batch_size=4)
    preds, probs = pred({"x": np.ones((2, 4), np.float32)})
    assert preds.shape == (2,) and probs.shape == (2, 2)


def test_predictor_bf16_weights_close_to_fp32():
    import jax.numpy as jnp

    rng = np.random.RandomState(1)
    w = rng.randn(16, 5).astype(np.float32)
    x = rng.randn(6, 16).astype(np.float32)
    full = Predictor(toy_apply, {"w": jnp.asarray(w)}, batch_size=8)
    half = Predictor(toy_apply, {"w": jnp.asarray(w)}, batch_size=8,
                     param_dtype=jnp.bfloat16)
    p1, pr1 = full({"x": x})
    p2, pr2 = half({"x": x})
    # bf16 weights: same argmax on all but near-ties, probs within ~1%
    np.testing.assert_allclose(pr2, pr1, atol=0.02)


def test_predict_out_cli_wiring(tmp_path, monkeypatch):
    """text_nn with MME_PREDICT_OUT leaves a JSONL serving log whose rows
    agree with the test-split size and the label map."""
    out = tmp_path / "predictions.jsonl"
    monkeypatch.setenv("MME_RUN_DIR", str(tmp_path))
    monkeypatch.setenv("MME_PREDICT_OUT", str(out))
    from mme_tpu.cli import text_nn
    summary = text_nn.main(["-d", "synthetic", "-e", "1", "-b", "8",
                            "-y", "3", "-s", "32"])
    rows = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r["pred"] < 3
        assert len(r["probs"]) == 3
        assert abs(sum(r["probs"]) - 1.0) < 1e-3
        assert "label" in r
    assert np.isfinite(summary["test/loss"])


def test_predictor_uint8_video_ingress_matches_fp32():
    """uint8 video requests normalize ON DEVICE (ImageNet stats, zero pad
    frames stay exact 0.0 — same math as the training transform) and must
    predict identically to a client that pre-normalized to fp32. 4x less
    ingress over the serving link (round 5)."""
    from mme_tpu.data.records import IMAGENET_MEAN, IMAGENET_STD

    rng = np.random.RandomState(3)
    B, T, S = 5, 2, 4
    vid_u8 = rng.randint(0, 256, (B, T, S, S, 3)).astype(np.uint8)
    vid_u8[1, 1] = 0                         # an all-zero pad frame
    w = rng.randn(T * S * S * 3, 3).astype(np.float32)

    def video_apply(variables, batch, deterministic=True, rngs=None):
        v = batch["video"].reshape(batch["video"].shape[0], -1)
        return v @ variables["params"]["w"]

    vf = (vid_u8.astype(np.float32) / 255.0
          - np.asarray(IMAGENET_MEAN, np.float32)) \
        / np.asarray(IMAGENET_STD, np.float32)
    valid = vid_u8.reshape(B, T, -1).max(-1) > 0
    vf = vf * valid[:, :, None, None, None]

    pred = Predictor(video_apply, {"w": jnp.asarray(w)}, batch_size=4)
    p_u8, pr_u8 = pred({"video": vid_u8})
    p_f32, pr_f32 = pred({"video": vf.astype(np.float32)})
    np.testing.assert_array_equal(p_u8, p_f32)
    np.testing.assert_allclose(pr_u8, pr_f32, rtol=1e-5, atol=1e-6)


def test_predictor_mesh_dp_matches_single_device():
    """Mesh serving (round 5): params replicated over a dp mesh, every
    fixed-shape chunk batch-sharded along "dp" — XLA SPMD splits the
    forward across chips; predictions must equal the single-device
    Predictor's."""
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < 4:
        import pytest
        pytest.skip("needs the virtual 8-device CPU mesh")
    mesh = Mesh(np.asarray(devs[:4]), ("dp",))

    rng = np.random.RandomState(5)
    w = rng.randn(5, 3).astype(np.float32)
    x = rng.randn(11, 5).astype(np.float32)   # pad + chunk at 8
    single = Predictor(toy_apply, {"w": jnp.asarray(w)}, batch_size=8)
    sharded = Predictor(toy_apply, {"w": jnp.asarray(w)}, batch_size=8,
                        mesh=mesh)
    p_s, pr_s = single({"x": x})
    p_m, pr_m = sharded({"x": x})
    np.testing.assert_array_equal(p_m, p_s)
    np.testing.assert_allclose(pr_m, pr_s, rtol=1e-6, atol=1e-7)
    # the chunk really is dp-sharded: 8 % 4 == 0 enforced
    import pytest
    with pytest.raises(AssertionError):
        Predictor(toy_apply, {"w": jnp.asarray(w)}, batch_size=6,
                  mesh=mesh)
