"""Round-3 code-review regression tests:

1. fused_mlp backward returns the fc2-bias gradient in b2's dtype (fp32
   biases on the mixed-precision path must not come back bfloat16);
2. split_dataframe never folds an official held-out partition back into
   training — a missing val (or test) partition is carved out of the
   official TRAIN rows only;
3. label_names: an explicit --label_task beats dataset-name sniffing
   (MUStARD++ also ships emotion/sentiment annotations);
4. pipeline dropout keys fold the dp coordinate — identical rows placed
   in different dp shards of the same microbatch must not share a mask;
5. CheckpointManager GC is disabled in multi-process mode (the pid
   liveness probe is host-local; another host's in-flight save on a
   shared directory must not be deleted).
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest


# ---- 1. fused_mlp bias-grad dtypes ------------------------------------------

def test_fused_mlp_bias_grads_keep_param_dtype():
    from mme_tpu.ops.fused_mlp import _fused_mlp_pallas

    N, H, F = 16, 8, 16
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, H), jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(H, F) * 0.1, jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(F, H) * 0.1, jnp.bfloat16)
    b1 = jnp.asarray(rng.randn(F) * 0.1, jnp.float32)   # fp32 biases
    b2 = jnp.asarray(rng.randn(H) * 0.1, jnp.float32)

    def loss(args):
        x, w1, b1, w2, b2 = args
        return _fused_mlp_pallas(x, w1, b1, w2, b2, "gelu", True).astype(
            jnp.float32).sum()

    grads = jax.grad(loss)((x, w1, b1, w2, b2))
    dtypes = [g.dtype for g in grads]
    assert dtypes == [jnp.bfloat16, jnp.bfloat16, jnp.float32,
                      jnp.bfloat16, jnp.float32], dtypes


# ---- 2. split_dataframe keeps official held-out rows -------------------------

def _df(n_train=40, n_val=0, n_test=20):
    rows = []
    for split, n in (("train", n_train), ("val", n_val), ("test", n_test)):
        for i in range(n):
            rows.append({"label": i % 2, "split": split, "rowid": len(rows)})
    return pd.DataFrame(rows)


def test_split_missing_val_carved_from_train_only():
    from mme_tpu.data.records import PickleDatasetConfig, split_dataframe

    df = _df(n_train=40, n_val=0, n_test=20)
    cfg = PickleDatasetConfig(label_col="label")
    tr, va, te = split_dataframe(df, cfg)
    official_test = set(df[df["split"] == "test"]["rowid"])
    assert set(te["rowid"]) == official_test           # test untouched
    assert len(va) > 0 and set(va["rowid"]).isdisjoint(official_test)
    assert set(tr["rowid"]).isdisjoint(official_test)  # no leakage
    assert set(tr["rowid"]) | set(va["rowid"]) == \
        set(df[df["split"] == "train"]["rowid"])


def test_split_missing_test_carved_from_train_only():
    from mme_tpu.data.records import PickleDatasetConfig, split_dataframe

    df = _df(n_train=40, n_val=20, n_test=0)
    cfg = PickleDatasetConfig(label_col="label")
    tr, va, te = split_dataframe(df, cfg)
    official_val = set(df[df["split"] == "val"]["rowid"])
    assert set(va["rowid"]) == official_val
    assert len(te) > 0 and set(te["rowid"]).isdisjoint(official_val)
    assert set(tr["rowid"]) | set(te["rowid"]) == \
        set(df[df["split"] == "train"]["rowid"])


def test_split_train_only_still_resplits():
    from mme_tpu.data.records import PickleDatasetConfig, split_dataframe

    df = _df(n_train=40, n_val=0, n_test=0)
    cfg = PickleDatasetConfig(label_col="label")
    tr, va, te = split_dataframe(df, cfg)
    assert len(tr) > 0 and len(va) > 0 and len(te) > 0


# ---- 3. label_names precedence -----------------------------------------------

def test_label_task_beats_dataset_sniffing():
    from mme_tpu.cli.common import label_names

    # MUStARD++ pickle, explicit 7-class emotion task: MELD emotion names,
    # NOT [not_sarcastic, sarcastic, class_2, ...]
    names = label_names("data/mustard.pkl", "emotion", 7)
    assert names[0] == "neutral" and "sarcastic" not in names.values()
    # explicit sarcasm task still wins everywhere
    names = label_names("data/meld.pkl", "sarcasm", 2)
    assert names == {0: "not_sarcastic", 1: "sarcastic"}
    # default binary emotion on a mustard pickle keeps the sarcasm map
    names = label_names("data/mustard.pkl", "emotion", 2)
    assert names == {0: "not_sarcastic", 1: "sarcastic"}


# ---- 4. pipeline dropout diversity across dp ----------------------------------

def test_pipeline_dropout_differs_across_dp_shards():
    from jax.sharding import Mesh
    from mme_tpu.models.layers import EncoderSpec, TransformerEncoder
    from mme_tpu.parallel.pipeline import pipeline_encoder_apply

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    spec = EncoderSpec(layers=2, hidden=32, heads=2, intermediate=64,
                       dropout=0.5)
    enc = TransformerEncoder(spec)
    # batch of 8 IDENTICAL rows → 4 microbatches of 2; each microbatch's
    # 2 rows land in different dp shards (mb dim sharded over dp=2)
    x = jnp.broadcast_to(
        jax.random.normal(jax.random.PRNGKey(0), (1, 6, 32)), (8, 6, 32))
    params = enc.init(jax.random.PRNGKey(1), x[:1],
                      deterministic=True)["params"]
    devs = np.asarray(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("dp", "pp"))
    out = pipeline_encoder_apply(
        spec, params, x, mesh, axis="pp", n_microbatches=4,
        rng=jax.random.PRNGKey(2), deterministic=False, batch_axis="dp")
    out = np.asarray(out, np.float32)
    # rows 0 and 1 are the same sample in the same microbatch but in
    # different dp shards — dropout masks must differ
    assert np.abs(out[0] - out[1]).max() > 1e-4


# ---- 5. checkpoint GC disabled multi-process ----------------------------------

def test_checkpoint_gc_skipped_multiprocess(tmp_path, monkeypatch):
    from mme_tpu.train import checkpoint as ckpt_mod

    d = tmp_path / "ckpts"
    d.mkdir()
    # a dir whose pid can't exist on this host (looks dead to os.kill)
    orphan = d / "best_1_999999"
    orphan.mkdir()
    monkeypatch.setattr(ckpt_mod, "_process_count", lambda: 2)
    ckpt_mod.CheckpointManager(str(d))
    assert orphan.exists(), "multi-host GC must not delete foreign dirs"
    # single-process: the same orphan IS collected
    monkeypatch.setattr(ckpt_mod, "_process_count", lambda: 1)
    ckpt_mod.CheckpointManager(str(d))
    assert not orphan.exists()
