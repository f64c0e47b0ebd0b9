"""Round-3 advisor-finding regression tests:

1. label ids factorize over the FULL dataframe (a class absent from one
   split must not shift later ids in that split);
2. cli/preprocess fails loudly when two splits resolve the same media
   file (MELD dialogue/utterance ids restart per split);
3. a named --dataset whose pickle is missing raises instead of silently
   training on synthetic noise;
4. CheckpointManager GC: unreferenced best_* dirs of DEAD pids are
   collected on init; live in-flight dirs and the referenced best are
   kept.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np
import pandas as pd
import pytest


# ---- 1. full-frame label map ------------------------------------------------

def test_label_ids_stable_when_split_misses_a_class():
    from mme_tpu.data.records import (PickleDatasetConfig, build_label_map,
                                      labels_to_ids, split_dataframe)

    df = pd.DataFrame({
        "label": ["angry", "happy", "sad", "angry", "happy", "sad",
                  "happy", "sad"],          # val/test splits lack "angry"
        "split": ["train", "train", "train", "train", "train", "train",
                  "val", "test"],
    })
    cfg = PickleDatasetConfig(label_col="label")
    cfg.label_map = build_label_map(df, "label")
    tr, va, te = split_dataframe(df, cfg)
    # per-split factorization WITHOUT the map would give happy→0 in val
    # (sorted order of the classes present); with it, ids match train
    ids_tr, names_tr = labels_to_ids(tr["label"].values, cfg.label_map)
    ids_va, _ = labels_to_ids(va["label"].values, cfg.label_map)
    ids_te, _ = labels_to_ids(te["label"].values, cfg.label_map)
    assert cfg.label_map == {"angry": 0, "happy": 1, "sad": 2}
    assert list(ids_va) == [1] and list(ids_te) == [2]
    assert names_tr[0] == "angry"


def test_build_label_map_none_for_int_labels():
    from mme_tpu.data.records import build_label_map
    df = pd.DataFrame({"label": [0, 2, 1]})
    assert build_label_map(df, "label") is None


# ---- 2. preprocess cross-split media collision ------------------------------

def _meld_csv(path, n=3):
    rows = ["Utterance,Emotion,Sentiment,Dialogue_ID,Utterance_ID"]
    for i in range(n):
        rows.append(f"hello {i},joy,positive,0,{i}")
    path.write_text("\n".join(rows) + "\n")
    return str(path)


def test_preprocess_rejects_cross_split_media_collision(tmp_path):
    from mme_tpu.cli import preprocess

    train = _meld_csv(tmp_path / "train.csv")
    test = _meld_csv(tmp_path / "test.csv")
    with pytest.raises(SystemExit, match="claimed by both"):
        preprocess.main([train, test, "--out", str(tmp_path / "o.pkl"),
                         "--audio_dir", str(tmp_path)])


def test_preprocess_split_pattern_avoids_collision(tmp_path):
    from mme_tpu.cli import preprocess

    train = _meld_csv(tmp_path / "train.csv")
    test = _meld_csv(tmp_path / "test.csv")
    df = preprocess.main([
        train, test, "--out", str(tmp_path / "o.pkl"),
        "--audio_dir", str(tmp_path),
        "--audio_pattern", "{split}/dia{dialog}_utt{utterance}.wav"])
    paths = set(df["audio_path"])
    assert len(paths) == len(df)        # every row gets a distinct file


# ---- 3. missing pickle is an error, not synthetic fallback ------------------

@pytest.mark.parametrize("entry", ["tav_nn", "text_nn", "audio_nn_wav2vec",
                                   "visual_nn"])
def test_missing_pickle_raises(entry):
    import importlib
    mod = importlib.import_module(f"mme_tpu.cli.{entry}")
    with pytest.raises(FileNotFoundError, match="not found"):
        mod.main(["--dataset", "definitely_not_a_real_pickle",
                  "-e", "1", "-b", "4"])


# ---- 4. checkpoint orphan GC -------------------------------------------------

def test_checkpoint_gc_collects_dead_pid_orphans(tmp_path):
    from mme_tpu.train.checkpoint import CheckpointManager

    d = str(tmp_path)
    state = {"w": np.zeros((2,), np.float32)}
    mgr = CheckpointManager(d, use_async=False)
    mgr.save_best(state, {"epoch": 1, "val_loss": 0.5})
    mgr.wait()
    referenced = os.path.basename(mgr.best_path)

    from mme_tpu.train.checkpoint import _safe_hostname
    host = _safe_hostname()
    # a dir from a DEAD process (spawn-and-exit gives a real dead pid)
    dead_pid = subprocess.run([sys.executable, "-c",
                               "import os; print(os.getpid())"],
                              capture_output=True, text=True).stdout.strip()
    orphan = os.path.join(d, f"best_7_{host}-{dead_pid}")
    os.makedirs(orphan)
    # a dir from a LIVE process (this one) — an in-flight save elsewhere
    inflight = os.path.join(d, f"best_8_{host}-{os.getpid()}")
    os.makedirs(inflight)
    # ANOTHER machine's fresh in-flight save on a shared (NFS) dir: its
    # pid means nothing here — must be kept even though it looks dead
    foreign_fresh = os.path.join(d, f"best_9_othermachine-{dead_pid}")
    os.makedirs(foreign_fresh)
    # a foreign/legacy dir nothing has written to in > _GC_STALE_S: dead
    foreign_stale = os.path.join(d, f"best_10_othermachine-{dead_pid}")
    os.makedirs(foreign_stale)
    old = time.time() - 2 * CheckpointManager._GC_STALE_S
    os.utime(foreign_stale, (old, old))

    CheckpointManager(d, use_async=False)   # init runs the GC
    assert not os.path.exists(orphan), "dead-pid orphan should be GC'd"
    assert os.path.exists(inflight), "live-pid dir must be kept"
    assert os.path.exists(foreign_fresh), \
        "another machine's fresh in-flight save must be kept"
    assert not os.path.exists(foreign_stale), "stale foreign dir is GC'd"
    assert os.path.exists(os.path.join(d, referenced))
    # the durable best still restores
    restored, meta = mgr.restore_best({"w": np.ones((2,), np.float32)})
    assert meta["epoch"] == 1


def test_checkpoint_gc_keeps_pending_same_process(tmp_path):
    """The crash-safety scenario from test_async_checkpoint: a fresh
    manager on a dir with an UNPUBLISHED save from a live process must
    not delete it."""
    from mme_tpu.train.checkpoint import CheckpointManager

    d = str(tmp_path)
    state = {"w": np.arange(3).astype(np.float32)}
    mgr = CheckpointManager(d, use_async=False)
    mgr.save_best(state, {"epoch": 1})
    mgr.wait()
    from mme_tpu.train.checkpoint import _safe_hostname
    mgr._pending_meta = {"epoch": 2, "_data": "best_2_%s-%d"
                         % (_safe_hostname(), os.getpid())}
    os.makedirs(os.path.join(d, mgr._pending_meta["_data"]), exist_ok=True)

    CheckpointManager(d, use_async=False)
    assert os.path.exists(os.path.join(d, mgr._pending_meta["_data"]))


# ---- round 4: hostname collisions + flash BQ env validation ----------------

def test_safe_hostname_distinguishes_punctuation_variants(monkeypatch):
    """'tpu-vm1' and 'tpuvm-1' sanitize to the same alnum string; the
    appended raw-name hash must keep them distinct (otherwise the
    host-local pid probe becomes falsely authoritative for a foreign
    machine's checkpoint dir)."""
    import socket
    from mme_tpu.train import checkpoint as ck

    monkeypatch.setattr(socket, "gethostname", lambda: "tpu-vm1")
    a = ck._safe_hostname()
    monkeypatch.setattr(socket, "gethostname", lambda: "tpuvm-1")
    b = ck._safe_hostname()
    assert a != b
    assert "-" not in a and "-" not in b   # '-' stays the host/pid separator


def test_flash_bq_env_falls_back_with_warning(monkeypatch):
    """An ill-shaped MME_FLASH_BQ (not a multiple of 128, below the seq)
    must warn and fall back — same contract as MME_FLASH_BK."""
    from mme_tpu.ops.flash_attention import DEFAULT_BLOCK_Q, _block_sizes

    monkeypatch.setenv("MME_FLASH_BQ", "300")
    with pytest.warns(UserWarning, match="MME_FLASH_BQ"):
        bq, _ = _block_sizes(4096, 4096)
    assert bq == DEFAULT_BLOCK_Q
    # full-seq bq (clamped by min) is legal and silent
    monkeypatch.setenv("MME_FLASH_BQ", "300")
    bq, _ = _block_sizes(300, 300)
    assert bq == 300


# ---- 5. metrics display names follow the ACTUAL label factorization ---------

def test_invert_label_map_matches_factorization():
    """build_label_map factorizes alphabetically — per-class metric names
    must come from ITS inverse, not the hardcoded display lists (which
    would silently permute per-class F1)."""
    from mme_tpu.cli.common import invert_label_map
    from mme_tpu.data.records import build_label_map, labels_to_ids

    df = pd.DataFrame({"label": ["neutral", "joy", "anger", "joy"]})
    m = build_label_map(df, "label")
    inv = invert_label_map(m)
    ids, _ = labels_to_ids(df["label"].values, m)
    assert [inv[i] for i in ids] == list(df["label"])
    assert inv == {0: "anger", 1: "joy", 2: "neutral"}
    assert invert_label_map(None) is None
