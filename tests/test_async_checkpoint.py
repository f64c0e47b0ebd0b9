"""Async checkpointing (train/checkpoint.py): overlapped saves must be
observationally identical to blocking saves."""

import numpy as np
import pytest

import jax.numpy as jnp
import optax

from mme_tpu.train.checkpoint import CheckpointManager
from mme_tpu.train.steps import TrainState


def make_state(seed=0):
    rng = np.random.RandomState(seed)
    params = {"w": jnp.asarray(rng.randn(16, 4).astype(np.float32)),
              "b": jnp.asarray(rng.randn(4).astype(np.float32))}
    return TrainState.create(params, optax.adam(1e-3))


@pytest.mark.parametrize("use_async", [True, False])
def test_save_restore_roundtrip(tmp_path, use_async):
    mgr = CheckpointManager(str(tmp_path), use_async=use_async)
    state = make_state(0)
    mgr.save_best(state, {"epoch": 1, "val_loss": 0.5})
    assert mgr.has_best()
    restored, meta = mgr.restore_best(make_state(1))
    assert meta == {"epoch": 1, "val_loss": 0.5}
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.asarray(state.params["w"]))


def test_async_interleaved_overwrites_read_latest(tmp_path):
    """Rapid successive async saves (the mid-epoch improving-val pattern):
    the read barriers on the in-flight write and sees the LAST state."""
    mgr = CheckpointManager(str(tmp_path), use_async=True)
    states = [make_state(i) for i in range(4)]
    for i, s in enumerate(states):
        mgr.save_best(s, {"epoch": i, "val_loss": 1.0 - 0.1 * i})
    restored, meta = mgr.restore_best(make_state(9))
    assert meta["epoch"] == 3
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.asarray(states[3].params["w"]))


def test_crash_mid_write_preserves_previous_best(tmp_path):
    """The meta pointer flips only at wait(): a process killed while the
    async save is in flight leaves the PREVIOUS best fully restorable
    from a fresh manager (no meta-points-at-missing-data window)."""
    mgr = CheckpointManager(str(tmp_path), use_async=True)
    s1, s2 = make_state(0), make_state(1)
    mgr.save_best(s1, {"epoch": 1})
    mgr.wait()  # s1 durable + published
    mgr.save_best(s2, {"epoch": 2})
    # do NOT wait — simulate the process dying here: a new process sees
    # only what's on disk
    fresh = CheckpointManager(str(tmp_path), use_async=True)
    assert fresh.has_best()
    restored, meta = fresh.restore_best(make_state(9))
    assert meta["epoch"] == 1
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.asarray(s1.params["w"]))
    # while the original process, had it lived, reads s2 after its wait
    restored2, meta2 = mgr.restore_best(make_state(9))
    assert meta2["epoch"] == 2
    np.testing.assert_array_equal(np.asarray(restored2.params["w"]),
                                  np.asarray(s2.params["w"]))


def test_wait_is_idempotent(tmp_path):
    mgr = CheckpointManager(str(tmp_path), use_async=True)
    mgr.wait()
    mgr.save_best(make_state(0), {"epoch": 0})
    mgr.wait()
    mgr.wait()
    assert mgr.has_best()
