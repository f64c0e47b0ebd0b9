"""Device prefetch pipeline (data/prefetch.py): content equivalence,
error propagation, and loop-level determinism with prefetch on/off."""

import numpy as np
import pytest

import jax.numpy as jnp

from mme_tpu.data.dataset import ArrayDataset, batches
from mme_tpu.data.prefetch import prefetch_batches


def toy_dataset(n=10):
    rng = np.random.RandomState(0)
    return ArrayDataset(
        features={"x": rng.randn(n, 3).astype(np.float32)},
        labels=rng.randint(0, 2, n))


def test_prefetch_matches_direct_iteration():
    ds = toy_dataset()
    order = np.arange(len(ds))
    direct = list(batches(ds, order, 4))
    fetched = list(prefetch_batches(batches(ds, order, 4)))
    assert len(direct) == len(fetched)
    for (b1, l1, m1, i1), (b2, l2, m2, i2) in zip(direct, fetched):
        np.testing.assert_array_equal(np.asarray(b1["x"]),
                                      np.asarray(b2["x"]))
        np.testing.assert_array_equal(l1, l2)
        np.testing.assert_array_equal(m1, m2)
        np.testing.assert_array_equal(i1, i2)
        assert isinstance(m2, np.ndarray)  # mask stays host-side
        assert isinstance(np.asarray(b2["x"]), np.ndarray)
        assert hasattr(b2["x"], "devices")  # features device-resident


def test_prefetch_producer_exits_on_abandoned_iterator():
    """Early break (patience stop / preemption) must release the producer
    thread instead of leaving it blocked on a full queue pinning device
    buffers."""
    import threading
    import time

    before = {t.name for t in threading.enumerate()}
    ds = toy_dataset(64)
    order = np.arange(len(ds))
    it = prefetch_batches(batches(ds, order, 2), depth=2)
    next(it)
    next(it)
    it.close()  # what an early `break` does to the generator
    deadline = time.time() + 5.0
    while time.time() < deadline:
        alive = [t for t in threading.enumerate()
                 if t.name == "mme-prefetch" and t.name not in before
                 and t.is_alive()]
        if not alive:
            break
        time.sleep(0.05)
    assert not [t for t in threading.enumerate()
                if t.name == "mme-prefetch" and t.is_alive()]


def test_prefetch_propagates_errors():
    def bad_iter():
        yield ({"x": np.zeros((2, 3), np.float32)},
               np.zeros(2), np.ones(2), np.arange(2))
        raise ValueError("boom")

    it = prefetch_batches(bad_iter())
    next(it)
    with pytest.raises(ValueError, match="boom"):
        next(it)


def test_loop_deterministic_with_and_without_prefetch(monkeypatch,
                                                      tmp_path):
    """Same training, prefetch on vs off → identical results (the pipeline
    changes WHERE arrays live, never their values or order)."""
    results = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("MME_PREFETCH", flag)
        monkeypatch.setenv("MME_RUN_DIR", str(tmp_path / flag))
        from mme_tpu.cli import text_nn
        results[flag] = text_nn.main(
            ["-d", "synthetic", "-e", "1", "-b", "8", "-y", "3",
             "-s", "32"])
    monkeypatch.delenv("MME_PREFETCH")
    assert results["1"]["test/loss"] == pytest.approx(
        results["0"]["test/loss"], rel=1e-6)
    assert results["1"]["test/acc"] == results["0"]["test/acc"]
