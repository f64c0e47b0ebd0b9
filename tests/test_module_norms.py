"""Per-module grad/weight norm logging (make_train_step
log_module_norms — the reference's wandb.watch(log="all") signal,
tav_nn.py:103-104)."""

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn
import optax

from mme_tpu.train.steps import TrainState, make_optimizer, make_train_step


class TwoTower(nn.Module):
    @nn.compact
    def __call__(self, batch, *, deterministic=True):
        a = nn.Dense(8, name="tower_a")(batch["x"])
        b = nn.Dense(8, name="tower_b")(batch["x"])
        return nn.Dense(3, name="head")(jnp.tanh(a) + jnp.tanh(b))


def test_module_norms_logged_and_consistent():
    model = TwoTower()
    batch = {"x": jnp.asarray(np.random.RandomState(0).randn(4, 6),
                              jnp.float32)}
    params = model.init(jax.random.PRNGKey(0), batch)["params"]

    def apply_fn(variables, b, deterministic=True, rngs=None, mutable=None):
        return model.apply(variables, b, deterministic=deterministic)

    tx = make_optimizer(1e-3, 1e-4, 10.0)
    state = TrainState.create(params, tx, use_accum=False)
    step = make_train_step(apply_fn, tx, num_classes=3, donate=False,
                           log_module_norms=True)
    labels = jnp.asarray([0, 1, 2, 0], jnp.int32)
    ones = jnp.ones((4,), jnp.int32)
    cw = jnp.ones((3,), jnp.float32)
    _, _, _, norms = step(state, batch, labels, ones, cw,
                          jnp.asarray(1.0, jnp.float32), jnp.asarray(True),
                          jax.random.PRNGKey(1))
    assert set(norms) == {"total", "grad/tower_a", "grad/tower_b",
                          "grad/head", "param/tower_a", "param/tower_b",
                          "param/head"}
    # per-module grad norms recompose into the total (pre-clip global norm)
    total = float(norms["total"])
    recomposed = np.sqrt(sum(float(norms[k]) ** 2 for k in norms
                             if k.startswith("grad/")))
    np.testing.assert_allclose(recomposed, total, rtol=1e-5)
    assert all(np.isfinite(float(v)) for v in norms.values())
    # param norms match the actual weights
    np.testing.assert_allclose(
        float(norms["param/head"]), float(optax.global_norm(params["head"])),
        rtol=1e-6)


def test_loop_logs_module_norms(tmp_path, monkeypatch):
    """Through the CLI: MME_LOG_NORMS=1 puts train/norms/* keys in the
    logged metrics stream."""
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("MME_LOG_NORMS", "1")
    import io
    import json
    from contextlib import redirect_stdout

    from mme_tpu.cli import tav_nn

    buf = io.StringIO()
    with redirect_stdout(buf):
        tav_nn.main(["-d", "synthetic", "-e", "1", "-b", "8", "-y", "7",
                     "-l", "1e-4"])
    norm_keys = set()
    for line in buf.getvalue().splitlines():
        try:
            d = json.loads(line)
        except ValueError:
            continue
        norm_keys |= {k for k in d if k.startswith("train/norms/")}
    assert any(k.startswith("train/norms/grad/") for k in norm_keys), \
        norm_keys
    assert any(k.startswith("train/norms/param/") for k in norm_keys)


def test_magnitude_histogram_counts():
    """Bucket counts: total elements preserved; zeros land in bucket 0;
    known magnitudes land in their exponent buckets."""
    from mme_tpu.train.steps import HIST_BUCKETS, magnitude_histogram

    tree = {"a": jnp.asarray([0.0, 0.0, 1.0, -1.0], jnp.float32),
            "b": jnp.asarray([[1e-13, 256.0]], jnp.float32)}
    h = np.asarray(magnitude_histogram(tree))
    assert h.shape == (HIST_BUCKETS,)
    assert h.sum() == 6
    assert h[0] == 2                       # exact zeros
    # |1.0| → e=0 → bucket 1 + (0+40)//3 = 1+13 = 14 (two elements)
    assert h[14] == 2
    # 1e-13 underflows the range → clipped to bucket 1
    assert h[1] == 1
    # 256 → e=8 → (8+40)//3 = 16 clipped to 15 → bucket 16
    assert h[16] == 1


def test_step_emits_histograms():
    """log_histograms=True adds hist/grad/* and hist/param/* arrays whose
    counts equal each module's element count."""
    model = TwoTower()
    batch = {"x": jnp.asarray(np.random.RandomState(0).randn(4, 6),
                              jnp.float32)}
    params = model.init(jax.random.PRNGKey(0), batch)["params"]

    def apply_fn(variables, b, deterministic=True, rngs=None, mutable=None):
        return model.apply(variables, b, deterministic=deterministic)

    tx = make_optimizer(1e-3, 1e-4, 10.0)
    state = TrainState.create(params, tx, use_accum=False)
    step = make_train_step(apply_fn, tx, num_classes=3, donate=False,
                           log_histograms=True)
    labels = jnp.asarray([0, 1, 2, 0], jnp.int32)
    ones = jnp.ones((4,), jnp.int32)
    cw = jnp.ones((3,), jnp.float32)
    _, _, _, norms = step(state, batch, labels, ones, cw,
                          jnp.asarray(1.0, jnp.float32), jnp.asarray(True),
                          jax.random.PRNGKey(1))
    for mod in ("tower_a", "tower_b", "head"):
        n_elem = sum(int(np.prod(p.shape))
                     for p in jax.tree.leaves(params[mod]))
        assert int(np.asarray(norms[f"hist/grad/{mod}"]).sum()) == n_elem
        assert int(np.asarray(norms[f"hist/param/{mod}"]).sum()) == n_elem
    # norms still present alongside
    assert "grad/head" in norms and "param/head" in norms


def test_loop_logs_histograms(tmp_path, monkeypatch):
    """MME_LOG_HISTS=1 puts train/hist/* bucket lists in the metrics
    stream (full wandb.watch(log="all") parity)."""
    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv("MME_LOG_NORMS", raising=False)
    monkeypatch.setenv("MME_LOG_HISTS", "1")
    import io
    import json
    from contextlib import redirect_stdout

    from mme_tpu.cli import tav_nn
    from mme_tpu.train.steps import HIST_BUCKETS

    buf = io.StringIO()
    with redirect_stdout(buf):
        tav_nn.main(["-d", "synthetic", "-e", "1", "-b", "8", "-y", "7",
                     "-l", "1e-4"])
    hists = {}
    for line in buf.getvalue().splitlines():
        try:
            d = json.loads(line)
        except ValueError:
            continue
        hists.update({k: v for k, v in d.items()
                      if k.startswith("train/hist/")})
    assert any(k.startswith("train/hist/grad/") for k in hists), hists.keys()
    assert any(k.startswith("train/hist/param/") for k in hists)
    for v in hists.values():
        assert isinstance(v, list) and len(v) == HIST_BUCKETS
        assert all(isinstance(c, int) for c in v)

def test_magnitude_histogram_nonfinite_top_bucket():
    """NaN/±Inf must count in the TOP bucket — naive floor arithmetic
    turned them into bucket 1 ("tiny"), reporting an exploding tensor as
    underflow (round-3 review finding)."""
    from mme_tpu.train.steps import HIST_BUCKETS, magnitude_histogram

    tree = {"a": jnp.asarray([np.nan, np.inf, -np.inf, 0.0, 1.0],
                             jnp.float32)}
    h = np.asarray(magnitude_histogram(tree))
    assert h.sum() == 5
    assert h[HIST_BUCKETS - 1] == 3        # all three non-finite
    assert h[1] == 0                       # none misfiled as "tiny"
    assert h[0] == 1 and h[14] == 1
