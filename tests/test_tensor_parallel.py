"""Tensor-parallel invariance on the virtual CPU mesh: a 4dp×2mp-sharded
train step must match the unsharded step (XLA SPMD inserts TP collectives)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from mme_tpu.core.config import ExperimentConfig
from mme_tpu.models.fusion import TAVSpec
from mme_tpu.parallel.mesh import make_mesh, shard_batch
from mme_tpu.parallel.sharding_rules import shard_state_tp, tp_spec_for_path
from mme_tpu.train.build_tav import build_tav, example_tav_batch


def test_tp_rules_match_expected_shapes():
    spec = TAVSpec(output_dim=7).tiny()
    batch = example_tav_batch(spec, 1, 12, 400)
    cfg = ExperimentConfig(batch_size=1, text_max_len=12,
                           audio_max_samples=400)
    _m, state, _t, _e = build_tav(spec, cfg, 10, example_batch=batch,
                                  remat=False)
    specs = jax.tree_util.tree_map_with_path(tp_spec_for_path, state.params)
    flat = {jax.tree_util.keystr(k): v
            for k, v in jax.tree_util.tree_leaves_with_path(
                jax.tree_util.tree_map_with_path(
                    lambda p, x: str(tp_spec_for_path(p, x)), state.params))}
    qkv = [v for k, v in flat.items() if k.endswith("['qkv']['kernel']")]
    assert qkv and all("mp" in v for v in qkv)
    fc1 = [v for k, v in flat.items() if k.endswith("['fc1']['kernel']")]
    assert fc1 and all("mp" in v for v in fc1)
    ln = [v for k, v in flat.items() if "ln1" in k and "scale" in k]
    assert ln and all(v == "PartitionSpec()" for v in ln)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_tp_dp_sharded_step_matches_single_device():
    n_dp, n_mp = 4, 2
    spec = TAVSpec(output_dim=7).tiny()
    B = n_dp
    cfg = ExperimentConfig(batch_size=B, text_max_len=12,
                           audio_max_samples=400)
    batch = example_tav_batch(spec, B, 12, 400)
    _m, state0, train_step, _ = build_tav(
        spec, cfg, steps_per_epoch=10, example_batch=batch, remat=False)

    labels = jnp.arange(B, dtype=jnp.int32) % 7
    mask = jnp.ones((B,), jnp.int32)
    cw = jnp.ones((7,), jnp.float32)
    one = jnp.asarray(1.0, jnp.float32)
    yes = jnp.asarray(True)
    rng = jax.random.PRNGKey(7)

    state_a = jax.tree.map(jnp.copy, state0)
    state_a, loss_a, cm_a, _ = train_step(state_a, batch, labels, mask, cw,
                                          one, yes, rng)

    mesh = make_mesh(data=n_dp, model=n_mp,
                     devices=jax.devices()[:n_dp * n_mp])
    with mesh:
        state_b = shard_state_tp(jax.tree.map(jnp.copy, state0), mesh)
        sbatch = shard_batch(batch, mesh)
        slabels = shard_batch({"x": labels}, mesh)["x"]
        smask = shard_batch({"x": mask}, mesh)["x"]
        scw = jax.device_put(cw, jax.sharding.NamedSharding(mesh, P()))
        state_b, loss_b, cm_b, _ = train_step(state_b, sbatch, slabels,
                                              smask, scw, one, yes, rng)

    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=2e-5)
    np.testing.assert_array_equal(np.asarray(cm_a), np.asarray(cm_b))
    pa = jax.tree_util.tree_leaves(state_a.params)
    pb = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(pa, pb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)
