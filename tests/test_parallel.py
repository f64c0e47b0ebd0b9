"""Data-parallel invariance on the virtual 8-device CPU mesh: the same
jitted TAV train step must produce identical losses/params whether inputs
are single-device or dp-sharded (XLA inserts the gradient all-reduce)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mme_tpu.core.config import ExperimentConfig
from mme_tpu.models.fusion import TAVSpec
from mme_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from mme_tpu.train.build_tav import build_tav, example_tav_batch


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dp_sharded_step_matches_single_device():
    n = 8
    spec = TAVSpec(output_dim=7).tiny()
    cfg = ExperimentConfig(batch_size=n, text_max_len=12,
                           audio_max_samples=400)
    batch = example_tav_batch(spec, n, 12, 400)
    _model, state0, train_step, _ = build_tav(
        spec, cfg, steps_per_epoch=10, example_batch=batch, remat=False)

    labels = jnp.arange(n, dtype=jnp.int32) % 7
    mask = jnp.ones((n,), jnp.int32)
    cw = jnp.ones((7,), jnp.float32)
    one = jnp.asarray(1.0, jnp.float32)
    yes = jnp.asarray(True)
    rng = jax.random.PRNGKey(7)

    # single-device baseline (fresh state; the step donates its input)
    state_a = jax.tree.map(jnp.copy, state0)
    state_a, loss_a, cm_a, _gn = train_step(state_a, batch, labels, mask, cw,
                                       one, yes, rng)

    mesh = make_mesh(data=n, model=1, devices=jax.devices()[:n])
    with mesh:
        state_b = replicate(jax.tree.map(jnp.copy, state0), mesh)
        sbatch = shard_batch(batch, mesh)
        slabels = shard_batch({"x": labels}, mesh)["x"]
        smask = shard_batch({"x": mask}, mesh)["x"]
        state_b, loss_b, cm_b, _gn = train_step(state_b, sbatch, slabels, smask,
                                           replicate(cw, mesh), one, yes, rng)

    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(cm_a), np.asarray(cm_b))
    # updated params agree across the sharded/unsharded paths
    pa = jax.tree_util.tree_leaves(state_a.params)
    pb = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(pa, pb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_eval_cm_psum_equivalence():
    """Metrics ride the same program: a sharded eval step's confusion matrix
    equals the host-side sum of per-shard matrices."""
    from mme_tpu.evals.metrics import confusion_matrix
    n = 8
    preds = jnp.arange(n, dtype=jnp.int32) % 3
    labels = (jnp.arange(n, dtype=jnp.int32) + 1) % 3
    mesh = make_mesh(data=n, model=1, devices=jax.devices()[:n])
    f = jax.jit(lambda p, t: confusion_matrix(p, t, 3))
    with mesh:
        sp = shard_batch({"x": preds}, mesh)["x"]
        st = shard_batch({"x": labels}, mesh)["x"]
        cm_sharded = f(sp, st)
    cm_local = f(preds, labels)
    np.testing.assert_array_equal(np.asarray(cm_sharded),
                                  np.asarray(cm_local))


def test_batch_constraint_semantics():
    """parallel/sharding_rules.batch_constraint (round 5): under a mesh
    with a dp axis it pins the leading dim dp-sharded; under a mesh
    WITHOUT one (pure sp/pp/ep) it pins fully replicated; outside any
    mesh it is a no-op. These pins are what keeps the SPMD partitioner
    from involuntary full rematerializations (dryrun gate)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P
    from mme_tpu.parallel.sharding_rules import batch_constraint

    devs = jax.devices()
    if len(devs) < 8:
        import pytest
        pytest.skip("needs the virtual 8-device CPU mesh")

    x = jnp.arange(8 * 3, dtype=jnp.float32).reshape(8, 3)

    # no ambient mesh → identity
    y = jax.jit(batch_constraint)(x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))

    # dp mesh → P("dp", None)
    mesh = Mesh(np.asarray(devs).reshape(4, 2), ("dp", "mp"))
    with mesh:
        y = jax.jit(batch_constraint)(x)
    assert y.sharding.is_equivalent_to(
        jax.sharding.NamedSharding(mesh, P("dp", None)), x.ndim)

    # dp mesh, indivisible batch → replicated (init-time batch-1 traces)
    x1 = x[:1]
    with mesh:
        y1 = jax.jit(batch_constraint)(x1)
    assert y1.sharding.is_equivalent_to(
        jax.sharding.NamedSharding(mesh, P()), x1.ndim)

    # sp-only mesh → replicated
    sp_mesh = Mesh(np.asarray(devs), ("sp",))
    with sp_mesh:
        y = jax.jit(batch_constraint)(x)
    assert y.sharding.is_equivalent_to(
        jax.sharding.NamedSharding(sp_mesh, P()), x.ndim)
