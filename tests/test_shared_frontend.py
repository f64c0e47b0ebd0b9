"""TAVSpec.share_audio_frontend: one conv feature extractor feeds both the
PreFormer embedding stage and the full audio tower. Equivalence: a shared
model must produce exactly the logits of the unshared model whose two
extractors hold the same weights."""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np

from mme_tpu.models.fusion import TAVModel, TAVSpec
from mme_tpu.train.build_tav import example_tav_batch


def test_shared_frontend_matches_unshared():
    spec = TAVSpec(output_dim=3).tiny()
    shared_spec = dc.replace(spec, share_audio_frontend=True)
    batch = example_tav_batch(spec, 2, 16, 2000)

    m_shared = TAVModel(shared_spec)
    p_shared = m_shared.init(jax.random.PRNGKey(0), batch)["params"]
    assert "audio_frontend" in p_shared
    assert "feature_extractor" not in p_shared["preformer"]
    assert "feature_extractor" not in p_shared["model"]["wav2vec2"]

    # rebuild the unshared tree from the shared one: both conv stacks get
    # the shared weights
    fe = p_shared["audio_frontend"]
    p_unshared = {
        "preformer": {**p_shared["preformer"], "feature_extractor": fe},
        "model": {**p_shared["model"],
                  "wav2vec2": {**p_shared["model"]["wav2vec2"],
                               "feature_extractor": fe}},
    }
    m_unshared = TAVModel(spec)
    out_u = m_unshared.apply({"params": p_unshared}, batch,
                             deterministic=True)
    out_s = m_shared.apply({"params": p_shared}, batch, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_u),
                               rtol=1e-6, atol=1e-6)


def test_shared_frontend_receives_gradients_from_both_paths():
    spec = dc.replace(TAVSpec(output_dim=3).tiny(),
                      share_audio_frontend=True)
    batch = example_tav_batch(spec, 2, 16, 2000)
    model = TAVModel(spec)
    params = model.init(jax.random.PRNGKey(0), batch)["params"]

    def loss(p):
        return jnp.sum(model.apply({"params": p}, batch,
                                   deterministic=True) ** 2)

    g = jax.grad(loss)(params)
    gnorm = sum(float(jnp.abs(x).sum())
                for x in jax.tree_util.tree_leaves(g["audio_frontend"]))
    assert gnorm > 0.0


def test_full_remat_with_dropout_trains():
    """Regression: encoder remat + dropout>0 + non-deterministic train step
    (the remat wrapper must keep ``deterministic`` static — a traced bool
    breaks flax Dropout under jax.checkpoint)."""
    import jax
    import jax.numpy as jnp
    from mme_tpu.core.config import ExperimentConfig
    from mme_tpu.train.build_tav import build_tav

    spec = dc.replace(TAVSpec(output_dim=3).tiny(),
                      share_audio_frontend=True)
    cfg = ExperimentConfig(batch_size=2, text_max_len=16,
                           audio_max_samples=2000)
    batch = example_tav_batch(spec, 2, 16, 2000)
    _m, state, train_step, _ = build_tav(spec, cfg, 10,
                                         example_batch=batch, remat=True)
    state, loss, _, _ = train_step(
        state, batch, jnp.zeros((2,), jnp.int32), jnp.ones((2,), jnp.int32),
        jnp.ones((3,), jnp.float32), jnp.asarray(1.0), jnp.asarray(True),
        jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
