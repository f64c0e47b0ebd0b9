"""Pipeline parallelism (parallel/pipeline.py): GPipe microbatching over a
``pp`` mesh axis must match sequential layer execution, forward and grad.

The reference has no pipeline parallelism at all (SURVEY.md §2.9); this is
part of the TPU-native scaling stack (dp/tp/sp/pp)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from mme_tpu.models.layers import EncoderSpec, TransformerEncoder
from mme_tpu.ops.attention import additive_mask
from mme_tpu.parallel.pipeline import (pipeline_encoder_apply,
                                       stack_encoder_params,
                                       unstack_to_encoder_params)


def make_encoder(layers=4, hidden=16, heads=2):
    spec = EncoderSpec(hidden=hidden, heads=heads, layers=layers,
                       intermediate=32, ln_style="pre", final_ln=False)
    enc = TransformerEncoder(spec)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 6, hidden), jnp.float32)
    params = enc.init(jax.random.PRNGKey(1), x)["params"]
    return spec, enc, params, x


def pp_mesh(n):
    devs = jax.devices()[:n]
    assert len(devs) == n
    return Mesh(np.asarray(devs), ("pp",))


def test_stack_unstack_roundtrip():
    spec, _, params, _ = make_encoder()
    stacked = stack_encoder_params(params, spec.layers)
    back = unstack_to_encoder_params(stacked, spec.layers)
    for i in range(spec.layers):
        jax.tree.map(np.testing.assert_array_equal,
                     back[f"layer_{i}"], params[f"layer_{i}"])


@pytest.mark.parametrize("n_stages,n_micro", [(2, 4), (4, 2), (4, 8)])
def test_pipeline_matches_sequential_forward(n_stages, n_micro):
    spec, enc, params, x = make_encoder(layers=4)
    mesh = pp_mesh(n_stages)
    ref = enc.apply({"params": params}, x, deterministic=True)
    out = pipeline_encoder_apply(spec, params, x, mesh,
                                 n_microbatches=n_micro)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_with_attention_bias():
    spec, enc, params, x = make_encoder(layers=4)
    mesh = pp_mesh(4)
    keep = (jax.random.uniform(jax.random.PRNGKey(2), (8, 6)) > 0.3)
    bias = additive_mask(keep)
    ref = enc.apply({"params": params}, x, bias, deterministic=True)
    out = pipeline_encoder_apply(spec, params, x, mesh,
                                 n_microbatches=4, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_gradients_match_sequential():
    spec, enc, params, x = make_encoder(layers=4)
    mesh = pp_mesh(4)

    def loss_seq(p):
        y = enc.apply({"params": p}, x, deterministic=True)
        return jnp.sum(y ** 2)

    def loss_pp(p):
        y = pipeline_encoder_apply(spec, p, x, mesh, n_microbatches=4)
        return jnp.sum(y ** 2)

    ref_l, ref_g = jax.value_and_grad(loss_seq)(params)
    pp_l, pp_g = jax.value_and_grad(loss_pp)(params)
    np.testing.assert_allclose(float(pp_l), float(ref_l), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5),
        pp_g, ref_g)


def test_pipeline_under_jit():
    spec, enc, params, x = make_encoder(layers=4)
    mesh = pp_mesh(4)
    ref = enc.apply({"params": params}, x, deterministic=True)

    @jax.jit
    def run(p, xx):
        return pipeline_encoder_apply(spec, p, xx, mesh, n_microbatches=2)

    out = run(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_applies_final_layernorm():
    """final_ln=True specs must include the trailing LayerNorm (review
    finding: it used to be silently dropped)."""
    import dataclasses

    spec, enc, params, x = make_encoder(layers=4)
    spec_ln = dataclasses.replace(spec, final_ln=True)
    enc_ln = TransformerEncoder(spec_ln)
    params_ln = enc_ln.init(jax.random.PRNGKey(5), x)["params"]
    ref = enc_ln.apply({"params": params_ln}, x, deterministic=True)
    mesh = pp_mesh(4)
    out = pipeline_encoder_apply(spec_ln, params_ln, x, mesh,
                                 n_microbatches=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_dropout_needs_rng():
    """Training intent (deterministic=False) on a dropout spec without an
    rng must fail loudly instead of silently disabling dropout."""
    import dataclasses

    import pytest as _pytest

    spec, enc, params, x = make_encoder(layers=4)
    spec_do = dataclasses.replace(spec, dropout=0.1)
    with _pytest.raises(AssertionError, match="rng"):
        pipeline_encoder_apply(spec_do, params, x, pp_mesh(4),
                               n_microbatches=4, deterministic=False)
    # rng=None + default deterministic=True is valid EVAL semantics
    out = pipeline_encoder_apply(spec_do, params, x, pp_mesh(4),
                                 n_microbatches=4)
    ref = enc.apply({"params": params}, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_dropout_training():
    """Dropout THROUGH the pipeline (the reference's configs all train with
    dropout 0.4-0.5, hyper_parameter_config/tav.yaml): masks fire, differ
    across keys and microbatches, gradients stay finite, and rate→0
    recovers the deterministic output."""
    import dataclasses

    spec, enc, params, x = make_encoder(layers=4)
    spec_do = dataclasses.replace(spec, dropout=0.4)
    enc_do = TransformerEncoder(spec_do)
    params_do = enc_do.init(jax.random.PRNGKey(1), x)["params"]
    mesh = pp_mesh(4)
    det = pipeline_encoder_apply(spec_do, params_do, x, mesh,
                                 n_microbatches=4)

    r1 = pipeline_encoder_apply(spec_do, params_do, x, mesh,
                                n_microbatches=4,
                                rng=jax.random.PRNGKey(10))
    r2 = pipeline_encoder_apply(spec_do, params_do, x, mesh,
                                n_microbatches=4,
                                rng=jax.random.PRNGKey(11))
    assert np.isfinite(np.asarray(r1)).all()
    assert np.abs(np.asarray(r1) - np.asarray(det)).max() > 1e-3, \
        "dropout did not fire through the pipeline"
    assert np.abs(np.asarray(r1) - np.asarray(r2)).max() > 1e-3, \
        "dropout ignored the rng"
    # different microbatches must get different masks: batch rows 0 and 4
    # sit in different microbatches; with identical inputs their outputs
    # must differ under dropout
    x_same = jnp.broadcast_to(x[:1], x.shape)
    r_same = pipeline_encoder_apply(spec_do, params_do, x_same, mesh,
                                    n_microbatches=4,
                                    rng=jax.random.PRNGKey(12))
    assert np.abs(np.asarray(r_same[0]) - np.asarray(r_same[4])).max() > 1e-3

    # gradients through dropout+pipeline are finite
    def loss(p):
        y = pipeline_encoder_apply(spec_do, p, x, mesh, n_microbatches=4,
                                   rng=jax.random.PRNGKey(13))
        return jnp.sum(y ** 2)

    g = jax.grad(loss)(params_do)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))

    # rate → 0: matches deterministic exactly
    spec_0 = dataclasses.replace(spec_do, dropout=1e-9)
    r0 = pipeline_encoder_apply(spec_0, params_do, x, mesh,
                                n_microbatches=4,
                                rng=jax.random.PRNGKey(14))
    np.testing.assert_allclose(np.asarray(r0), np.asarray(det), rtol=2e-4,
                               atol=2e-5)


def test_encoder_pp_mesh_dispatch():
    """EncoderSpec.pp_mesh: the SAME TransformerEncoder module (same param
    tree) executes via the pipeline — the seam that makes pp a training
    option for every model in the zoo (cli/tav_nn.py MME_PP)."""
    import dataclasses

    spec, enc, params, x = make_encoder(layers=4)
    ref = enc.apply({"params": params}, x, deterministic=True)
    mesh = pp_mesh(4)
    spec_pp = dataclasses.replace(spec, pp_mesh=mesh, pp_axis="pp",
                                  pp_micro=2)
    enc_pp = TransformerEncoder(spec_pp)
    out = enc_pp.apply({"params": params}, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # and with dropout + rngs (training path through flax)
    spec_do = dataclasses.replace(spec_pp, dropout=0.3)
    out_do = TransformerEncoder(spec_do).apply(
        {"params": params}, x, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(3)})
    assert np.isfinite(np.asarray(out_do)).all()
    assert np.abs(np.asarray(out_do) - np.asarray(ref)).max() > 1e-3


def test_pipeline_dp_composition():
    """dp×pp: microbatch dim sharded over dp while stages stream over pp —
    must match the unsharded pipeline and the sequential encoder."""
    n = len(jax.devices())
    if n < 4:
        import pytest as _pytest
        _pytest.skip("needs 4 devices")
    spec, enc, params, x = make_encoder(layers=4)
    devs = np.asarray(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("dp", "pp"))
    ref = enc.apply({"params": params}, x, deterministic=True)
    out = pipeline_encoder_apply(spec, params, x, mesh,
                                 n_microbatches=4, batch_axis="dp")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
