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


def test_pipeline_rejects_dropout_specs():
    import dataclasses

    import pytest as _pytest

    spec, enc, params, x = make_encoder(layers=4)
    spec_do = dataclasses.replace(spec, dropout=0.1)
    with _pytest.raises(AssertionError, match="deterministic"):
        pipeline_encoder_apply(spec_do, params, x, pp_mesh(4),
                               n_microbatches=4)
