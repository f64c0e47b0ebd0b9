"""scan-over-layers encoder mode (EncoderSpec.scan_layers): one traced
layer lax.scan'ed over stacked params — ~L× faster compiles for deep
stacks; numerics must match the unrolled encoder exactly."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mme_tpu.models.layers import (EncoderSpec, TransformerEncoder,
                                   from_scan_params, to_scan_params)
from mme_tpu.ops.attention import additive_mask


def setup(ln_style="pre", layers=4, final_ln=True):
    spec = EncoderSpec(hidden=16, heads=2, layers=layers, intermediate=32,
                       ln_style=ln_style, final_ln=final_ln)
    enc = TransformerEncoder(spec)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 16))
    params = enc.init(jax.random.PRNGKey(1), x)["params"]
    return spec, enc, params, x


@pytest.mark.parametrize("ln_style", ["pre", "post"])
def test_scan_matches_unrolled(ln_style):
    spec, enc, params, x = setup(ln_style)
    keep = (jax.random.uniform(jax.random.PRNGKey(2), (2, 6)) > 0.3)
    bias = additive_mask(keep)
    ref = enc.apply({"params": params}, x, bias, deterministic=True)

    scan_spec = dataclasses.replace(spec, scan_layers=True)
    scan_enc = TransformerEncoder(scan_spec)
    scan_params = to_scan_params(params, spec.layers)
    out = scan_enc.apply({"params": scan_params}, x, bias,
                         deterministic=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)


def test_scan_param_structure_matches_init():
    spec, enc, params, x = setup()
    scan_spec = dataclasses.replace(spec, scan_layers=True)
    scan_enc = TransformerEncoder(scan_spec)
    init_scan = scan_enc.init(jax.random.PRNGKey(3), x)["params"]
    converted = to_scan_params(params, spec.layers)
    # identical treedef + shapes → converted HF imports load cleanly
    t1 = jax.tree.map(lambda a: (a.shape, a.dtype), init_scan)
    t2 = jax.tree.map(lambda a: (a.shape, a.dtype), converted)
    assert t1 == t2


def test_scan_roundtrip():
    spec, _, params, _ = setup()
    back = from_scan_params(to_scan_params(params, spec.layers),
                            spec.layers)
    jax.tree.map(np.testing.assert_array_equal, back, params)


def test_scan_gradients_match_unrolled():
    spec, enc, params, x = setup()
    scan_spec = dataclasses.replace(spec, scan_layers=True)
    scan_enc = TransformerEncoder(scan_spec)

    def loss_unrolled(p):
        return jnp.sum(enc.apply({"params": p}, x,
                                 deterministic=True) ** 2)

    def loss_scan(p):
        return jnp.sum(scan_enc.apply(
            {"params": to_scan_params(p, spec.layers)}, x,
            deterministic=True) ** 2)

    l1, g1 = jax.value_and_grad(loss_unrolled)(params)
    l2, g2 = jax.value_and_grad(loss_scan)(params)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        g2, g1)


def test_convert_tree_to_scan_whole_model():
    """Recursive conversion finds every encoder in a nested model tree and
    produces exactly the scan twin's init structure."""
    from mme_tpu.models.fusion import TAVModel, TAVSpec
    from mme_tpu.models.layers import convert_tree_to_scan
    from mme_tpu.train.build_tav import example_tav_batch

    spec = TAVSpec(output_dim=7).tiny()
    batch = example_tav_batch(spec, 1, 12, 400)
    params = TAVModel(spec).init(jax.random.PRNGKey(0), batch)["params"]
    scan_model = TAVModel(spec.with_scan_layers())
    scan_init = scan_model.init(jax.random.PRNGKey(1), batch)["params"]
    converted = convert_tree_to_scan(params)
    t1 = jax.tree.map(lambda a: a.shape, scan_init)
    t2 = jax.tree.map(lambda a: a.shape, converted)
    assert t1 == t2
    # and the converted tree actually runs through the scan model
    logits = scan_model.apply({"params": converted}, batch)
    assert np.isfinite(np.asarray(logits)).all()
    # forward equality with the unrolled model
    ref = TAVModel(spec).apply({"params": params}, batch)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_convert_tree_leaves_heterogeneous_stacks_unrolled():
    from mme_tpu.models.layers import convert_tree_to_scan
    # layer_0 and layer_1 with different structures (the MoE-interleaved
    # case) must be left untouched, not crash
    tree = {"enc": {"layer_0": {"w": jnp.zeros((2, 2))},
                    "layer_1": {"w1": jnp.zeros((2, 3)),
                                "w2": jnp.zeros((3, 2))}}}
    out = convert_tree_to_scan(tree)
    assert "layer_0" in out["enc"] and "layers_scan" not in out["enc"]


def test_scan_with_remat_runs():
    spec, enc, params, x = setup()
    scan_spec = dataclasses.replace(spec, scan_layers=True, remat=True)
    scan_enc = TransformerEncoder(scan_spec)
    sp = to_scan_params(params, spec.layers)

    def loss(p):
        return jnp.sum(scan_enc.apply({"params": p}, x,
                                      deterministic=True) ** 2)

    l, g = jax.value_and_grad(loss)(sp)
    assert np.isfinite(float(l))
    assert all(np.isfinite(np.asarray(v)).all()
               for v in jax.tree.leaves(g))
