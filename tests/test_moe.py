"""MoE FFN + expert parallelism (models/moe.py).

Checks: router top-k semantics, dispatch conservation, dense equivalence at
E=1, encoder fwd/bwd with aux loss, and ep-sharded == single-device on the
virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from mme_tpu.models.layers import EncoderSpec
from mme_tpu.models.moe import (MoEMlp, MoESpec, MoETransformerEncoder,
                                collect_aux_loss, dispatch_combine,
                                router_gates, _capacity)


def test_router_topk_semantics():
    logits = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 4))
    probs = np.asarray(jax.nn.softmax(logits, -1))
    for k in (1, 2):
        gates, aux = router_gates(logits, k)
        nnz = (np.asarray(gates) > 0).sum(-1)
        assert (nnz <= k).all() and (nnz >= 1).all()
        if k == 1:
            # Switch convention: raw p_max (NOT renormalized to 1 — that
            # would zero the router's task-loss gradient)
            np.testing.assert_allclose(np.asarray(gates.sum(-1)),
                                       probs.max(-1), rtol=1e-5)
        else:
            np.testing.assert_allclose(np.asarray(gates.sum(-1)),
                                       np.ones((2, 5)), rtol=1e-5)
        # ≈k at uniform routing, larger when imbalanced; always positive
        assert 0.5 < float(aux) < 4.0


def test_router_top1_has_task_gradient():
    """The regression the renormalization bug caused: with top-1 the
    combine weight must carry d(loss)/d(router)."""
    spec = EncoderSpec(hidden=8, intermediate=16)
    moe = MoESpec(num_experts=4, top_k=1)
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 6, 8))
    layer = MoEMlp(spec, moe)
    params = layer.init(jax.random.PRNGKey(9), x)["params"]

    def loss(p):
        y = layer.apply({"params": p}, x)
        return jnp.sum(y ** 2)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["router"]["kernel"]).sum()) > 1e-3


def test_dispatch_conservation_and_capacity():
    logits = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 4))
    gates, _ = router_gates(logits, 2)
    C = 3
    dispatch, combine = dispatch_combine(gates, C)
    d = np.asarray(dispatch)
    # a buffer slot holds at most one token
    assert (d.sum(axis=1) <= 1.0 + 1e-6).all()
    # each token occupies at most k slots
    assert (d.sum(axis=(2, 3)) <= 2 + 1e-6).all()
    # combine weights never exceed the gate
    assert (np.asarray(combine).sum(3) <= np.asarray(gates) + 1e-6).all()


def test_moe_mlp_dense_equivalence_single_expert():
    """E=1, top-1, ample capacity → exactly a dense FFN."""
    spec = EncoderSpec(hidden=8, intermediate=16)
    moe = MoESpec(num_experts=1, top_k=1, capacity_factor=2.0)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 8))
    layer = MoEMlp(spec, moe)
    params = layer.init(jax.random.PRNGKey(3), x)["params"]
    out = layer.apply({"params": params}, x)
    w1, b1 = params["w1"][0], params["b1"][0]
    w2, b2 = params["w2"][0], params["b2"][0]
    h = jax.nn.gelu(x @ w1 + b1, approximate=False)
    ref = h @ w2 + b2
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_moe_encoder_forward_backward_and_aux():
    spec = EncoderSpec(hidden=16, heads=2, layers=4, intermediate=32,
                       ln_style="pre")
    moe = MoESpec(num_experts=4, top_k=2, moe_every=2)
    enc = MoETransformerEncoder(spec, moe)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 10, 16))
    params = enc.init(jax.random.PRNGKey(5), x)["params"]

    def loss(p):
        y, inter = enc.apply({"params": p}, x, mutable=["intermediates"])
        aux = collect_aux_loss(inter["intermediates"])
        return jnp.sum(y ** 2) + aux, aux

    (l, aux), g = jax.value_and_grad(loss, has_aux=True)(params)
    assert np.isfinite(float(l)) and float(aux) > 0
    # router gets gradient (load-balancing + combine weights are traced)
    router_g = g["layer_1"]["moe_mlp"]["router"]["kernel"]
    assert float(jnp.abs(router_g).sum()) > 0
    # expert weights get gradient
    assert float(jnp.abs(g["layer_1"]["moe_mlp"]["w1"]).sum()) > 0


def test_capacity_formula():
    assert _capacity(10, 2, 4, 1.5) == int(np.ceil(10 * 2 * 1.5 / 4))
    assert _capacity(1, 1, 8, 1.0) == 1


@pytest.mark.parametrize("n_ep", [4])
def test_expert_parallel_matches_single_device(n_ep):
    """ep-sharded experts (all-to-all inserted by XLA) == unsharded."""
    spec = EncoderSpec(hidden=8, intermediate=16)
    moe_plain = MoESpec(num_experts=4, top_k=2)
    moe_ep = MoESpec(num_experts=4, top_k=2, ep_axis="ep")
    x = jax.random.normal(jax.random.PRNGKey(6), (4, 6, 8))
    layer = MoEMlp(spec, moe_plain)
    params = layer.init(jax.random.PRNGKey(7), x)["params"]
    ref = layer.apply({"params": params}, x)

    mesh = Mesh(np.asarray(jax.devices()[:n_ep]), ("ep",))
    layer_ep = MoEMlp(spec, moe_ep)

    @jax.jit
    def run(p, xx):
        return layer_ep.apply({"params": p}, xx)

    with mesh:
        out = run(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=1e-6)
