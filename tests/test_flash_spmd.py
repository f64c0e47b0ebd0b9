"""Flash attention under a pjit mesh: the custom_partitioning rule.

A ``pallas_call`` is an opaque custom call to the SPMD partitioner, so
until round 4 a mesh run could only replicate the kernel's operands (the
README caveat). ``ops/flash_attention.py`` now wraps the kernel pair in
``jax.experimental.custom_partitioning`` declaring batch/heads freely
shardable and sequence/head_dim replicated. These tests run the kernel in
interpret mode on the 8-device CPU mesh (conftest) and assert

- numerics match the XLA reference path under dp×mp sharding, forward
  and backward (the per-shard pack factor adapts to the local head count);
- the compiled module contains NO all-gather of q/k/v — the partitioner
  runs the kernel per shard instead of gathering (the old last-resort);
- the single-device path (MME_FLASH_SPMD=0) is untouched.

Reference: the reference has no kernels and no working parallelism
(SURVEY.md §2.9); this is TPU-native scaling work on top of parity.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mme_tpu.ops.attention import additive_mask
from mme_tpu.ops.flash_attention import flash_attention_shd


def _xla_ref(q, k, v, bias):
    depth = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) / np.sqrt(depth)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs,
                      v.astype(jnp.float32)).astype(v.dtype)


def _inputs(B=8, S=256, H=4, D=64, masked=True):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, S, H, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, S, H, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, S, H, D), jnp.float32)
    if masked:
        keep = jnp.asarray(rng.rand(B, S) > 0.2, jnp.float32)
        keep = keep.at[:, 0].set(1.0)  # no fully-masked rows
        bias = additive_mask(keep)
    else:
        bias = None
    return q, k, v, bias


def _mesh(dp=4, mp=2):
    return Mesh(np.asarray(jax.devices())[: dp * mp].reshape(dp, mp),
                ("dp", "mp"))


def test_flash_spmd_forward_matches_xla(monkeypatch):
    monkeypatch.setenv("MME_FLASH_SPMD", "1")
    q, k, v, bias = _inputs()
    mesh = _mesh()
    shd = NamedSharding(mesh, P("dp", None, "mp", None))
    qs, ks, vs = (jax.device_put(x, shd) for x in (q, k, v))
    bs = jax.device_put(bias, NamedSharding(mesh, P("dp")))

    fn = jax.jit(lambda a, b, c, m: flash_attention_shd(
        a, b, c, m, interpret=True))
    out = fn(qs, ks, vs, bs)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_xla_ref(q, k, v, bias)),
                               atol=2e-5, rtol=2e-5)
    # output keeps the operand sharding — no implicit replication
    assert out.sharding.is_equivalent_to(
        NamedSharding(mesh, P("dp", None, "mp", None)), out.ndim)
    # and the partitioner inserted no gather of the sharded operands
    txt = fn.lower(qs, ks, vs, bs).compile().as_text()
    assert not re.search(r"all-gather", txt), "operands were gathered"


def test_flash_spmd_grads_match_xla(monkeypatch):
    monkeypatch.setenv("MME_FLASH_SPMD", "1")
    q, k, v, bias = _inputs(B=4, S=128, H=4, D=64)
    mesh = _mesh(2, 2)
    shd = NamedSharding(mesh, P("dp", None, "mp", None))
    qs, ks, vs = (jax.device_put(x, shd) for x in (q, k, v))

    def loss_flash(a, b, c):
        o = flash_attention_shd(a, b, c, bias, interpret=True)
        return jnp.sum(o * jnp.cos(o))

    def loss_ref(a, b, c):
        o = _xla_ref(a, b, c, bias)
        return jnp.sum(o * jnp.cos(o))

    g_flash = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(qs, ks, vs)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=3e-5, rtol=3e-5,
                                   err_msg=f"d{name} mismatch")
    # backward is partitioned too: no gathers in the grad program
    txt = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2))).lower(
        qs, ks, vs).compile().as_text()
    assert not re.search(r"all-gather", txt)


def test_flash_spmd_odd_local_heads(monkeypatch):
    """mp=2 over H=6 leaves 3 heads per shard — the per-shard pack factor
    must fall back to 1 and stay correct."""
    monkeypatch.setenv("MME_FLASH_SPMD", "1")
    q, k, v, bias = _inputs(B=4, S=128, H=6, D=64)
    mesh = _mesh(2, 2)
    shd = NamedSharding(mesh, P("dp", None, "mp", None))
    qs, ks, vs = (jax.device_put(x, shd) for x in (q, k, v))
    out = jax.jit(lambda a, b, c: flash_attention_shd(
        a, b, c, bias, interpret=True))(qs, ks, vs)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_xla_ref(q, k, v, bias)),
                               atol=2e-5, rtol=2e-5)


def test_flash_spmd_unsharded_and_eager(monkeypatch):
    """The SPMD wrapper must be a no-op semantically when inputs carry no
    sharding (plain jit) and when called eagerly."""
    monkeypatch.setenv("MME_FLASH_SPMD", "1")
    q, k, v, bias = _inputs(B=2, S=128, H=4, D=64)
    ref = _xla_ref(q, k, v, bias)
    out_jit = jax.jit(lambda a, b, c: flash_attention_shd(
        a, b, c, bias, interpret=True))(q, k, v)
    np.testing.assert_allclose(np.asarray(out_jit), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    out_eager = flash_attention_shd(q, k, v, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out_eager), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_spmd_off_matches_on(monkeypatch):
    """MME_FLASH_SPMD=0 (the single-chip packed path) and =1 (the
    partitioned path) are the same kernels — bitwise-equal outputs."""
    q, k, v, bias = _inputs(B=2, S=128, H=4, D=64)
    monkeypatch.setenv("MME_FLASH_SPMD", "0")
    off = flash_attention_shd(q, k, v, bias, interpret=True)
    monkeypatch.setenv("MME_FLASH_SPMD", "1")
    on = flash_attention_shd(q, k, v, bias, interpret=True)
    np.testing.assert_array_equal(np.asarray(off), np.asarray(on))
