"""Pipeline parallelism: GPipe-style microbatched stage execution over a
``pp`` mesh axis.

The reference has no pipeline parallelism (SURVEY.md §2.9 — no parallelism
at all); this is part of the TPU-native scaling story alongside dp
(parallel/mesh.py), tp (parallel/sharding_rules.py) and sp
(ops/ring_attention.py). Design follows the standard JAX/TPU recipe
(shard_map + ``ppermute`` over ICI): the layer stack is split into P
contiguous stages, one per device along the ``pp`` axis; M microbatches
stream through; each tick every stage computes on its current activation and
``ppermute``s the result to the next stage. Total ticks = M + P − 1 (the
usual GPipe bubble); outputs collect on the last stage and are broadcast
back. Gradients flow through ``ppermute`` (its transpose is the reverse
permute), so the same function is used for training.

Dropout is supported (round 3): a base rng threads through the schedule and
each (stage, microbatch) pair folds its own key — the reference's actual
configs all train with dropout 0.4-0.5 (``hyper_parameter_config/tav.yaml``),
so a deterministic-only pipeline could not run any reference workload.
``batch_axis`` composes pp with dp (microbatch dim sharded over dp).

All control flow is a ``lax.scan`` over ticks — one compiled program, no
per-tick dispatch. Reachable from training via ``EncoderSpec.pp_mesh``
(models/layers.py) and the ``MME_PP`` CLI knob (cli/tav_nn.py).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def stack_encoder_params(encoder_params: Any, n_layers: int) -> Any:
    """[{'layer_0': t0, ...}] → pytree with a stacked leading layer dim
    (delegates to models.layers.to_scan_params — one stacking
    implementation for scan mode and pipelining)."""
    from mme_tpu.models.layers import to_scan_params

    return to_scan_params(encoder_params, n_layers)["layers_scan"]["block"]


def unstack_to_encoder_params(stacked: Any, n_layers: int) -> Any:
    """Inverse of :func:`stack_encoder_params` (static layer count)."""
    from mme_tpu.models.layers import from_scan_params

    return from_scan_params({"layers_scan": {"block": stacked}}, n_layers)


def pipeline_apply(stage_fn: Callable[[Any, jax.Array, Optional[jax.Array],
                                       Optional[jax.Array]], jax.Array],
                   stage_params: Any,
                   microbatches: jax.Array,
                   mesh: Mesh,
                   axis: str = "pp",
                   micro_bias: Optional[jax.Array] = None,
                   rng: Optional[jax.Array] = None,
                   batch_axis: Optional[str] = None) -> jax.Array:
    """Run ``stage_fn`` as a P-stage pipeline over ``mesh[axis]``.

    ``stage_fn(params, x, bias, rng)``: one stage's compute; ``rng`` is a
    per-(stage, microbatch) PRNG key (None when ``rng`` isn't given).
    ``stage_params``: pytree whose leaves have leading dim P (one slice per
    stage) — shard it along ``axis`` before calling (or let shard_map do it).
    ``microbatches``: [M, mb, ...] input microbatches.
    ``micro_bias``: optional [M, ...] per-microbatch side input (e.g. an
    attention bias) that travels with its microbatch through every stage.
    ``batch_axis``: mesh axis the mb dim is sharded over (dp×pp
    composition); None = replicated.

    Returns [M, mb, ...] outputs == sequentially applying all P stages to
    each microbatch.
    """
    n_stages = mesh.shape[axis]
    M = microbatches.shape[0]
    has_bias = micro_bias is not None
    has_rng = rng is not None
    if not has_bias:
        # scan carries need concrete arrays; thread a tiny dummy whose
        # second dim matches mb so it stays shardable under batch_axis
        micro_bias = jnp.zeros(microbatches.shape[:2], microbatches.dtype)
    if not has_rng:
        rng = jax.random.PRNGKey(0)

    # rank-aware: scalar leaves replicate (matches shard_stage_params)
    params_spec = jax.tree.map(
        lambda p: P(axis) if getattr(p, "ndim", 0) >= 1 else P(),
        stage_params)

    def per_device(params: Any, mbs: jax.Array, biases: jax.Array,
                   base_rng: jax.Array) -> jax.Array:
        # local param block has leading dim 1 (this device's stage)
        params = jax.tree.map(lambda p: jnp.squeeze(p, axis=0), params)
        idx = jax.lax.axis_index(axis)
        is_first = idx == 0
        is_last = idx == n_stages - 1
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
        stage_rng_base = jax.random.fold_in(base_rng, idx)
        if batch_axis is not None:
            # dp×pp: without this fold every dp shard of a microbatch
            # would draw the IDENTICAL dropout mask for different samples
            # (rng enters shard_map replicated), dividing dropout
            # diversity by the dp degree
            stage_rng_base = jax.random.fold_in(
                stage_rng_base, jax.lax.axis_index(batch_axis))

        outputs = jnp.zeros((M,) + mbs.shape[1:], mbs.dtype)

        def tick(carry, t):
            x, bias, outputs = carry
            # the microbatch this stage is processing at tick t (garbage
            # ticks clip into range; their outputs are never stored)
            mb_id = jnp.clip(t - idx, 0, M - 1)
            srng = (jax.random.fold_in(stage_rng_base, mb_id)
                    if has_rng else None)
            y = stage_fn(params, x, bias if has_bias else None, srng)
            y = y.astype(mbs.dtype)
            shifted = jax.lax.ppermute(y, axis, perm)
            bias_shifted = jax.lax.ppermute(bias, axis, perm)
            # next tick's input: stage 0 pulls the next microbatch off the
            # queue, everyone else consumes the upstream activation
            nxt_q = jnp.minimum(t + 1, M - 1)
            x_next = jnp.where(is_first,
                               jax.lax.dynamic_index_in_dim(
                                   mbs, nxt_q, keepdims=False),
                               shifted)
            bias_next = jnp.where(is_first,
                                  jax.lax.dynamic_index_in_dim(
                                      biases, nxt_q, keepdims=False),
                                  bias_shifted)
            # the last stage finished microbatch t-(P-1) this tick
            out_i = jnp.clip(t - (n_stages - 1), 0, M - 1)
            valid = is_last & (t >= n_stages - 1)
            cur = jax.lax.dynamic_index_in_dim(outputs, out_i, keepdims=False)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs, jnp.where(valid, y, cur), out_i, axis=0)
            return (x_next, bias_next, outputs), None

        x0 = mbs[0]
        b0 = biases[0]
        (_, _, outputs), _ = jax.lax.scan(
            tick, (x0, b0, outputs), jnp.arange(M + n_stages - 1))
        # outputs are only valid on the last stage; broadcast them back
        gathered = jax.lax.all_gather(outputs, axis)
        return gathered[n_stages - 1]

    b = batch_axis
    fn = shard_map(per_device, mesh=mesh,
                   in_specs=(params_spec, P(None, b), P(None, b), P()),
                   out_specs=P(None, b), check_rep=False)
    return fn(stage_params, microbatches, micro_bias, rng)


def shard_stage_params(stage_params: Any, mesh: Mesh, axis: str = "pp"
                       ) -> Any:
    """device_put the [P, ...] stacked stage params split along ``axis``."""
    def put(p):
        spec = P(axis) if p.ndim >= 1 else P()
        return jax.device_put(p, NamedSharding(mesh, spec))
    return jax.tree.map(put, stage_params)


def encoder_stage_fn(spec: Any, deterministic: bool = True) -> Callable:
    """Stage function for ``models.layers.TransformerEncoder`` stages.

    ``spec`` is the full EncoderSpec; each stage applies
    ``spec.layers // P`` blocks from its stacked [k, ...] param slice.
    ``deterministic=False`` threads the per-(stage, microbatch) rng into
    flax Dropout; scan/sp/pp modes are cleared (the pipeline owns the layer
    axis, and a nested sp shard_map inside the pp shard_map is
    unsupported)."""
    import dataclasses

    from mme_tpu.models.layers import TransformerEncoder

    def stage(params: Any, x: jax.Array, bias: Optional[jax.Array],
              rng: Optional[jax.Array]) -> jax.Array:
        k = jax.tree.leaves(params)[0].shape[0]
        sub_spec = dataclasses.replace(spec, layers=k, final_ln=False,
                                       scan_layers=False, seq_mesh=None,
                                       seq_axis=None, pp_mesh=None,
                                       pp_axis=None, remat=False)
        sub_params = unstack_to_encoder_params(params, k)
        rngs = ({"dropout": rng} if (not deterministic and rng is not None)
                else None)
        return TransformerEncoder(sub_spec).apply(
            {"params": sub_params}, x, bias,
            deterministic=deterministic, rngs=rngs)

    return stage


def pipeline_encoder_apply(spec: Any, encoder_params: Any,
                           x: jax.Array, mesh: Mesh, axis: str = "pp",
                           n_microbatches: int = 4,
                           bias: Optional[jax.Array] = None,
                           rng: Optional[jax.Array] = None,
                           deterministic: Optional[bool] = None,
                           batch_axis: Optional[str] = None) -> jax.Array:
    """Pipeline a whole TransformerEncoder forward: split [B] into
    microbatches, stack/shard the layer params into stages, stream.

    Matches ``TransformerEncoder(spec).apply`` up to float tolerance
    (incl. the final LayerNorm, applied after the pipeline from the
    ``final_ln`` params) when deterministic. With ``rng`` given (training),
    dropout runs with a per-(stage, microbatch) key stream — statistically
    equivalent to the sequential encoder's dropout, not bitwise-identical.
    """
    if deterministic is None:
        deterministic = rng is None
    has_dropout = spec.dropout > 0.0 or spec.attention_dropout > 0.0
    assert not (deterministic and rng is not None), (
        "rng given but deterministic=True — drop one")
    assert not (not deterministic and has_dropout and rng is None), (
        "spec has dropout and deterministic=False but no rng — dropout "
        "through the pipeline needs a key")
    n_stages = mesh.shape[axis]
    assert spec.layers % n_stages == 0, (
        f"{spec.layers} layers not divisible into {n_stages} stages")
    B = x.shape[0]
    assert B % n_microbatches == 0, f"batch {B} vs {n_microbatches} micro"
    mb = B // n_microbatches
    stacked = stack_encoder_params(encoder_params, spec.layers)
    # [L, ...] → [P, k, ...]
    staged = jax.tree.map(
        lambda p: p.reshape((n_stages, spec.layers // n_stages)
                            + p.shape[1:]), stacked)
    micro_x = x.reshape((n_microbatches, mb) + x.shape[1:])
    micro_bias = None
    if bias is not None:
        micro_bias = bias.reshape((n_microbatches, mb) + bias.shape[1:])
    out = pipeline_apply(encoder_stage_fn(spec, deterministic), staged,
                         micro_x, mesh, axis, micro_bias, rng=rng,
                         batch_axis=batch_axis)
    out = out.reshape((B,) + out.shape[2:])
    if spec.final_ln:
        ln = encoder_params["final_ln"]
        mu = out.mean(axis=-1, keepdims=True)
        var = ((out - mu) ** 2).mean(axis=-1, keepdims=True)
        out = (out - mu) / jnp.sqrt(var + spec.ln_eps)
        out = out * ln["scale"] + ln["bias"]
    return out
