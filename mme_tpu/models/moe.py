"""Mixture-of-Experts FFN with expert parallelism over an ``ep`` mesh axis.

Beyond-reference capability (the reference has no MoE and no parallelism,
SURVEY.md §2.9): completes the parallelism set dp (parallel/mesh.py),
tp (parallel/sharding_rules.py), sp (ops/ring_attention.py), pp
(parallel/pipeline.py) with ep.

Design is the standard TPU GShard/Switch recipe, all static shapes:

- router: dense [H → E] logits, top-k gating; combine weights are the raw
  softmax probability for top-1 (Switch convention — renormalizing one
  weight to 1.0 would cut the router's task-loss gradient) and
  renormalized across the selected k for top-k>1 (GShard convention);
- capacity: each expert processes at most C = ceil(capacity_factor · S · k
  / E) tokens; overflow tokens are dropped from the expert path (their
  combine weight contributes nothing — the residual connection in the
  encoder block carries them);
- dispatch/combine are one-hot einsums ([B,S,E,C] tensors), so when the
  stacked expert params [E, ...] are sharded along ``ep`` XLA lowers the
  dispatch einsum into an all-to-all over ICI — no hand-written collectives;
- aux load-balancing loss E·Σ_e frac_e·mean_prob_e (≈ k at uniform
  routing since frac sums to k; larger when imbalanced) is returned for
  the trainer to add.

``MoEMlp`` is a drop-in for ``models.layers.Mlp``; ``MoETransformerEncoder``
swaps the MLP of every ``moe_every``-th block.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mme_tpu.models.layers import (EncoderBlock, EncoderSpec,
                                   MultiHeadAttention, activation)
from mme_tpu.ops.layer_norm import FusedLayerNorm


@dataclasses.dataclass(frozen=True)
class MoESpec:
    """MoE knobs layered on an EncoderSpec."""

    num_experts: int = 4
    top_k: int = 2
    capacity_factor: float = 1.5
    moe_every: int = 2           # every n-th block uses the MoE MLP
    aux_loss_weight: float = 1e-2
    ep_axis: Optional[str] = None  # mesh axis to shard experts over


def _capacity(seq: int, top_k: int, num_experts: int,
              factor: float) -> int:
    cap = int(-(-seq * top_k * factor // num_experts))  # ceil
    return max(cap, 1)


def router_gates(logits: jax.Array, top_k: int
                 ) -> Tuple[jax.Array, jax.Array]:
    """[B,S,E] logits → (combine weights [B,S,E] with ≤k nonzeros per token,
    aux load-balancing loss scalar)."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    # top-k mask via iterative argmax (k is tiny: 1 or 2)
    gates = jnp.zeros_like(probs)
    remaining = probs
    for _ in range(top_k):
        idx = jnp.argmax(remaining, axis=-1)
        onehot = jax.nn.one_hot(idx, probs.shape[-1], dtype=probs.dtype)
        gates = gates + onehot * probs
        remaining = remaining * (1.0 - onehot)
    if top_k > 1:
        # GShard-style renormalization of the selected weights. NOT done
        # for top-1: renormalizing a single weight makes it exactly 1.0,
        # killing the task-loss gradient into the router (Switch
        # Transformer keeps the raw p_max as the combine weight for
        # precisely this reason).
        denom = jnp.maximum(gates.sum(-1, keepdims=True), 1e-9)
        gates = gates / denom
    # GShard/Switch aux loss: E · Σ_e frac_tokens_e · mean_prob_e.
    # frac sums to k over experts, so uniform routing scores ≈ k (≈1 for
    # top-1); imbalance scores higher.
    E = probs.shape[-1]
    frac = (gates > 0).astype(jnp.float32).mean(axis=(0, 1))
    mean_prob = probs.mean(axis=(0, 1))
    aux = (frac * mean_prob).sum() * E
    return gates, aux


def dispatch_combine(gates: jax.Array, capacity: int
                     ) -> Tuple[jax.Array, jax.Array]:
    """Position tokens inside expert buffers.

    gates: [B,S,E] (0 where not routed). Returns
    (dispatch [B,S,E,C] one-hot, combine [B,S,E,C] weighted one-hot)."""
    routed = (gates > 0).astype(jnp.int32)           # [B,S,E]
    # position of each token within its expert buffer (per batch row)
    pos = jnp.cumsum(routed, axis=1) * routed - 1    # [B,S,E], -1 = unrouted
    fits = (pos >= 0) & (pos < capacity)
    pos_clipped = jnp.clip(pos, 0, capacity - 1)
    onehot_c = jax.nn.one_hot(pos_clipped, capacity, dtype=gates.dtype)
    dispatch = onehot_c * fits[..., None].astype(gates.dtype)
    combine = dispatch * gates[..., None]
    return dispatch, combine


class MoEMlp(nn.Module):
    """Expert-parallel MLP: router → dispatch einsum → per-expert FFN →
    combine einsum. Stacked expert params [E, ...]; shard dim 0 over
    ``moe.ep_axis`` to get expert parallelism (XLA inserts the all-to-all).
    """

    spec: EncoderSpec
    moe: MoESpec

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True
                 ) -> jax.Array:
        s, m = self.spec, self.moe
        B, S, H = x.shape
        E = m.num_experts
        C = _capacity(S, m.top_k, E, m.capacity_factor)

        logits = nn.Dense(E, use_bias=False, dtype=jnp.float32,
                          param_dtype=s.param_dtype, name="router")(
                              x.astype(jnp.float32))
        gates, aux = router_gates(logits, m.top_k)
        self.sow("intermediates", "moe_aux_loss", aux * m.aux_loss_weight)
        dispatch, combine = dispatch_combine(gates.astype(s.dtype), C)

        w1 = self.param("w1", nn.initializers.lecun_normal(),
                        (E, H, s.intermediate), s.param_dtype)
        b1 = self.param("b1", nn.initializers.zeros_init(),
                        (E, s.intermediate), s.param_dtype)
        w2 = self.param("w2", nn.initializers.lecun_normal(),
                        (E, s.intermediate, H), s.param_dtype)
        b2 = self.param("b2", nn.initializers.zeros_init(),
                        (E, H), s.param_dtype)
        if m.ep_axis is not None:
            # detect the ambient mesh explicitly instead of swallowing
            # errors: a real sharding failure (non-divisible experts, axis
            # typo) must propagate, only the legitimate no-mesh case skips
            from jax._src.mesh import thread_resources
            ambient = thread_resources.env.physical_mesh
            if not ambient.empty and m.ep_axis in ambient.axis_names:
                con = lambda p: jax.lax.with_sharding_constraint(
                    p, jax.sharding.PartitionSpec(m.ep_axis))
                w1, b1, w2, b2 = con(w1), con(b1), con(w2), con(b2)
            elif not ambient.empty:
                import warnings
                warnings.warn(
                    f"MoEMlp: ep_axis={m.ep_axis!r} not in ambient mesh "
                    f"axes {ambient.axis_names} — running without expert "
                    "parallelism")

        # [B,S,H] ⊗ [B,S,E,C] → expert buffers [E, B·C', H]; keep B so the
        # all-to-all stays batched: [B,S,E,C] × [B,S,H] → [E,B,C,H]
        xe = jnp.einsum("bsec,bsh->ebch", dispatch, x.astype(s.dtype))
        h = jnp.einsum("ebch,ehi->ebci", xe, w1.astype(s.dtype))
        h = h + b1[:, None, None, :].astype(s.dtype)
        h = activation(s.act)(h)
        ye = jnp.einsum("ebci,eih->ebch", h, w2.astype(s.dtype))
        ye = ye + b2[:, None, None, :].astype(s.dtype)
        y = jnp.einsum("ebch,bsec->bsh", ye, combine)
        if s.dropout > 0.0:
            y = nn.Dropout(rate=s.dropout)(y, deterministic=deterministic)
        return y


class MoEEncoderBlock(nn.Module):
    """EncoderBlock with the MLP replaced by MoEMlp (pre/post-LN honored)."""

    spec: EncoderSpec
    moe: MoESpec

    @nn.compact
    def __call__(self, x: jax.Array, bias: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        s = self.spec
        ln = lambda name: FusedLayerNorm(epsilon=s.ln_eps, dtype=s.dtype,
                                       param_dtype=s.param_dtype, name=name)
        attn = MultiHeadAttention(s, name="attention")
        mlp = MoEMlp(s, self.moe, name="moe_mlp")
        drop = lambda y: nn.Dropout(rate=s.dropout)(
            y, deterministic=deterministic) if s.dropout > 0.0 else y
        if s.ln_style == "pre":
            x = x + drop(attn(ln("ln1")(x), bias, deterministic=deterministic))
            x = x + mlp(ln("ln2")(x), deterministic=deterministic)
        else:
            x = ln("ln1")(x + drop(attn(x, bias, deterministic=deterministic)))
            x = ln("ln2")(x + mlp(x, deterministic=deterministic))
        return x


class MoETransformerEncoder(nn.Module):
    """TransformerEncoder variant: every ``moe.moe_every``-th block carries
    an MoE MLP, the rest stay dense."""

    spec: EncoderSpec
    moe: MoESpec

    @nn.compact
    def __call__(self, x: jax.Array, bias: Optional[jax.Array] = None,
                 *, deterministic: bool = True) -> jax.Array:
        s = self.spec
        for i in range(s.layers):
            if (i + 1) % self.moe.moe_every == 0:
                x = MoEEncoderBlock(s, self.moe, name=f"layer_{i}")(
                    x, bias, deterministic)
            else:
                x = EncoderBlock(s, name=f"layer_{i}")(x, bias, deterministic)
        if s.final_ln:
            x = FusedLayerNorm(epsilon=s.ln_eps, dtype=s.dtype,
                             param_dtype=s.param_dtype, name="final_ln")(x)
        return x


def collect_aux_loss(intermediates: Any) -> jax.Array:
    """Sum every sown ``moe_aux_loss`` in an intermediates tree."""
    total = jnp.zeros((), jnp.float32)
    for leaf_path, leaf in jax.tree_util.tree_flatten_with_path(
            intermediates)[0]:
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in leaf_path]
        if any(k == "moe_aux_loss" for k in keys):
            total = total + jnp.asarray(leaf, jnp.float32).sum()
    return total
