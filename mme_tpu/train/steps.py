"""The generic jitted train/eval step.

One compiled program implements every loop variant in the reference
(``train_model/tav_train.py:52-120`` not_grad_accum/grad_accum and the
single/double-model trainers): the epoch-parity loss switch arrives as a
weight vector, dialog-aligned accumulation as a per-step ``apply_update``
flag + ``loss_scale``, so policy phases never retrace. One exception: the
accumulation BUFFER is hydrated only on dialog-accum epochs (its HBM
traffic costs ~19% step time, BASELINE.md), so dialog datasets compile
two step structures — a one-time cost per shape, amortized by the
persistent compile cache.

TPU design: gradients accumulate in a buffer inside the train state
(replacing the reference's redundant per-batch optimizer stepping,
``train_model/tav_train.py:96-105``); ``optax.clip_by_global_norm`` + AdamW
(torch-parity hyperparameters) run under ``lax.cond`` on the boundary flag.
The confusion-matrix update happens inside the step, so metrics ride the
same XLA program (and a single psum in the sharded case).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from mme_tpu.evals.metrics import confusion_matrix
from mme_tpu.train.losses import cross_entropy


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    accum_grads: Any
    accum_count: jax.Array
    batch_stats: Any = None

    @classmethod
    def create(cls, params: Any, tx: optax.GradientTransformation,
               batch_stats: Any = None,
               use_accum: bool = True) -> "TrainState":
        """``use_accum=False`` drops the gradient-accumulation buffer —
        a full params-sized fp32 tree (~2.4 GB for the flagship TAV). Use
        when dialog accumulation is off (every non-TAV entry, the bench):
        the freed HBM buys a bigger batch."""
        zeros = (jax.tree.map(jnp.zeros_like, params) if use_accum
                 else None)
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), accum_grads=zeros,
                   accum_count=jnp.zeros((), jnp.int32),
                   batch_stats=batch_stats)


HIST_BUCKETS = 17  # bucket 0: exact zeros; 1..16: |x| exponent ranges


def magnitude_histogram(tree: Any) -> jax.Array:
    """17-bucket magnitude histogram over every element of a pytree.

    Bucket 0 counts exact zeros; bucket ``i`` (1..16) counts elements with
    ``floor(log2 |x|)`` in ``[-40 + 3(i-1), -40 + 3i)`` (clipped at the
    ends), spanning ~1e-12 .. ~3e2. The on-device summary for
    ``MME_LOG_HISTS=1`` — the reference uploads full weight/grad
    histograms to wandb every step (``wandb.watch(log="all")``,
    ``tav_nn.py:103-104``); a fixed-bucket exponent histogram carries the
    same debugging signal (dead/underflowing/exploding tensors) in 17
    ints per module instead of histogram-sized transfers.

    Non-finite elements (NaN, ±Inf) count in the TOP bucket (16): naive
    floor/floor-divide arithmetic turns them into NaN → int 0 → the
    tiniest-magnitude bucket, which would report an exploding tensor as
    "many underflowing elements" — the opposite of the divergence signal
    this histogram exists to surface."""
    parts = [jnp.ravel(l).astype(jnp.float32)
             for l in jax.tree.leaves(tree)]
    x = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    finite = jnp.isfinite(x)
    nz = x != 0
    e = jnp.floor(jnp.log2(jnp.where(nz & finite, jnp.abs(x), 1.0)))
    idx = jnp.where(nz, 1 + jnp.clip((e + 40) // 3, 0, 15).astype(jnp.int32),
                    0)
    idx = jnp.where(finite, idx, HIST_BUCKETS - 1)
    return jnp.zeros((HIST_BUCKETS,), jnp.int32).at[idx].add(1)


def make_optimizer(lr_schedule: Callable, weight_decay: float,
                   clip: float,
                   trainable_mask: Any = None,
                   state_dtype: Optional[str] = None
                   ) -> optax.GradientTransformation:
    """clip-by-global-norm → AdamW (torch defaults: b1=.9 b2=.999 eps=1e-8).

    ``trainable_mask``: pytree of bools marking trainable leaves — the
    reference's ``requires_grad`` filtering (frozen backbones,
    ``SingleModels/models/image.py:36-37``) expressed as optax masking.

    ``state_dtype``: "fp32" (default), "bf16", or "factored" — bf16 stores
    the Adam moments in bfloat16 with stochastic rounding (train/optim.py),
    halving optimizer-state HBM traffic and capacity (~17 GB/step → ~12 for
    the 605M-param flagship, BASELINE.md); "factored" additionally replaces
    the second moment with Adafactor's row/col factorization (nu traffic
    → ~0). ``None`` reads ``MME_OPT_STATE``.
    """
    import os
    if state_dtype is None:
        state_dtype = os.environ.get("MME_OPT_STATE", "fp32")
    if state_dtype == "bf16":
        from mme_tpu.train.optim import adamw_lowmem
        adamw = adamw_lowmem(lr_schedule, b1=0.9, b2=0.999, eps=1e-8,
                             weight_decay=weight_decay)
    elif state_dtype == "factored":
        from mme_tpu.train.optim import adamw_factored
        adamw = adamw_factored(lr_schedule, b1=0.9, b2=0.999, eps=1e-8,
                               weight_decay=weight_decay)
    else:
        adamw = optax.adamw(lr_schedule, b1=0.9, b2=0.999, eps=1e-8,
                            weight_decay=weight_decay)
    from mme_tpu.train.optim import clip_by_global_norm_f32
    tx = optax.chain(clip_by_global_norm_f32(clip), adamw)
    if trainable_mask is not None:
        # NOT optax.masked(tx, mask): masked passes the untouched raw
        # gradient through for mask=False leaves, so "frozen" params would
        # still move. multi_transform + set_to_zero actually freezes them.
        labels = jax.tree.map(lambda t: "train" if t else "freeze",
                              trainable_mask)
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels)
    return tx


def make_train_step(apply_fn: Callable, tx: optax.GradientTransformation,
                    num_classes: int,
                    rng_names: Tuple[str, ...] = ("dropout",),
                    has_batch_stats: bool = False,
                    donate: bool = True,
                    has_aux_loss: bool = False,
                    loss_fn: Optional[Callable] = None,
                    log_module_norms: bool = False,
                    log_histograms: bool = False,
                    grads_dtype: Optional[Any] = None):
    """Build the jitted train step.

    ``apply_fn(variables, batch, deterministic, rngs) -> logits`` (or
    ``(logits, new_batch_stats)`` mutable when has_batch_stats; or
    ``(logits, aux_loss)`` when ``has_aux_loss`` — e.g. the MoE
    load-balancing loss, added to the CE term before scaling).
    The returned step:

        state, loss, cm, grad_norm = step(
            state, batch, labels, sample_mask, class_weights, loss_scale,
            apply_update, rng)

    ``loss_fn(logits, labels, class_weights, sample_mask)`` defaults to
    torch-parity cross entropy; ``train/losses.make_loss_fn`` maps the
    reference ``--loss`` flag (FBeta/Precision incl.) onto this seam.
    """
    if loss_fn is None:
        loss_fn = cross_entropy
    if grads_dtype is None:
        import os
        grads_dtype = {"bf16": jnp.bfloat16}.get(
            os.environ.get("MME_GRADS", ""))

    def step(state: TrainState, batch: Dict[str, jax.Array],
             labels: jax.Array, sample_mask: jax.Array,
             class_weights: jax.Array, loss_scale: jax.Array,
             apply_update: jax.Array, rng: jax.Array):
        rngs = {name: jax.random.fold_in(jax.random.fold_in(rng, i),
                                         state.step)
                for i, name in enumerate(rng_names)}

        def objective(params):
            variables = {"params": params}
            if has_batch_stats:
                variables["batch_stats"] = state.batch_stats
                logits, mutated = apply_fn(variables, batch,
                                           deterministic=False, rngs=rngs,
                                           mutable=["batch_stats"])
            else:
                logits = apply_fn(variables, batch, deterministic=False,
                                  rngs=rngs)
                mutated = None
            aux = jnp.zeros((), jnp.float32)
            if has_aux_loss:
                logits, aux = logits
            loss = loss_fn(logits, labels, class_weights, sample_mask)
            loss = loss + aux
            return loss * loss_scale, (logits, mutated)

        (scaled_loss, (logits, mutated)), grads = jax.value_and_grad(
            objective, has_aux=True)(state.params)

        # MME_GRADS=bf16: store the gradient tree in bfloat16 between the
        # backward pass and the optimizer — halves its write + 2×read HBM
        # traffic (~3.6 GB/step on the flagship). Clip norms accumulate
        # fp32 (optim.global_norm_f32) and the low-mem optimizers upcast
        # per-leaf, so only the storage precision drops (the standard
        # bf16-gradient recipe). Use with MME_OPT_STATE=bf16|factored —
        # plain optax.adamw would inherit bf16 moments WITHOUT stochastic
        # rounding from bf16 updates.
        if grads_dtype is not None:
            grads = jax.tree.map(
                lambda g: g.astype(grads_dtype)
                if g.dtype == jnp.float32 else g, grads)

        if state.accum_grads is None:
            # accumulation disabled (TrainState.create(use_accum=False)):
            # every step applies directly — no params-sized buffer in HBM
            updates, new_opt = tx.update(grads, state.opt_state,
                                         state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_accum, new_count = None, jnp.zeros((), jnp.int32)
        else:
            accum = jax.tree.map(jnp.add, state.accum_grads, grads)
            count = state.accum_count + 1

            def do_update(_):
                mean_grads = jax.tree.map(
                    lambda g: g / count.astype(g.dtype), accum)
                updates, new_opt = tx.update(mean_grads, state.opt_state,
                                             state.params)
                new_params = optax.apply_updates(state.params, updates)
                zeros = jax.tree.map(jnp.zeros_like, accum)
                return new_params, new_opt, zeros, jnp.zeros((), jnp.int32)

            def no_update(_):
                return state.params, state.opt_state, accum, count

            new_params, new_opt, new_accum, new_count = jax.lax.cond(
                apply_update, do_update, no_update, None)

        preds = jnp.argmax(logits, axis=-1)
        cm = confusion_matrix(preds, labels, num_classes, sample_mask)
        # gradient observability — the reference records full weight/grad
        # histograms every step (wandb.watch(log="all"), tav_nn.py:103-104).
        # Default: one global scalar. ``log_module_norms``: a per-top-level-
        # module norm dict for both grads and weights (the
        # divergence-debugging signal, without histogram-sized transfers).
        from mme_tpu.train.optim import global_norm_f32
        if (log_module_norms or log_histograms) and isinstance(grads, dict):
            grad_norm = {"total": global_norm_f32(grads)}
            for k, v in grads.items():
                grad_norm[f"grad/{k}"] = global_norm_f32(v)
            for k, v in state.params.items():
                grad_norm[f"param/{k}"] = global_norm_f32(v)
            if log_histograms:
                # full wandb.watch(log="all") parity: per-module value
                # histograms every log line (magnitude-bucketed — the
                # useful axes for divergence/underflow debugging are
                # "how many zeros" and "what exponent range")
                for k, v in grads.items():
                    grad_norm[f"hist/grad/{k}"] = magnitude_histogram(v)
                for k, v in state.params.items():
                    grad_norm[f"hist/param/{k}"] = magnitude_histogram(v)
        else:
            grad_norm = global_norm_f32(grads)

        new_state = state.replace(
            step=state.step + 1, params=new_params, opt_state=new_opt,
            accum_grads=new_accum, accum_count=new_count,
            batch_stats=(mutated["batch_stats"] if mutated is not None
                         else state.batch_stats))
        return new_state, scaled_loss, cm, grad_norm

    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_eval_step(apply_fn: Callable, num_classes: int,
                   has_batch_stats: bool = False,
                   has_aux_loss: bool = False,
                   loss_fn: Optional[Callable] = None):
    """Eval: loss (optional weights) + confusion matrix + per-sample preds
    (for the reference's test-prediction dumps,
    ``SingleModels/train_model/image_training.py:23-28``), deterministic.
    ``has_aux_loss``: apply returns (logits, aux); aux is a training
    regularizer and is excluded from the eval/selection loss."""
    if loss_fn is None:
        loss_fn = cross_entropy

    def step(params: Any, batch_stats: Any, batch: Dict[str, jax.Array],
             labels: jax.Array, sample_mask: jax.Array,
             class_weights: Optional[jax.Array]):
        variables = {"params": params}
        if has_batch_stats:
            variables["batch_stats"] = batch_stats
        logits = apply_fn(variables, batch, deterministic=True, rngs=None)
        if has_aux_loss:
            logits, _ = logits
        loss = loss_fn(logits, labels, class_weights, sample_mask)
        preds = jnp.argmax(logits, axis=-1)
        cm = confusion_matrix(preds, labels, num_classes, sample_mask)
        return loss, cm, preds

    return jax.jit(step)
