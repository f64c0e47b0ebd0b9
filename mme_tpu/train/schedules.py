"""LR schedules.

Capability parity: torch ``CosineAnnealingWarmRestarts(T_0=T_max)`` stepped
with fractional epochs (reference ``train_model/tav_train.py:149,63`` —
``scheduler.step(epoch + batch_idx / iters)``) and the older
``CosineAnnealingLR`` (``SingleModels/train_model/audio_training.py:65``).
Implemented as optax-style step→lr functions (pure, jit-friendly).
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_warm_restarts(base_lr: float, t_0: int, steps_per_epoch: int,
                         t_mult: int = 1, eta_min: float = 0.0):
    """SGDR: lr = eta_min + (base−eta_min)/2·(1+cos(π·T_cur/T_i)).

    ``t_0`` is in epochs (the reference's T_max flag); the returned schedule
    maps optimizer step → lr using the same fractional-epoch convention.
    Only t_mult=1 is exposed (the reference never sets t_mult)."""
    assert t_mult == 1, "reference uses default t_mult=1"

    def schedule(step):
        epoch_float = step / steps_per_epoch
        t_cur = jnp.mod(epoch_float, t_0)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * t_cur / t_0))
        return eta_min + (base_lr - eta_min) * cos

    return schedule


def cosine_annealing(base_lr: float, t_max: int, steps_per_epoch: int,
                     eta_min: float = 0.0):
    """Non-restarting cosine (torch CosineAnnealingLR), epoch-granular."""

    def schedule(step):
        epoch = jnp.floor(step / steps_per_epoch)
        t_cur = jnp.minimum(epoch, t_max)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * t_cur / t_max))
        return eta_min + (base_lr - eta_min) * cos

    return schedule
