"""use_accum=False (no gradient-accumulation buffer): identical updates to
the accumulating step at every-step-apply, ~params-sized HBM saved."""

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from mme_tpu.train.steps import TrainState, make_train_step


class Tiny(nn.Module):
    @nn.compact
    def __call__(self, batch, *, deterministic=True):
        return nn.Dense(3)(batch["x"])


def setup(use_accum):
    model = Tiny()
    x = {"x": jnp.ones((4, 8), jnp.float32)}
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-2))

    def apply_fn(variables, batch, deterministic=True, rngs=None,
                 mutable=None):
        return model.apply(variables, batch, deterministic=deterministic,
                           rngs=rngs)

    state = TrainState.create(params, tx, use_accum=use_accum)
    step = make_train_step(apply_fn, tx, num_classes=3, donate=False)
    return state, step, x


def test_no_accum_matches_accum_on_every_step_apply():
    labels = jnp.asarray([0, 1, 2, 0])
    mask = jnp.ones((4,), jnp.int32)
    cw = jnp.ones((3,), jnp.float32)
    one = jnp.asarray(1.0, jnp.float32)
    yes = jnp.asarray(True)
    rng = jax.random.PRNGKey(1)

    s_acc, step_acc, x = setup(True)
    s_no, step_no, _ = setup(False)
    assert s_no.accum_grads is None and s_acc.accum_grads is not None

    for _ in range(3):
        s_acc, l1, cm1, g1 = step_acc(s_acc, x, labels, mask, cw, one,
                                      yes, rng)
        s_no, l2, cm2, g2 = step_no(s_no, x, labels, mask, cw, one,
                                    yes, rng)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
        s_acc.params, s_no.params)
