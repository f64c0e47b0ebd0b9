"""A/B microbench: fused Pallas LayerNorm vs XLA (flax math) at the bench
towers' exact shapes — DEVICE time via an in-jit lax.scan chain (the axon
tunnel costs ~1 ms per python dispatch, so per-call loops measure nothing
but overhead). fwd+bwd chained through dx; best-of-N windows.

Usage: python scripts/ln_bench.py  (on the TPU; ~3 min incl. compiles)
"""

import time

import jax
import jax.numpy as jnp

from mme_tpu.ops.layer_norm import fused_layer_norm

SHAPES = [  # (rows, h, label)
    (8 * 1464, 768, "video 12L"),
    (8 * 299, 1024, "audio 24L"),
    (8 * 473, 768, "fusion 12L"),
]
CHAIN = 100
BEST_OF = 5


def xla_ln(x, s, b, eps=1e-12):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x32 * x32, axis=-1, keepdims=True)
                      - mean * mean, 0.0)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps) * s + b
    return y.astype(x.dtype)


def chained(fn):
    """One jitted program: CHAIN × (fwd+bwd), each step consuming the
    previous dx so nothing can be elided or overlapped away."""

    def loss(x, s, b):
        return jnp.sum(fn(x, s, b).astype(jnp.float32))

    grad = jax.grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def run(x, s, b):
        def body(carry, _):
            x, s, b = carry
            dx, ds, db = grad(x, s, b)
            # 1e-30 (not 0.0): a literal zero could legalize mul→0 folding
            return (x + 1e-30 * dx, s + 1e-30 * ds, b + 1e-30 * db), None

        (x, s, b), _ = jax.lax.scan(body, (x, s, b), None, length=CHAIN)
        return x[0, 0].astype(jnp.float32)

    return run


def main():
    for rows, h, label in SHAPES:
        x = jax.random.normal(jax.random.key(0), (rows, h),
                              jnp.float32).astype(jnp.bfloat16)
        s = jnp.ones((h,), jnp.float32)
        b = jnp.zeros((h,), jnp.float32)
        fns = {"xla": chained(xla_ln),
               "fused": chained(lambda x, s, b: fused_layer_norm(
                   x, s, b, 1e-12))}
        for f in fns.values():
            float(f(x, s, b))  # compile + warm
        best = {k: float("inf") for k in fns}
        for _ in range(BEST_OF):
            for name, f in fns.items():
                t0 = time.perf_counter()
                float(f(x, s, b))  # host transfer = honest sync
                best[name] = min(best[name],
                                 (time.perf_counter() - t0) / CHAIN)
        print(f"{label:12s} [{rows}x{h}] fwd+bwd/iter: "
              f"xla {best['xla']*1e6:7.1f} us  "
              f"fused {best['fused']*1e6:7.1f} us  "
              f"speedup {best['xla']/best['fused']:.2f}x")


if __name__ == "__main__":
    main()
