"""A/B microbench: fused Pallas Adam update (in-kernel PRNG SR) vs the XLA
path (rng-bit-generator dither materialized in HBM) — device time via an
in-jit lax.scan chain, best-of-N. Shapes: the flagship's embedding table
and a typical weight matrix.

Usage: python scripts/adam_bench.py  (on the TPU)
"""

import time

import jax
import jax.numpy as jnp

from mme_tpu.ops.adam_update import adam_update_leaf
from mme_tpu.train.optim import stochastic_round_bf16_pair

SHAPES = [
    ((50265, 768), "embedding"),
    ((3072, 768), "mlp fc2"),
]
B1, B2, EPS = 0.9, 0.999, 1e-8
CHAIN = 50
BEST_OF = 5


def xla_update(g, mu, nu, bc1, bc2, key):
    m32 = B1 * mu.astype(jnp.float32) + (1 - B1) * g
    n32 = B2 * nu.astype(jnp.float32) + (1 - B2) * g * g
    out = (m32 / bc1) / (jnp.sqrt(n32 / bc2) + EPS)
    mu2, nu2 = stochastic_round_bf16_pair(m32, n32, key)
    return out, mu2, nu2


def chained(use_fused, shape):
    @jax.jit
    def run(g, mu, nu):
        bc1 = jnp.float32(0.5)
        bc2 = jnp.float32(0.1)
        key0 = jax.random.key_data(jax.random.key(0, impl="rbg"))

        def body(carry, i):
            g, mu, nu, kd = carry
            key = jax.random.wrap_key_data(kd, impl="rbg")
            nk, sub = jax.random.split(key)
            if use_fused:
                seed = jax.lax.bitcast_convert_type(
                    jax.random.bits(sub, (2,), jnp.uint32), jnp.int32)
                out, mu, nu = adam_update_leaf(
                    g, mu, nu, bc1, bc2, seed, 0, b1=B1, b2=B2, eps=EPS)
            else:
                out, mu, nu = xla_update(g, mu, nu, bc1, bc2, sub)
            return (g + 1e-30 * out, mu, nu,
                    jax.random.key_data(nk)), None

        (g, mu, nu, _), _ = jax.lax.scan(
            body, (g, mu, nu, key0), None, length=CHAIN)
        return (g[0, 0] + mu[0, 0].astype(jnp.float32)
                + nu[0, 0].astype(jnp.float32))

    return run


def main():
    for shape, label in SHAPES:
        k = jax.random.key(1)
        g = jax.random.normal(k, shape, jnp.float32) * 0.01
        mu = jnp.zeros(shape, jnp.bfloat16)
        nu = jnp.zeros(shape, jnp.bfloat16)
        fns = {"xla": chained(False, shape),
               "fused": chained(True, shape)}
        for f in fns.values():
            float(f(g, mu, nu))
        best = {kk: float("inf") for kk in fns}
        for _ in range(BEST_OF):
            for name, f in fns.items():
                t0 = time.perf_counter()
                float(f(g, mu, nu))
                best[name] = min(best[name],
                                 (time.perf_counter() - t0) / CHAIN)
        n = shape[0] * shape[1]
        print(f"{label:10s} {shape} ({n/1e6:.1f}M): "
              f"xla {best['xla']*1e6:7.1f} us  "
              f"fused {best['fused']*1e6:7.1f} us  "
              f"speedup {best['xla']/best['fused']:.2f}x")


if __name__ == "__main__":
    main()
