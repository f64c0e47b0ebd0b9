"""Ring-attention LOCAL block: dense einsum hop vs Pallas flash hop on one
chip, at the local shapes an sp ring would run (global S = 3k-12k over
sp=8 → local 384-1536).

Multi-chip hardware isn't reachable here (one v5e chip through the
tunnel), so the ring's ICI rotations can't be timed — but the verdictable
question ("does the sp path still pay unfused local attention?",
VERDICT r3/r4) is about the PER-HOP compute: each of the n hops runs
attention of [B, H, S_local, D] queries against one [S_local] K/V block.
This script times exactly that pair, fwd+bwd, best-of-N:

- dense hop: the einsum body of ops/ring_attention.py::_ring_attention_local
  (one rotation's worth: scores + online-softmax update);
- flash hop: the Pallas fused forward + merged backward on the same block
  (what _ring_flash_packed runs per hop since round 5).

Usage: python scripts/ring_local_bench.py     (compiles ~8 programs)
       RING_SP=8 RING_GLOBALS=3072,6144,12288 python scripts/ring_local_bench.py
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

BEST_OF = 5


def dense_hop(q, k, v, kbias):
    """One einsum ring hop (scores + PV), fp32 softmax state — the compute
    of _ring_attention_local's body minus the ppermute."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32)
    s = s * (1.0 / (q.shape[-1] ** 0.5)) + kbias[:, None, None, :]
    m = s.max(axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = p.sum(axis=-1, keepdims=True)
    acc = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return (acc / l).astype(q.dtype)


def flash_hop(q, k, v, kbias):
    from mme_tpu.ops.flash_attention import flash_attention
    return flash_attention(q, k, v, kbias[:, None, None, :])


STEPS = 20


def timed(fn, args):
    """fwd+bwd chained STEPS times INSIDE one jit (data-dependent carry) —
    per-dispatch tunnel latency (~25 ms round trip) would otherwise drown
    the per-hop compute. Returns seconds per fwd+bwd."""
    q0, k, v, kbias = args

    @jax.jit
    def run(q):
        def body(q, _):
            l, g = jax.value_and_grad(
                lambda q_, k_, v_: (fn(q_, k_, v_, kbias) ** 2).sum(),
                argnums=(0, 1, 2))(q, k, v)
            # fold ALL grads into the carry so none can be DCE'd
            return q + 1e-6 * (g[0] + g[1] + g[2]), l
        q, ls = jax.lax.scan(body, q, None, length=STEPS)
        return ls[-1]

    float(run(q0))                          # compile + sync
    best = float("inf")
    for _ in range(BEST_OF):
        t0 = time.perf_counter()
        l = run(q0)
        _ = float(l)                        # host transfer = device sync
        best = min(best, time.perf_counter() - t0)
    return best / STEPS


def main():
    sp = int(os.environ.get("RING_SP", "8"))
    globals_ = [int(x) for x in os.environ.get(
        "RING_GLOBALS", "3072,6144,12288").split(",")]
    B = int(os.environ.get("RING_B", "1"))
    H, D = 12, 64
    rng = np.random.RandomState(0)
    print(f"# per-hop local block, sp={sp}, B={B} H={H} D={D}, bf16, "
          f"fwd+bwd best-of-{BEST_OF}")
    for S in globals_:
        Sl = S // sp
        q, k, v = (jnp.asarray(rng.randn(B, H, Sl, D), jnp.bfloat16)
                   for _ in range(3))
        kbias = jnp.zeros((B, Sl), jnp.float32)
        t_d = timed(dense_hop, (q, k, v, kbias))
        t_f = timed(flash_hop, (q, k, v, kbias))
        print(f"S_global={S:6d} S_local={Sl:5d}: dense {t_d*1e3:7.2f} ms  "
              f"flash {t_f*1e3:7.2f} ms  ({t_d/t_f:.2f}x)")


if __name__ == "__main__":
    main()
