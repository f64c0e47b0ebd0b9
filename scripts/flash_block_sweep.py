"""Flash-attention block-size sweep at the video-tower shape
(B8 H12 S1464 D64, fwd+bwd) vs XLA attention. Interleaved same-process
timing; honest host-transfer sync."""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_mme")

import jax
import jax.numpy as jnp

B, H, S, D = (int(os.environ.get(k, d)) for k, d in
              (("FB_B", 8), ("FB_H", 12), ("FB_S", 1464), ("FB_D", 64)))
STEPS = 10
WINDOWS = 3


def bench(fn, *args):
    out = fn(*args)
    _ = float(jnp.sum(out))
    best = float("inf")
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(STEPS):
            acc = acc + jnp.sum(fn(*args)) * 0.0
        _ = float(acc)
        best = min(best, (time.perf_counter() - t0) / STEPS)
    return best * 1e3


def main():
    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, H, S, D), jnp.bfloat16)

    from mme_tpu.ops.attention import _xla_attention

    def make_fwdbwd(attn):
        @jax.jit
        def run(q, k, v):
            def loss(q_):
                return jnp.sum(attn(q_, k, v).astype(jnp.float32) ** 2)
            l, g = jax.value_and_grad(loss)(q)
            return l + jnp.sum(jnp.abs(g)) * 0.0
        return run

    xla = make_fwdbwd(lambda q_, k_, v_: _xla_attention(q_, k_, v_, None,
                                                        jnp.float32))
    print(json.dumps({"cfg": "xla", "ms": round(bench(xla, q, k, v), 2)}),
          flush=True)

    for bq, bk in ((256, 512), (512, 512), (512, 1024), (256, 1464),
                   (128, 512), (512, S), (S, S)):
        os.environ["MME_FLASH_BQ"] = str(bq)
        os.environ["MME_FLASH_BK"] = str(bk)
        # env vars are read at trace time; make_fwdbwd builds a fresh
        # jitted fn per config, which is what picks them up
        import mme_tpu.ops.flash_attention as fa
        fl = make_fwdbwd(lambda q_, k_, v_: fa.flash_attention(q_, k_, v_,
                                                               None))
        try:
            ms = bench(fl, q, k, v)
            print(json.dumps({"cfg": f"flash bq={bq} bk={bk}",
                              "ms": round(ms, 2)}), flush=True)
        except Exception as e:
            print(json.dumps({"cfg": f"flash bq={bq} bk={bk}",
                              "error": str(e)[:120]}), flush=True)


if __name__ == "__main__":
    main()
