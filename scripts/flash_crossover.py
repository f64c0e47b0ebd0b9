"""Flash-vs-XLA dispatch crossover at the real tower shapes (B, H, S, D):
audio 8x16x299, fusion 8x12x473, text 8x12x70, and 8x16x512 - fwd+bwd with
grads on q/k/v and a key-mask bias (the production call shape). Feeds the
`seq >= 448` dispatcher threshold in ops/attention.py::_decide_flash."""
import json, os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_mme")
import jax, jax.numpy as jnp

STEPS, WINDOWS = 10, 3
def bench(fn, *args):
    out = fn(*args); _ = float(out)
    best = float("inf")
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(STEPS): acc = acc + fn(*args) * 0.0
        _ = float(acc)
        best = min(best, (time.perf_counter() - t0) / STEPS)
    return best * 1e3

def run_shape(B, H, S, D):
    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, S, H, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, S, H, D), jnp.bfloat16)
    keep = jnp.ones((B, S)).at[:, S - S // 8:].set(0.0)
    from mme_tpu.ops.attention import dot_product_attention_shd, additive_mask
    bias = additive_mask(keep)
    def make(flash):
        @jax.jit
        def run(q, k, v):
            def loss(q_, k_, v_):
                o = dot_product_attention_shd(q_, k_, v_, bias, use_flash=flash)
                return jnp.sum(o.astype(jnp.float32) ** 2)
            l, g = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)
            return l + sum(jnp.sum(jnp.abs(x)) for x in g) * 0.0
        return run
    r = {}
    for name, flash in (("xla", False), ("flash", True)):
        try: r[name] = round(bench(make(flash), q, k, v), 3)
        except Exception as e: r[name] = str(e)[:100]
    r.update(B=B, H=H, S=S, D=D)
    print(json.dumps(r), flush=True)

for shp in ((8, 16, 299, 64), (8, 12, 473, 64), (8, 12, 70, 64), (8, 16, 512, 64)):
    run_shape(*shp)
