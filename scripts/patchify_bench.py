"""Patch-embed (tubelet) formulation bench at the VideoMAE bench shape:
reshape+8D-transpose+matmul (round-2 TubeletEmbed) vs 8-D dot_general vs
2x stride-16 conv2d vs conv3d. The 8-D transpose materialized at 47 GiB/s
(profile: copy.5823, ~2.8 ms/step); conv2d_x2 won and is now the
implementation of record in models/video.py::TubeletEmbed."""
import json, os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_mme")
import jax, jax.numpy as jnp
from jax import lax

B, T, H, W, C = 8, 16, 224, 224, 3
t, p, hid = 2, 16, 768
STEPS, WINDOWS = 10, 3

rng = jax.random.PRNGKey(0)
video = jax.random.normal(rng, (B, T, H, W, C), jnp.bfloat16)
Wk = jax.random.normal(jax.random.PRNGKey(1), (t * p * p * C, hid), jnp.bfloat16)

def bench(fn, *args):
    out = fn(*args); _ = float(out)
    best = float("inf")
    for _ in range(WINDOWS):
        t0 = time.perf_counter(); acc = 0.0
        for _ in range(STEPS): acc = acc + fn(*args) * 0.0
        _ = float(acc)
        best = min(best, (time.perf_counter() - t0) / STEPS)
    return best * 1e3

@jax.jit
def current(v, Wk):
    x = v.reshape(B, T // t, t, H // p, p, W // p, p, C)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    x = x.reshape(B, (T // t) * (H // p) * (W // p), t * p * p * C)
    o = x @ Wk
    return jnp.sum(o.astype(jnp.float32))

@jax.jit
def dotgen(v, Wk):
    x = v.reshape(B, T // t, t, H // p, p, W // p, p, C)
    Wr = Wk.reshape(t, p, p, C, hid)
    # contract (t,p,p,C) = x dims (2,4,6,7) with W dims (0,1,2,3)
    o = lax.dot_general(x, Wr, (((2, 4, 6, 7), (0, 1, 2, 3)), ((), ())),
                        preferred_element_type=jnp.float32)
    return jnp.sum(o)

@jax.jit
def conv2(v, Wk):
    Wr = Wk.reshape(t, p, p, C, hid)
    acc = None
    for i in range(t):
        frames = v.reshape(B, T // t, t, H, W, C)[:, :, i]
        frames = frames.reshape(B * (T // t), H, W, C)
        o = lax.conv_general_dilated(
            frames, Wr[i], (p, p), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        acc = o if acc is None else acc + o
    return jnp.sum(acc)

@jax.jit
def conv3(v, Wk):
    Wr = Wk.reshape(t, p, p, C, hid)
    o = lax.conv_general_dilated(
        v, Wr, (t, p, p), "VALID",
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
        preferred_element_type=jnp.float32)
    return jnp.sum(o)

for name, fn in (("current", current), ("dot_general8d", dotgen),
                 ("conv2d_x2", conv2), ("conv3d", conv3)):
    try:
        print(json.dumps({"impl": name, "ms": round(bench(fn, video, Wk), 3)}), flush=True)
    except Exception as e:
        print(json.dumps({"impl": name, "error": str(e)[:120]}), flush=True)

# numerics check vs current
import numpy as np
ref = float(current(video, Wk))
for name, fn in (("dot_general8d", dotgen), ("conv2d_x2", conv2), ("conv3d", conv3)):
    try:
        print(name, "delta=", abs(float(fn(video, Wk)) - ref) / abs(ref))
    except Exception as e:
        print(name, "ERR", str(e)[:80])
