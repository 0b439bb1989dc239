"""Per-layer timing of the wav2vec2 conv front-end at batch B.

The full front-end measures ~0.556 ms/clip at b128 but its MXU compute
floor is ~0.05 ms/clip — this probe breaks the stack into per-layer conv /
norm / activation pieces and compares three conv lowerings (XLA nn.Conv,
k-matmul "dots", im2col one-matmul) to find where the time goes.

Carry-dependent scan-of-K per dispatch (CLAUDE.md): each iteration must
depend on the carry or XLA hoists the loop-invariant forward.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rtdsd_tpu.utils.cache import enable_persistent_compile_cache

enable_persistent_compile_cache()


def log(m):
    print(m, file=sys.stderr, flush=True)


import jax
import jax.numpy as jnp
import numpy as np

from rtdsd_tpu.models.wav2vec2 import Wav2Vec2Config

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
K = 32
cfg = Wav2Vec2Config()
rng = np.random.default_rng(0)


def timeit(tag, fn, *args):
    jfn = jax.jit(fn)
    t0 = time.time()
    float(jfn(*args))  # host readback: block_until_ready is a no-op via relay
    compile_s = time.time() - t0
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        float(jfn(*args))
        ts.append((time.perf_counter() - t0) / K * 1000)
    log(f"{tag}: {min(ts):8.3f} ms/call ({min(ts)/B*1000:7.1f} us/clip)"
        f"  [compile {compile_s:.1f}s]")
    return min(ts)


def scanned(one):
    """Wrap a single-step fn into a carry-dependent scan of K."""
    def many(x, *params):
        def body(carry, _):
            out = one(x * (1.0 + carry * 1e-30).astype(x.dtype), *params)
            return carry + jnp.sum(out.astype(jnp.float32)) * 1e-30, None
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
        return out
    return many


def conv_xla(x, kern, stride):
    return jax.lax.conv_general_dilated(
        x, kern, (stride,), "VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=x.dtype)


def conv_dots(x, kern, stride):
    k = kern.shape[0]
    frames = (x.shape[1] - k) // stride + 1
    y = None
    for j in range(k):
        xs = jax.lax.slice_in_dim(x, j, j + stride * (frames - 1) + 1,
                                  stride, axis=1)
        t = jnp.einsum("btc,co->bto", xs, kern[j],
                       preferred_element_type=x.dtype)
        y = t if y is None else y + t
    return y


def conv_im2col(x, kern, stride):
    k, cin, cout = kern.shape
    frames = (x.shape[1] - k) // stride + 1
    cols = [jax.lax.slice_in_dim(x, j, j + stride * (frames - 1) + 1,
                                 stride, axis=1) for j in range(k)]
    patches = jnp.concatenate(cols, axis=-1)  # (B, frames, k*cin)
    return jnp.einsum("btc,co->bto", patches, kern.reshape(k * cin, cout),
                      preferred_element_type=x.dtype)


def ln_gelu(x):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.var(x, axis=-1, keepdims=True)
    return jax.nn.gelu((x - m) * jax.lax.rsqrt(v + 1e-5), approximate=False)


def gelu_only(x):
    return jax.nn.gelu(x, approximate=False)


# layer geometry of the XLS-R front-end
L = 64000
shapes = []
cin = 1
for (dim, k, s) in cfg.conv_layers:
    shapes.append((L, cin, dim, k, s))
    L = (L - k) // s + 1
    cin = dim

total = {"xla": 0.0, "dots": 0.0, "im2col": 0.0, "lngelu": 0.0}
for i, (Lin, cin, cout, k, s) in enumerate(shapes):
    x = jax.device_put(jnp.asarray(
        (rng.standard_normal((B, Lin, cin)) * 0.1), jnp.bfloat16))
    kern = jax.device_put(jnp.asarray(
        rng.standard_normal((k, cin, cout)) * 0.05, jnp.bfloat16))
    log(f"-- layer {i}: ({B},{Lin},{cin}) -> k={k} s={s} -> {cout}ch")
    total["xla"] += timeit(f"  L{i} conv xla   ",
                           scanned(lambda x, kk, s=s: conv_xla(x, kk, s)),
                           x, kern)
    total["dots"] += timeit(f"  L{i} conv dots  ",
                            scanned(lambda x, kk, s=s: conv_dots(x, kk, s)),
                            x, kern)
    total["im2col"] += timeit(f"  L{i} conv im2col",
                              scanned(lambda x, kk, s=s: conv_im2col(x, kk, s)),
                              x, kern)
    Lout = (Lin - k) // s + 1
    y = jax.device_put(jnp.asarray(
        rng.standard_normal((B, Lout, cout)) * 0.1, jnp.bfloat16))
    total["lngelu"] += timeit(f"  L{i} ln+gelu    ", scanned(ln_gelu), y)
    if i == 0:
        timeit(f"  L{i} gelu only  ", scanned(gelu_only), y)

log("== totals per clip ==")
for kk, v in total.items():
    log(f"  {kk:8s}: {v/B*1000:7.1f} us/clip"
        + ("  (conv+ln+gelu stack)" if kk == "lngelu" else ""))
