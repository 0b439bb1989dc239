"""bf16 vs dynamic-int8 conv front-end rate comparison (VERDICT r1 item 4).

Per XLS-R conv layer shape, times with the carry-dependent scan-of-K
harness (CLAUDE.md: each iteration must depend on the carry or XLA hoists
the forward):

  - bf16:   conv (the shipping eval path)
  - int8:   dynamic per-tensor abs-max quantize(x) -> int8 x int8 conv
            (preferred_element_type int32, 2x MXU rate on v5e) -> bf16
            dequant epilogue (weight scale folded per output channel)

plus the full 7-layer stack both ways (LN+GELU stay bf16 — only the convs
change, as w8a8 would ship it).

    python tools/conv_int8_probe.py [B]
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
    float(jfn(*args))  # host readback: block_until_ready no-ops via relay
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
    def many(x, *params):
        def body(carry, _):
            out = one(x * (1.0 + carry * 1e-30).astype(x.dtype), *params)
            return carry + jnp.sum(out.astype(jnp.float32)) * 1e-30, None
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
        return out
    return many


def conv_bf16(x, kern, stride):
    return jax.lax.conv_general_dilated(
        x, kern, (stride,), "VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=x.dtype)


def conv_int8(x, kern_i8, k_scale, stride):
    """Dynamic per-tensor activation quant + int8 MXU conv + bf16 dequant.

    k_scale: (cout,) f32 per-output-channel weight scales.
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    x_scale = jnp.maximum(amax, 1e-8) / 127.0
    x_i8 = jnp.clip(jnp.round(x.astype(jnp.float32) / x_scale),
                    -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        x_i8, kern_i8, (stride,), "VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (x_scale * k_scale)).astype(jnp.bfloat16)


def ln_gelu(x):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.var(x, axis=-1, keepdims=True)
    return jax.nn.gelu((x - m) * jax.lax.rsqrt(v + 1e-5), approximate=False)


def quant_kernel(kern):
    """Per-output-channel symmetric int8 weights."""
    k = np.asarray(kern, np.float32)
    scale = np.maximum(np.abs(k).max(axis=(0, 1)), 1e-8) / 127.0
    vals = np.clip(np.round(k / scale), -127, 127).astype(np.int8)
    return vals, scale.astype(np.float32)


# layer geometry
L = 64000
shapes = []
cin = 1
for (dim, k, s) in cfg.conv_layers:
    shapes.append((L, cin, dim, k, s))
    L = (L - k) // s + 1
    cin = dim

kerns = []
for (Lin, ci, co, k, s) in shapes:
    kerns.append(np.asarray(rng.standard_normal((k, ci, co)) * 0.05,
                            np.float32))

tot_bf16 = tot_int8 = 0.0
for i, ((Lin, ci, co, k, s), kern) in enumerate(zip(shapes, kerns)):
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((B, Lin, ci)) * 0.1, jnp.bfloat16))
    kb = jax.device_put(jnp.asarray(kern, jnp.bfloat16))
    vals, scale = quant_kernel(kern)
    vi = jax.device_put(jnp.asarray(vals))
    sc = jax.device_put(jnp.asarray(scale))
    log(f"-- layer {i}: ({B},{Lin},{ci}) k={k} s={s} -> {co}ch")
    tot_bf16 += timeit(f"  L{i} bf16", scanned(
        lambda x, kk, s=s: conv_bf16(x, kk, s)), x, kb)
    tot_int8 += timeit(f"  L{i} int8", scanned(
        lambda x, v, sc, s=s: conv_int8(x, v, sc, s)), x, vi, sc)

log(f"== conv-only totals: bf16 {tot_bf16/B*1000:.1f} us/clip, "
    f"int8 {tot_int8/B*1000:.1f} us/clip "
    f"({tot_bf16/max(tot_int8,1e-9):.2f}x) ==")


# full stack (conv + LN + GELU chained), both ways
def stack_bf16(wave, *kerns_b):
    x = wave
    for (Lin, ci, co, k, s), kb in zip(shapes, kerns_b):
        x = conv_bf16(x, kb, s)
        x = ln_gelu(x)
    return x


def stack_int8(wave, *vs):
    x = wave
    n = len(shapes)
    for (Lin, ci, co, k, s), vi, sc in zip(shapes, vs[:n], vs[n:]):
        x = conv_int8(x, vi, sc, s)
        x = ln_gelu(x)
    return x


wave = jax.device_put(jnp.asarray(
    rng.standard_normal((B, 64000, 1)) * 0.1, jnp.bfloat16))
kerns_b = [jax.device_put(jnp.asarray(kq, jnp.bfloat16)) for kq in kerns]
qs = [quant_kernel(kq) for kq in kerns]
vis = [jax.device_put(jnp.asarray(v)) for v, _ in qs]
scs = [jax.device_put(jnp.asarray(s)) for _, s in qs]

t_b = timeit("stack bf16", scanned(stack_bf16), wave, *kerns_b)
t_i = timeit("stack int8", scanned(stack_int8), wave, *(vis + scs))
log(f"== stack totals: bf16 {t_b/B*1000:.1f} us/clip, "
    f"int8 {t_i/B*1000:.1f} us/clip ({t_b/max(t_i,1e-9):.2f}x) ==")

# numeric drift of the int8 stack vs bf16 (decision input: score safety)
out_b = jax.jit(stack_bf16)(wave, *kerns_b)
out_i = jax.jit(stack_int8)(wave, *(vis + scs))
d = np.abs(np.asarray(out_b, np.float32) - np.asarray(out_i, np.float32))
r = np.abs(np.asarray(out_b, np.float32))
log(f"stack output drift: max {d.max():.4f} mean {d.mean():.5f} "
    f"(out scale ~{r.mean():.4f})")
