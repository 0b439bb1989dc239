"""Transformer micro-optimization probe on TPU (batch 128, 24 layers)."""

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

B, T, D, F, H, L = 128, 199, 1024, 4096, 16, 24
DH = D // H
rng = np.random.default_rng(0)
x_np = (rng.standard_normal((B, T, D)) * 0.1).astype(np.float32)


def mk(shape):
    return jnp.asarray((rng.standard_normal(shape) * 0.02).astype(np.float32))


params = {
    "qkv": mk((L, D, 3 * D)), "qkv_b": mk((L, 3 * D)),
    "q": mk((L, D, D)), "k": mk((L, D, D)), "v": mk((L, D, D)),
    "qb": mk((L, D)), "kb": mk((L, D)), "vb": mk((L, D)),
    "o": mk((L, D, D)), "ob": mk((L, D)),
    "f1": mk((L, D, F)), "f1b": mk((L, F)),
    "f2": mk((L, F, D)), "f2b": mk((L, D)),
    "ln1s": jnp.ones((L, D)), "ln1b": jnp.zeros((L, D)),
    "ln2s": jnp.ones((L, D)), "ln2b": jnp.zeros((L, D)),
}
params = jax.device_put(jax.tree_util.tree_map(
    lambda a: a.astype(jnp.bfloat16) if a.ndim >= 2 else a, params))
x_dev = jax.device_put(jnp.asarray(x_np))


def ln(x, s, b):
    m = x.mean(-1, keepdims=True)
    v = ((x - m) ** 2).mean(-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + 1e-5) * s + b


def layer(x, p, mode):
    xb = x.astype(jnp.bfloat16)
    h = ln(xb.astype(jnp.float32), p["ln1s"], p["ln1b"]).astype(jnp.bfloat16)
    if mode == "noattn":
        attn = h
    else:
        if mode == "fusedqkv":
            qkv = h @ p["qkv"] + p["qkv_b"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = h @ p["q"] + p["qb"]
            k = h @ p["k"] + p["kb"]
            v = h @ p["v"] + p["vb"]
        q = q.reshape(B, T, H, DH)
        k = k.reshape(B, T, H, DH)
        v = v.reshape(B, T, H, DH)
        if mode == "einsum":
            s = jnp.einsum("bihd,bjhd->bhij", q, k) * (DH ** -0.5)
            a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(jnp.bfloat16)
            attn = jnp.einsum("bhij,bjhd->bihd", a, v).reshape(B, T, D)
        else:
            attn = jax.nn.dot_product_attention(q, k, v).reshape(B, T, D)
    x = x + (attn @ p["o"] + p["ob"]).astype(x.dtype)
    h = ln(x, p["ln2s"], p["ln2b"]).astype(jnp.bfloat16)
    h = jax.nn.gelu(h @ p["f1"] + p["f1b"], approximate=False)
    return x + (h @ p["f2"] + p["f2b"]).astype(x.dtype)


def run(mode):
    def f(params, x):
        def body(c, lp):
            return layer(c, lp, mode), None
        y, _ = jax.lax.scan(body, x, params)
        return y.sum()

    g = jax.jit(f)
    t0 = time.time()
    np.asarray(g(params, x_dev))
    c = time.time() - t0
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        np.asarray(g(params, x_dev))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts)) * 1000
    log(f"{mode:10s} compile {c:5.1f}s  call {med:7.2f} ms  "
        f"per-clip {med / B:6.3f} ms")


for mode in ["base", "fusedqkv", "einsum", "noattn"]:
    run(mode)


def run_flash():
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)

    TP = 256  # padded seq

    def f(params, x):
        def body(c, p):
            xb = c.astype(jnp.bfloat16)
            h = ln(xb.astype(jnp.float32), p["ln1s"],
                   p["ln1b"]).astype(jnp.bfloat16)
            q = (h @ p["q"] + p["qb"]).reshape(B, T, H, DH)
            k = (h @ p["k"] + p["kb"]).reshape(B, T, H, DH)
            v = (h @ p["v"] + p["vb"]).reshape(B, T, H, DH)
            pad = [(0, 0), (0, TP - T), (0, 0), (0, 0)]
            q = jnp.pad(q, pad).transpose(0, 2, 1, 3)  # (B,H,TP,DH)
            k = jnp.pad(k, pad).transpose(0, 2, 1, 3)
            v = jnp.pad(v, pad).transpose(0, 2, 1, 3)
            seg = (jnp.arange(TP) < T).astype(jnp.int32)[None, :].repeat(B, 0)
            attn = flash_attention(
                q, k, v, segment_ids=SegmentIds(q=seg, kv=seg),
                sm_scale=DH ** -0.5)
            attn = attn.transpose(0, 2, 1, 3)[:, :T].reshape(B, T, D)
            x2 = c + (attn @ p["o"] + p["ob"]).astype(c.dtype)
            h = ln(x2, p["ln2s"], p["ln2b"]).astype(jnp.bfloat16)
            h = jax.nn.gelu(h @ p["f1"] + p["f1b"], approximate=False)
            return x2 + (h @ p["f2"] + p["f2b"]).astype(x2.dtype), None

        y, _ = jax.lax.scan(body, x, params)
        return y.sum()

    g = jax.jit(f)
    t0 = time.time()
    np.asarray(g(params, x_dev))
    c = time.time() - t0
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        np.asarray(g(params, x_dev))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts)) * 1000
    log(f"{'flash':10s} compile {c:5.1f}s  call {med:7.2f} ms  "
        f"per-clip {med / B:6.3f} ms")


if os.environ.get("PROBE_FLASH"):
    run_flash()
