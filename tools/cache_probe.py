"""Probe: persistent compile cache on the TPU path + fused GAT on real TPU."""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


import jax
import jax.numpy as jnp
import numpy as np

from rtdsd_tpu.models.aasist import AASISTBackend
from rtdsd_tpu.models.wav2vec2 import ConvFeatureExtractor, Wav2Vec2Config
from rtdsd_tpu.utils.init_host import init_variables_host

B = 128
cfg = dataclasses.replace(Wav2Vec2Config(), conv_impl="conv")
fe = ConvFeatureExtractor(cfg, jnp.bfloat16)
wave_np = np.zeros((B, 64000), np.float32)
v = jax.device_put(init_variables_host(fe, jnp.asarray(wave_np[:2])))
jax.block_until_ready(v)
x = jax.device_put(jnp.asarray(wave_np))
f = jax.jit(lambda v, x: fe.apply(v, x).sum())
t0 = time.time()
np.asarray(f(v, x))
log(f"conv frontend compile: {time.time() - t0:.1f}s "
    f"(cache dir {os.environ['JAX_COMPILATION_CACHE_DIR']})")

# fused GAT backend on real TPU
be = AASISTBackend(dtype=jnp.bfloat16, fused_gat=True)
feat_np = (np.random.default_rng(0).standard_normal((B, 199, 1024)) * 0.1
           ).astype(np.float32)
vb = jax.device_put(init_variables_host(be, jnp.asarray(feat_np[:2]),
                                        train=False))
jax.block_until_ready(vb)
xb = jax.device_put(jnp.asarray(feat_np))
g = jax.jit(lambda v, x: be.apply(v, x, train=False))
t0 = time.time()
out_fused = np.asarray(g(vb, xb))
log(f"fused backend compile+run: {time.time() - t0:.1f}s")
ts = []
for _ in range(8):
    t0 = time.perf_counter()
    np.asarray(g(vb, xb))
    ts.append(time.perf_counter() - t0)
log(f"fused backend steady: {np.median(ts) * 1000:.2f} ms "
    f"({np.median(ts) / B * 1000:.3f} ms/clip)")

# numerical check vs unfused on device
be2 = AASISTBackend(dtype=jnp.bfloat16, fused_gat=False)
g2 = jax.jit(lambda v, x: be2.apply(v, x, train=False))
out_plain = np.asarray(g2(vb, xb))
err = np.abs(out_fused - out_plain).max()
log(f"fused vs plain max abs diff: {err:.5f}")
