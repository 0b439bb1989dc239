"""Batch-1 on-device piecewise latency (real-time path breakdown).

Same carry-dependent scan-of-K trick as tools/w8_probe.py to cancel the
~30 ms relay dispatch; reports per-forward device time of each stage of
the flagship at batch 1.
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

from rtdsd_tpu.models.aasist import AASISTBackend
from rtdsd_tpu.models.wav2vec2 import (ConvFeatureExtractor, Wav2Vec2Config,
                                       Wav2Vec2Encoder)
from rtdsd_tpu.utils.init_host import init_variables_host

K = 32
B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
cfg = Wav2Vec2Config()
rng = np.random.default_rng(0)
wave_np = (rng.standard_normal((B, 64000)) * 0.1).astype(np.float32)
feat_np = (rng.standard_normal((B, 199, 1024)) * 0.1).astype(np.float32)


def bench(tag, model, x_np, **apply_kw):
    v = jax.device_put(init_variables_host(model, jnp.asarray(x_np[:1]),
                                           **apply_kw))
    jax.block_until_ready(v)
    x = jax.device_put(jnp.asarray(x_np))

    @jax.jit
    def many(v, x):
        def body(carry, _):
            out = model.apply(v, x * (1.0 + carry * 1e-30), **apply_kw)
            s = sum(jnp.sum(a.astype(jnp.float32))
                    for a in jax.tree_util.tree_leaves(out))
            return carry + s, None
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
        return out

    t0 = time.time()
    float(many(v, x))
    log(f"{tag}: compile {time.time() - t0:.1f}s")
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(many(v, x))
        ts.append((time.perf_counter() - t0) / K * 1000)
    log(f"{tag}: {min(ts):7.3f} ms/forward (B={B})")


bench("conv_frontend       ", ConvFeatureExtractor(cfg, jnp.bfloat16), wave_np)
bench("encoder_full (24L)  ", Wav2Vec2Encoder(cfg, jnp.bfloat16), wave_np)
bench("aasist_backend      ", AASISTBackend(dtype=jnp.bfloat16), feat_np,
      train=False)

import dataclasses

bench("conv_frontend_dots  ",
      ConvFeatureExtractor(dataclasses.replace(cfg, conv_impl="dots"),
                           jnp.bfloat16), wave_np)
bench("aasist_backend_fused",
      AASISTBackend(dtype=jnp.bfloat16, fused_gat=True), feat_np, train=False)
