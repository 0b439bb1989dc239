"""Piecewise steady-state timing of the flagship at batch 128 on TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


import jax
import jax.numpy as jnp
import numpy as np

from rtdsd_tpu.models.aasist import AASISTBackend
from rtdsd_tpu.models.wav2vec2 import (ConvFeatureExtractor, Wav2Vec2Config,
                                       Wav2Vec2Encoder)
from rtdsd_tpu.utils.init_host import init_variables_host

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
cfg = Wav2Vec2Config()
rng = np.random.default_rng(0)
wave_np = (rng.standard_normal((B, 64000)) * 0.1).astype(np.float32)
feat_np = (rng.standard_normal((B, 199, 1024)) * 0.1).astype(np.float32)


def bench(tag, model, x_np, **apply_kw):
    v = jax.device_put(init_variables_host(model, jnp.asarray(x_np[:2]),
                                           **apply_kw))
    jax.block_until_ready(v)
    x = jax.device_put(jnp.asarray(x_np))

    @jax.jit
    def f(v, x):
        out = model.apply(v, x, **apply_kw)
        return jax.tree_util.tree_map(lambda a: a.sum(), out)

    t0 = time.time()
    np.asarray(jax.tree_util.tree_leaves(f(v, x))[0])
    log(f"{tag}: compile {time.time() - t0:.1f}s")
    np.asarray(jax.tree_util.tree_leaves(f(v, x))[0])
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(f(v, x))[0])
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts)) * 1000
    log(f"{tag}: call {med:7.2f} ms  per-clip {med / B:6.3f} ms")


bench("conv_frontend       ", ConvFeatureExtractor(cfg, jnp.bfloat16), wave_np)
bench("encoder_full (24L)  ", Wav2Vec2Encoder(cfg, jnp.bfloat16), wave_np)
bench("aasist_backend      ", AASISTBackend(dtype=jnp.bfloat16), feat_np,
      train=False)
bench("aasist_backend_fused", AASISTBackend(dtype=jnp.bfloat16,
                                            fused_gat=True), feat_np,
      train=False)
