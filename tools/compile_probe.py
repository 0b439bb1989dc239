"""Compile-time probe: which piece of the flagship stalls remote compile."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
t0 = time.time()


def log(msg):
    print(f"[{time.time() - t0:7.1f}s] {msg}", file=sys.stderr, flush=True)


import jax
import jax.numpy as jnp
import numpy as np

log(f"devices={jax.devices()}")

from rtdsd_tpu.models.wav2vec2 import (ConvFeatureExtractor, TransformerLayer,
                                       Wav2Vec2Config, Wav2Vec2Encoder)
from rtdsd_tpu.models.aasist import AASISTBackend
from rtdsd_tpu.utils.init_host import init_variables_host

B = 8
cfg = Wav2Vec2Config()

# 1) conv feature extractor alone
fe = ConvFeatureExtractor(cfg, jnp.bfloat16)
wave = jnp.zeros((B, 64000), jnp.float32)
v = init_variables_host(fe, wave)
f = jax.jit(lambda w: fe.apply(v, w))
log("compiling conv frontend...")
f(wave).block_until_ready()
log("conv frontend done")
t1 = time.time(); f(wave).block_until_ready()
log(f"conv frontend steady: {time.time()-t1:.4f}s")

# 2) one transformer layer
tl = TransformerLayer(cfg, jnp.bfloat16)
xin = jnp.zeros((B, 199, 1024), jnp.float32)
v2 = init_variables_host(tl, xin)
g = jax.jit(lambda x: tl.apply(v2, x))
log("compiling 1 transformer layer...")
g(xin).block_until_ready()
log("transformer layer done")
t1 = time.time(); g(xin).block_until_ready()
log(f"1 layer steady: {time.time()-t1:.4f}s (x24 = {(time.time()-t1)*24:.3f}s)")

# 3) full encoder (scan over 24 layers)
enc = Wav2Vec2Encoder(cfg, jnp.bfloat16)
v3 = init_variables_host(enc, wave)
h = jax.jit(lambda w: enc.apply(v3, w))
log("compiling full encoder (24-layer scan)...")
h(wave).block_until_ready()
log("encoder done")
t1 = time.time(); h(wave).block_until_ready()
log(f"encoder steady: {time.time()-t1:.4f}s")

# 4) AASIST backend alone
be = AASISTBackend(dtype=jnp.bfloat16)
feats = jnp.zeros((B, 199, 1024), jnp.float32)
v4 = init_variables_host(be, feats, train=False)
k = jax.jit(lambda x: be.apply(v4, x, train=False))
log("compiling AASIST backend...")
k(feats).block_until_ready()
log("backend done")
t1 = time.time(); k(feats).block_until_ready()
log(f"backend steady: {time.time()-t1:.4f}s")
