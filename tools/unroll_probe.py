"""Probe: encoder compile time with full scan unroll on the TPU path."""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
t0 = time.time()


def log(msg):
    print(f"[{time.time() - t0:7.1f}s] {msg}", file=sys.stderr, flush=True)


import jax
import jax.numpy as jnp

from rtdsd_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder
from rtdsd_tpu.utils.init_host import init_variables_host

log(f"devices={jax.devices()}")
B = 8
cfg = dataclasses.replace(Wav2Vec2Config(), scan_unroll=24)
enc = Wav2Vec2Encoder(cfg, jnp.bfloat16)
wave = jnp.zeros((B, 64000), jnp.float32)
v = init_variables_host(enc, wave)
h = jax.jit(lambda w: enc.apply(v, w))
log("compiling full encoder (unroll=24)...")
h(wave).block_until_ready()
log("encoder compiled")
for i in range(3):
    t1 = time.time()
    h(wave).block_until_ready()
    log(f"steady {i}: {time.time() - t1:.4f}s")
