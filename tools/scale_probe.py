"""Probe: encoder compile time vs layer count (remote-compile bisect)."""

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
wave = jnp.zeros((B, 64000), jnp.float32)

for n_layers in [2, 4, 8, 12]:
    cfg = dataclasses.replace(Wav2Vec2Config(), encoder_layers=n_layers)
    enc = Wav2Vec2Encoder(cfg, jnp.bfloat16)
    v = init_variables_host(enc, wave)
    h = jax.jit(lambda w, _enc=enc, _v=v: _enc.apply(_v, w))
    t1 = time.time()
    log(f"compiling {n_layers} layers (scan)...")
    h(wave).block_until_ready()
    log(f"{n_layers} layers compiled in {time.time() - t1:.1f}s")
    t1 = time.time()
    h(wave).block_until_ready()
    log(f"{n_layers} layers steady: {time.time() - t1:.4f}s")
