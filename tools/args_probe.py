"""Probe: params as explicit jit args (device arrays) vs closures."""

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
import numpy as np

from rtdsd_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder
from rtdsd_tpu.utils.init_host import init_variables_host

log(f"devices={jax.devices()}")
B = 8
wave = jax.device_put(jnp.zeros((B, 64000), jnp.float32))

for n_layers in [8, 24]:
    cfg = dataclasses.replace(Wav2Vec2Config(), encoder_layers=n_layers)
    enc = Wav2Vec2Encoder(cfg, jnp.bfloat16)
    v = init_variables_host(enc, jnp.zeros((B, 64000), jnp.float32))
    v = jax.device_put(v)
    jax.block_until_ready(v)
    log(f"{n_layers}: params on device")
    h = jax.jit(lambda vv, w, _enc=enc: _enc.apply(vv, w))
    t1 = time.time()
    out = h(v, wave)
    out.block_until_ready()
    log(f"{n_layers} layers compiled in {time.time() - t1:.1f}s")
    # force a real host readback to measure true completion
    t1 = time.time()
    np.asarray(h(v, wave))
    log(f"{n_layers} layers steady (with readback): {time.time() - t1:.4f}s")
