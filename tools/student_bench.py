"""Bench the resource-limited student models (the reference paper's actual
real-time deployment targets): XLSR-n-AASIST on 1 s clips."""

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

from rtdsd_tpu.models.registry import get_model
from rtdsd_tpu.utils.init_host import init_variables_host

B = 128
T = 16000  # 1 s — the students train/score on 1 s clips (BASELINE.md)

for n_layers in [6, 2]:
    spec = get_model("My_XLSR_AASIST", dtype=jnp.bfloat16,
                     num_layers=n_layers, order="first")
    model = spec.module
    v = jax.device_put(init_variables_host(
        model, jnp.zeros((2, T), jnp.float32), train=False))
    jax.block_until_ready(v)
    x = jax.device_put(jnp.asarray(
        (np.random.default_rng(0).standard_normal((B, T)) * 0.1
         ).astype(np.float32)))

    @jax.jit
    def score(v, x):
        return model.apply(v, x, train=False)[:, 1]

    t0 = time.time()
    np.asarray(score(v, x))
    c = time.time() - t0
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        np.asarray(score(v, x))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    log(f"XLSR-{n_layers}-AASIST 1s clips: compile {c:5.1f}s  "
        f"call {med * 1000:7.2f} ms  per-clip {med / B * 1000:6.3f} ms  "
        f"thr {B / med:7.0f} utt/s")

    # single-clip latency (batch 1): the true real-time serving number
    x1 = jax.device_put(x[:1])
    np.asarray(score(v, x1))
    ts = []
    for _ in range(20):
        t0 = time.perf_counter()
        np.asarray(score(v, x1))
        ts.append(time.perf_counter() - t0)
    log(f"XLSR-{n_layers}-AASIST 1s batch=1 p50: "
        f"{np.percentile(ts, 50) * 1000:6.2f} ms (incl. relay round-trip)")
