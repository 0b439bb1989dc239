"""Batch-size sweep of flagship scoring throughput on the TPU chip."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


import jax
import jax.numpy as jnp
import numpy as np

from rtdsd_tpu.models.registry import get_model
from rtdsd_tpu.utils.init_host import init_variables_host

fused = len(sys.argv) > 1 and sys.argv[1] == "fused"
spec = get_model("XLSR_AASIST", dtype=jnp.bfloat16, fused_gat=fused)
model = spec.module
log(f"fused_gat={fused}")

variables = init_variables_host(model, jnp.zeros((8, 64000), jnp.float32))
variables = jax.device_put(variables)
jax.block_until_ready(variables)
log("params on device")


@jax.jit
def score(variables, waves):
    return model.apply(variables, waves, train=False)[:, 1]


for batch in [16, 64, 128, 256]:
    waves = jax.device_put(jnp.asarray(np.random.default_rng(0)
                                       .standard_normal((batch, 64000))
                                       .astype(np.float32) * 0.1))
    t0 = time.time()
    np.asarray(score(variables, waves))
    compile_s = time.time() - t0
    np.asarray(score(variables, waves))
    times = []
    for _ in range(8):
        t0 = time.perf_counter()
        np.asarray(score(variables, waves))
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    log(f"batch={batch:4d} compile={compile_s:6.1f}s  call={med*1000:7.2f}ms "
        f" per-clip={med/batch*1000:6.3f}ms  thr={batch/med:7.1f} utt/s")
