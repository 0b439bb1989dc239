"""CPU baseline: flagship scoring throughput on the host CPU (for the
north-star ratio: >= 10x CPU-baseline utt/s/chip, BASELINE.md)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(m, file=sys.stderr, flush=True)


import jax
import jax.numpy as jnp
import numpy as np

log(f"backend: {jax.default_backend()} devices: {jax.devices()}")

from rtdsd_tpu.models.registry import get_model
from rtdsd_tpu.utils.init_host import init_variables_host

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
spec = get_model("XLSR_AASIST", dtype=jnp.float32)
model = spec.module
v = init_variables_host(model, jnp.zeros((B, 64000), jnp.float32))
x = jnp.asarray((np.random.default_rng(0).standard_normal((B, 64000)) * 0.1
                 ).astype(np.float32))


@jax.jit
def score(v, x):
    return model.apply(v, x, train=False)[:, 1]


t0 = time.time()
np.asarray(score(v, x))
log(f"compile+first: {time.time() - t0:.1f}s")
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    np.asarray(score(v, x))
    ts.append(time.perf_counter() - t0)
med = float(np.median(ts))
log(f"CPU ({os.cpu_count()} core): batch={B} {med:.2f} s/call "
    f"= {med / B * 1000:.0f} ms/clip = {B / med:.3f} utt/s")
