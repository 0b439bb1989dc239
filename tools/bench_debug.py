"""Instrumented stage-by-stage timing of the TPU inference path (debugging
slow remote-compile environments). Not part of the public API."""

import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
t0 = time.time()


def log(msg):
    print(f"[{time.time() - t0:7.1f}s] {msg}", file=sys.stderr, flush=True)


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

log(f"jax imported, devices={jax.devices()}")

from rtdsd_tpu.models.registry import get_model  # noqa: E402
from rtdsd_tpu.utils.init_host import init_variables_host  # noqa: E402

spec = get_model("XLSR_AASIST", dtype=jnp.bfloat16)
model = spec.module
log("model built")

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
variables = init_variables_host(model, jnp.zeros((batch, 64000), jnp.float32))
n = sum(np.asarray(x).size for x in jax.tree_util.tree_leaves(variables))
log(f"host init done ({n / 1e6:.0f}M params)")

variables = jax.device_put(variables)
jax.block_until_ready(variables)
log("device_put done")

waves = jax.device_put(jnp.zeros((batch, 64000), jnp.float32))


@jax.jit
def score(w):
    return model.apply(variables, w, train=False)[:, 1]


log("starting compile...")
score(waves).block_until_ready()
log("first call done")
for i in range(3):
    t1 = time.time()
    score(waves).block_until_ready()
    log(f"call {i}: {time.time() - t1:.4f}s "
        f"({(time.time() - t1) / batch * 1000:.2f} ms/clip)")
