"""w8 (weight-only int8) vs bf16 scoring probe at small batch.

The flagship XLSR_AASIST forward at batch<=32 is weight-HBM-bound
(~630 MB of bf16 transformer weights per forward); w8 halves those bytes.
The axon relay adds ~30 ms per dispatched call, so per-forward device time
is measured with an on-device `lax.scan` of K dependent-free forwards inside
ONE dispatch: total/K isolates device time from relay overhead.
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

from rtdsd_tpu.models.quantize import quantize_encoder_params
from rtdsd_tpu.models.registry import get_model
from rtdsd_tpu.utils.init_host import init_variables_host

K = 16  # forwards per dispatch
T = 64000

spec = get_model("XLSR_AASIST", dtype=jnp.bfloat16)
model = spec.module
v32 = init_variables_host(model, jnp.zeros((2, T), jnp.float32), train=False)

spec8 = get_model("XLSR_AASIST", dtype=jnp.bfloat16, w2v={"w8": True})
model8 = spec8.module
spec88 = get_model("XLSR_AASIST", dtype=jnp.bfloat16,
                   w2v={"w8": True, "a8": True})
model88 = spec88.module

log("quantizing (Pallas kernel on device)...")
t0 = time.time()
v8 = dict(v32)
v8["params"] = jax.tree_util.tree_map(
    lambda a: a, quantize_encoder_params(v32["params"]))
jax.block_until_ready(v8["params"])
log(f"quantize: {time.time()-t0:.1f}s")

for B in [int(a) for a in (sys.argv[1:] or [1, 8, 32])]:
    x = jnp.asarray((np.random.default_rng(0).standard_normal((B, T)) * 0.1
                     ).astype(np.float32))

    def run(mdl):
        def score_many(variables, waves):
            def body(carry, _):
                # carry feeds the input so XLA cannot hoist the forward out
                # of the scan as loop-invariant (it would otherwise run the
                # network once and re-add the same sum K times)
                w = waves * (1.0 + carry * 1e-30)
                s = mdl.apply(variables, w, train=False)[:, 1]
                return carry + jnp.sum(s), None
            out, _ = jax.lax.scan(body, 0.0, None, length=K)
            return out
        return jax.jit(score_many)

    for tag, mdl, vv in [("bf16", model, v32), ("w8", model8, v8),
                         ("w8a8", model88, v8)]:
        vv_d = jax.device_put(vv)
        jax.block_until_ready(vv_d)
        f = run(mdl)
        t0 = time.time()
        float(f(vv_d, x))
        log(f"B={B} {tag}: compile+first {time.time()-t0:.1f}s")
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(f(vv_d, x))
            times.append((time.perf_counter() - t0) / K * 1000)
        best = min(times)
        log(f"B={B} {tag}: {best:.3f} ms/forward "
            f"({best/B:.3f} ms/clip, {B/best*1000:.0f} utt/s)")
