"""w8a8 scoring at bench-harness batches (b768) — close the table gap.

PERFORMANCE.md's w8a8 table stops at b512 (1.212 ms/clip) because
``tools/w8_probe.py``'s K-scan holds an extra f32 input copy that OOMs
b768 — a *harness* limit, not a model one (int8 weights actually FREE
~450 MB vs the bf16 forward that bench.py fits exactly at b768). This
probe mirrors bench.py's harness exactly (explicit-arg jit, host
readback in the timed region, 20 iters) so its numbers are directly
comparable to the bf16 headline (1.352 ms/clip @ b768).

Usage: python tools/w8a8_batch_probe.py [batch ...]   (default: 768)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rtdsd_tpu.utils.cache import enable_persistent_compile_cache

enable_persistent_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from rtdsd_tpu.models.quantize import quantize_encoder_params
from rtdsd_tpu.models.registry import get_model
from rtdsd_tpu.utils.init_host import init_variables_host


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    batches = [int(a) for a in (sys.argv[1:] or ["768"])]
    log(f"device: {jax.devices()[0]}")

    spec = get_model("XLSR_AASIST", dtype=jnp.bfloat16, fused_gat=False,
                     w2v={"w8": True, "a8": True})
    model = spec.module
    base = get_model("XLSR_AASIST", dtype=jnp.bfloat16,
                     fused_gat=False).module

    t0 = time.time()
    variables = init_variables_host(
        base, jnp.zeros((2, 64000), jnp.float32), train=False)
    log(f"host init: {time.time() - t0:.1f}s")
    t0 = time.time()
    variables = dict(variables)
    variables["params"] = quantize_encoder_params(variables["params"])
    variables = jax.device_put(variables)
    jax.block_until_ready(variables)
    log(f"quantize+device_put: {time.time() - t0:.1f}s")

    @jax.jit
    def score(variables, waves):
        return model.apply(variables, waves, train=False)[:, 1]

    for batch in batches:
        clips = np.random.default_rng(0).standard_normal(
            (batch, 64000)).astype(np.float32) * 0.1
        waves = jax.device_put(jnp.asarray(clips))
        t0 = time.time()
        np.asarray(score(variables, waves))
        log(f"b{batch} compile+first: {time.time() - t0:.1f}s")
        for _ in range(2):
            np.asarray(score(variables, waves))
        times = []
        for _ in range(20):
            t0 = time.perf_counter()
            np.asarray(score(variables, waves))
            times.append(time.perf_counter() - t0)
        per_clip = np.asarray(times) / batch * 1000.0
        p50 = float(np.percentile(per_clip, 50))
        log(f"w8a8 batch={batch} p50={p50:.3f} ms/clip "
            f"throughput={batch / float(np.median(times)):.1f} utt/s "
            f"(spread {per_clip.min():.3f}-{per_clip.max():.3f})")


if __name__ == "__main__":
    main()
