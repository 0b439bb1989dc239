"""Single-chip TPU benchmark for the flagship model.

Measures the inference hot path (SURVEY.md §3.4): XLSR-300M front-end
(24-layer transformer, conv stride 320) + AASIST graph back-end on 4 s /
16 kHz clips (64000 samples), bfloat16 compute, eval mode — the same
computation as the reference's ``produce_evaluation_file`` batch scoring
(``/root/reference/main.py:199-221``).

Params are passed as explicit jit arguments (closed-over host arrays would
be lowered as HLO constants and constant-folded for minutes), and the timed
region fetches scores to the host so async dispatch can't undercount.

Prints ONE JSON line:
  metric   p50 latency per 4 s clip (batched scoring, ms/clip)
  baseline the 10 ms/clip real-time north-star target (BASELINE.md — the
           reference repo publishes no throughput numbers);
           vs_baseline = 10 / value, so >1 means beating the target.

Extra detail (throughput, batch size, device) goes to stderr.
"""

from rtdsd_tpu.utils.cache import enable_persistent_compile_cache

enable_persistent_compile_cache()

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _wait_for_device(budget_s: float = 900.0, probe_timeout_s: float = 240.0):
    """Fail fast (and readably) when the TPU relay is wedged.

    The axon relay grants the chip to one process at a time and a wedged
    claim hangs ``jax.devices()`` forever (observed: 12+ h, CLAUDE.md).
    Probe the claim in a subprocess with a timeout and retry within a
    bounded budget so the driver gets an error in minutes, not a hang.
    CPU runs skip the probe."""
    import os
    import subprocess

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return
    budget_s = float(os.environ.get("BENCH_CLAIM_BUDGET_S", budget_s))
    deadline = time.time() + budget_s
    attempt = 0
    while True:
        attempt += 1
        try:
            subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.devices(); print('ok')"],
                timeout=probe_timeout_s, check=True,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
            return
        except subprocess.TimeoutExpired:
            if time.time() >= deadline:
                print(f"bench: TPU claim unavailable after {attempt} "
                      f"probes / {budget_s:.0f}s budget — relay wedged? "
                      "(see CLAUDE.md); aborting instead of hanging",
                      file=sys.stderr)
                sys.exit(1)
            print(f"bench: claim probe {attempt} timed out; retrying "
                  f"({deadline - time.time():.0f}s left)", file=sys.stderr)
            time.sleep(30)
        except subprocess.CalledProcessError:
            # backend raised (not a hang): let the real run surface it
            return


def main():
    from rtdsd_tpu.models.registry import get_model
    from rtdsd_tpu.utils.init_host import init_variables_host

    _wait_for_device()
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    spec = get_model("XLSR_AASIST", dtype=jnp.bfloat16, fused_gat=False)
    model = spec.module

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 768
    clips = np.random.default_rng(0).standard_normal(
        (batch, 64000)).astype(np.float32) * 0.1
    waves = jax.device_put(jnp.asarray(clips))

    t0 = time.time()
    variables = init_variables_host(model, jnp.zeros((batch, 64000),
                                                    jnp.float32))
    print(f"host init: {time.time() - t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    variables = jax.device_put(variables)
    jax.block_until_ready(variables)
    print(f"device_put: {time.time() - t0:.1f}s", file=sys.stderr)

    @jax.jit
    def score(variables, waves):
        return model.apply(variables, waves, train=False)[:, 1]

    t0 = time.time()
    np.asarray(score(variables, waves))
    print(f"compile+first+warm: {time.time() - t0:.1f}s", file=sys.stderr)

    # warm-up then timed runs (host readback inside the timed region)
    for _ in range(2):
        np.asarray(score(variables, waves))
    times = []
    iters = 20
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(score(variables, waves))
        times.append(time.perf_counter() - t0)

    times = np.asarray(times)
    per_clip_ms = times / batch * 1000.0
    p50 = float(np.percentile(per_clip_ms, 50))
    thr = batch / float(np.median(times))
    print(f"batch={batch} p50={p50:.3f} ms/clip  throughput={thr:.1f} utt/s "
          f"(over {iters} iters, spread {per_clip_ms.min():.3f}-"
          f"{per_clip_ms.max():.3f} ms)", file=sys.stderr)

    # w8a8 serving mode (int8 MXU transformer) — the measured best
    # serving configuration at every batch (PERFORMANCE.md); reported as
    # extra fields on the same JSON line (bf16 stays the parity headline
    # and the driver contract is ONE line). Quantization runs on device
    # from the already-uploaded bf16 tree. Best-effort: a failure here
    # must not lose the headline measurement.
    extra = {}
    try:
        from rtdsd_tpu.models.quantize import quantize_variables

        qspec = get_model("XLSR_AASIST", dtype=jnp.bfloat16,
                          fused_gat=False, w2v={"w8": True, "a8": True})
        qmodel = qspec.module
        qvars = quantize_variables(variables)
        del variables
        jax.block_until_ready(qvars)

        @jax.jit
        def score_q(qvars, waves):
            return qmodel.apply(qvars, waves, train=False)[:, 1]

        t0 = time.time()
        np.asarray(score_q(qvars, waves))
        print(f"w8a8 compile+first: {time.time() - t0:.1f}s",
              file=sys.stderr)
        for _ in range(2):
            np.asarray(score_q(qvars, waves))
        qtimes = []
        for _ in range(iters):
            t0 = time.perf_counter()
            np.asarray(score_q(qvars, waves))
            qtimes.append(time.perf_counter() - t0)
        q_ms = np.asarray(qtimes) / batch * 1000.0
        qp50 = float(np.percentile(q_ms, 50))
        print(f"w8a8 batch={batch} p50={qp50:.3f} ms/clip  throughput="
              f"{batch / float(np.median(qtimes)):.1f} utt/s (spread "
              f"{q_ms.min():.3f}-{q_ms.max():.3f} ms)", file=sys.stderr)
        extra = {"w8a8_p50_ms": round(qp50, 4),
                 "w8a8_vs_baseline": round(10.0 / qp50, 3)}
    except Exception as e:  # pragma: no cover - defensive bench path
        print(f"w8a8 measurement skipped: {type(e).__name__}: {e}",
              file=sys.stderr)

    print(json.dumps({
        "metric": "p50_latency_ms_per_4s_clip",
        "value": round(p50, 4),
        "unit": "ms",
        "vs_baseline": round(10.0 / p50, 3),
        **extra,
    }))


if __name__ == "__main__":
    main()
