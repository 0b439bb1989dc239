"""Escalation dispatch floor decomposition (VERDICT r3 weak-item 3).

At the gated-cascade best points the flagship escalation is the largest
single per-tick term (~0.56 ms/escalated window at esc_batch 32/64,
PERFORMANCE.md) — dominated by fixed costs, not the per-row forward.
This probe splits the dispatch at small batches into:

  esc w8a8 / esc bf16   the engine's score_esc program (sample-ring
                        gather + int16 dequant + flagship forward),
                        quantized vs unquantized escalation model —
                        isolates the dynamic-act-quant "epilogue" cost
  fwd w8a8 / fwd bf16   flagship forward on pre-staged (B, duration)
                        waves — esc minus fwd = ring gather + dequant
  gather-only           ring gather + dequant + trivial reduce

Decides: (b) whether an "epilogue-free" bf16 esc program wins below a
batch threshold, and how much (a) fusing the gather elsewhere could
ever save. Timing discipline: host readback inside the timed region
(the axon relay makes block_until_ready a no-op, CLAUDE.md).

    python tools/esc_floor_probe.py [S] [B ...]   # default S=512 B=16,32,64,128
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rtdsd_tpu.utils.cache import enable_persistent_compile_cache

enable_persistent_compile_cache()


def log(msg):
    print(msg, file=sys.stderr, flush=True)


import jax
import jax.numpy as jnp
import numpy as np

from rtdsd_tpu.engine.serving import MultiStreamScorer
from rtdsd_tpu.models.quantize import quantize_encoder_params
from rtdsd_tpu.models.registry import get_model
from rtdsd_tpu.utils.init_host import init_variables_host


def main():
    argv = sys.argv[1:]
    S = int(argv[0]) if argv else 512
    batches = [int(a) for a in argv[1:]] or [16, 32, 64, 128]
    sr = 16000
    duration, hop = sr, sr // 2

    flag_bf = get_model("XLSR_AASIST", dtype=jnp.bfloat16).module
    flag_q = get_model("XLSR_AASIST", dtype=jnp.bfloat16,
                       w2v={"w8": True, "a8": True}).module
    cfg = flag_bf.w2v_cfg
    fvars = init_variables_host(flag_bf, jnp.zeros((2, duration),
                                                   jnp.float32),
                                train=False)
    fparams = jax.device_put(fvars["params"])
    fstats = jax.device_put(fvars.get("batch_stats", {}))
    qparams = quantize_encoder_params(fparams)

    stud = get_model("My_XLSR_AASIST", dtype=jnp.bfloat16,
                     num_layers=2).module
    svars = init_variables_host(stud, jnp.zeros((2, duration),
                                                jnp.float32), train=False)
    sp = dict(svars["params"])
    ssl = dict(sp["ssl_model"])
    ssl["feature_extractor"] = fparams["ssl_model"]["feature_extractor"]
    sp["ssl_model"] = ssl
    sparams = jax.device_put(sp)
    sstats = jax.device_put(svars.get("batch_stats", {}))

    def timeit(name, fn, n=10, rounds=3):
        # relay wall-time variance is ±30% p95 (PERFORMANCE.md): take the
        # MIN over independent rounds — the floor is the device cost
        fn()  # warm/compile
        fn()
        best = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn()
            np.asarray(out)  # host readback fences the relay
            best = min(best, (time.perf_counter() - t0) / n * 1000)
        log(f"{name}: {best:.2f} ms")
        return best

    results = {}
    for B in batches:
        for tag, ep, es in (("w8a8", qparams, fstats),
                            ("bf16", fparams, fstats)):
            esc_model = flag_q if tag == "w8a8" else flag_bf
            eng = MultiStreamScorer(
                stud, sparams, sstats, cfg, duration=duration, hop=hop,
                max_streams=S, score_batch=min(S, 256),
                escalate=(esc_model, ep, es), escalate_band=-1.0,
                esc_batch=B, transport_dtype="int16", hbm_limit=0)
            scratch = eng._scratch
            slots = jnp.full((B,), scratch, jnp.int32)
            starts = jnp.zeros((B,), jnp.int32)
            t0 = time.time()
            esc_ms = timeit(
                f"S={S} B={B} esc {tag} (gather+fwd)",
                lambda: eng._score_esc(eng._esc_params, eng._esc_stats,
                                       eng._swave, slots, starts))

            waves = jnp.asarray(np.random.default_rng(0).standard_normal(
                (B, duration)).astype(np.float32) * 0.1)

            fwd = jax.jit(lambda p, st, w: esc_model.apply(
                {"params": p, **({"batch_stats": st} if st else {})},
                w, train=False)[:, 1])
            fwd_ms = timeit(f"S={S} B={B} fwd {tag} (pre-staged)",
                            lambda: fwd(ep, es, waves))
            results[(B, tag)] = (esc_ms, fwd_ms)
            del eng

        # gather-only: the fixed ring-gather + dequant term
        eng = MultiStreamScorer(
            stud, sparams, sstats, cfg, duration=duration, hop=hop,
            max_streams=S, score_batch=min(S, 256),
            escalate=(flag_bf, fparams, fstats), escalate_band=-1.0,
            esc_batch=B, transport_dtype="int16", hbm_limit=0)
        stride = cfg.total_stride
        ring_samples = eng.ring_samples
        dur_ar = jnp.arange(duration, dtype=jnp.int32)

        def gather_only(swave, slots, starts):
            flat = swave.reshape(swave.shape[0], ring_samples)
            sidx = (starts[:, None] * stride + dur_ar) % ring_samples
            w = flat[slots[:, None], sidx].astype(jnp.float32) \
                * (1.0 / 32768.0)
            return w.sum()

        gj = jax.jit(gather_only)
        slots = jnp.full((B,), eng._scratch, jnp.int32)
        starts = jnp.zeros((B,), jnp.int32)
        timeit(f"S={S} B={B} gather-only",
               lambda: gj(eng._swave, slots, starts))
        del eng

    log("summary (esc_ms, fwd_ms):")
    for k in sorted(results):
        log(f"  B={k[0]} {k[1]}: esc {results[k][0]:.2f} "
            f"fwd {results[k][1]:.2f} "
            f"gather+dequant~={results[k][0] - results[k][1]:.2f}")
    log("rc=0")


if __name__ == "__main__":
    main()
