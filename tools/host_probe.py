"""Host-side serving cost: can the host keep up with the chip?

The co-located capacity claims in PERFORMANCE.md extrapolate from
device ms/tick — but a co-located host must ALSO run the per-tick
Python work: S pushes, due-segment/window enumeration, batch-matrix
assembly, and the host->device transfers' host side. This probe times
exactly that by mocking the two compiled programs with no-ops, so a
claim like "~4k streams/chip" is backed by a measured host budget, not
just chip time.

    env -u PYTHONPATH JAX_PLATFORMS=cpu python tools/host_probe.py \
        [S ...] [--window_sec 1 --hop_sec 0.5] [--ticks 12]

Single-threaded numbers (one engine process); a deployment can shard
streams over engine processes/chips if host-bound.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("streams", nargs="*", type=int, default=None)
    ap.add_argument("--window_sec", type=float, default=1.0)
    ap.add_argument("--hop_sec", type=float, default=0.5)
    ap.add_argument("--ticks", type=int, default=12)
    ap.add_argument("--score_batch", type=int, default=512)
    ap.add_argument("--transport", default="int16",
                    choices=("int16", "float32", "mulaw8"))
    args = ap.parse_args()
    sweep = args.streams or [512, 1024, 2048, 4096]

    import numpy as np

    from rtdsd_tpu.engine.serving import MultiStreamScorer
    from rtdsd_tpu.models.registry import get_model

    spec = get_model("XLSR_AASIST")
    model = spec.module
    cfg = model.w2v_cfg
    sr = 16000
    duration = int(args.window_sec * sr) // cfg.total_stride \
        * cfg.total_stride
    hop = int(args.hop_sec * sr) // cfg.total_stride * cfg.total_stride
    budget_ms = hop / sr * 1000
    # the mocked programs never touch params: a conv-subtree placeholder
    # satisfies the constructor
    params = {"ssl_model": {"feature_extractor": {}}}

    for S in sweep:
        sb = min(S, args.score_batch)
        eng = MultiStreamScorer(model, params, {}, cfg, duration=duration,
                                hop=hop, max_streams=S, score_batch=sb,
                                transport_dtype=args.transport,
                                hbm_limit=0)
        # no-op the device programs (keep ring shapes/donation contract)
        zeros = np.zeros((sb,), np.float32)
        eng._extend = lambda cp, feats, swave, segs, slots, pos: (feats,
                                                                  swave)
        eng._score = lambda p, stats, feats, slots, starts: zeros
        handles = [eng.open_stream(i) for i in range(S)]
        rng = np.random.default_rng(0)
        chunk = (rng.standard_normal((S, hop)) * 0.1).astype(np.float32)
        ticks = []
        n_scores = 0
        for t in range(args.ticks):
            t0 = time.perf_counter()
            for i, h in enumerate(handles):
                eng.push(h, chunk[i])
            n_scores += len(eng.drain())
            dt = time.perf_counter() - t0
            if t >= 2:
                ticks.append(dt * 1000)
        p50 = float(np.percentile(ticks, 50))
        p95 = float(np.percentile(ticks, 95))
        cap = int(S * budget_ms / max(p95, 1e-9))
        print(f"S={S} (sb={sb}): host-only tick p50 {p50:.1f} ms "
              f"p95 {p95:.1f} ms (budget {budget_ms:.0f}) "
              f"scores={n_scores} "
              f"{'OK' if p95 < budget_ms else 'HOST-BOUND'} "
              f"-> host ceiling ~{cap} streams/engine-process",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
