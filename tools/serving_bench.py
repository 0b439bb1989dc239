"""Multi-stream serving capacity on one chip: how many concurrent
real-time streams can the flagship sustain?

Simulates S concurrent 16 kHz live streams at window/hop (default 1 s /
0.5 s): per hop interval every stream pushes `hop` samples, then one
poll() runs the batched conv-extend + window-score dispatches. The chip
sustains S streams iff the per-tick wall time stays under the hop
interval; capacity extrapolates as S * budget / tick_p95.

    python tools/serving_bench.py [S ...] [--window_sec 1 --hop_sec 0.5]
        [--ticks 12] [--w8a8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rtdsd_tpu.utils.cache import enable_persistent_compile_cache

enable_persistent_compile_cache()


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("streams", nargs="*", type=int, default=None)
    ap.add_argument("--window_sec", type=float, default=1.0)
    ap.add_argument("--hop_sec", type=float, default=0.5)
    ap.add_argument("--ticks", type=int, default=12)
    ap.add_argument("--w8a8", action="store_true", default=False)
    ap.add_argument("--score_batch", type=int, default=None,
                    help="cap the window-score batch below max_streams "
                         "(the HBM escape hatch for large S); the tick "
                         "then drains the backlog with multiple dispatches")
    ap.add_argument("--extend_batch", type=int, default=None,
                    help="cap the conv-extend batch below max_streams")
    ap.add_argument("--model", default="XLSR_AASIST")
    ap.add_argument("--cascade", type=float, default=None,
                    help="cascade mode: an XLSR student screens every "
                         "window and the flagship escalates ~this fraction "
                         "(band auto-calibrated from the first ticks)")
    ap.add_argument("--cascade_layers", type=int, default=6,
                    help="screener encoder depth (6 = XLSR-6 student, "
                         "2 = XLSR-2; the screen is the cascade's largest "
                         "per-tick device cost once extend is row-granular)")
    ap.add_argument("--w8a8_screen", action="store_true", default=False,
                    help="quantize the cascade screener's transformer "
                         "stack (int8 MXU w8a8) — the screen is the "
                         "largest steady per-tick cost; composes with "
                         "--w8a8 (which quantizes the escalation "
                         "flagship)")
    ap.add_argument("--transport", default="int16",
                    choices=("int16", "float32", "mulaw8"),
                    help="sample upload dtype (int16 = 16-bit PCM; mulaw8 "
                         "= companded 8-bit, half the ingest bytes)")
    ap.add_argument("--gate_db", type=float, default=None,
                    help="energy gate threshold (RMS dBFS); silent "
                         "windows skip the score dispatch")
    ap.add_argument("--silence_frac", type=float, default=0.0,
                    help="fraction of streams pushing pure silence "
                         "(models telephony dead air); pair with "
                         "--gate_db to measure the gate's capacity win")
    ap.add_argument("--no_extend_fastpath", action="store_true",
                    default=False,
                    help="disable the zero-segment const-scatter + "
                         "half-batch extend fastpath (A/B control)")
    ap.add_argument("--extend_rungs", type=int, default=2,
                    help="fastpath halving rungs below the full extend "
                         "shape (default 2 = half + quarter)")
    ap.add_argument("--score_rungs", type=int, default=0,
                    help="halving rungs below score_batch for part-full "
                         "score dispatches (opt-in)")
    ap.add_argument("--esc_rungs", type=int, default=0,
                    help="halving rungs below esc_batch for the final "
                         "part-full escalation chunk (opt-in)")
    ap.add_argument("--esc_gather", type=str, default="slice",
                    choices=("slice", "flat"),
                    help="escalation window-gather form (slice = vmapped "
                         "dynamic_slice, 6x faster; flat = per-sample "
                         "gather fallback)")
    ap.add_argument("--hbm_limit_gb", type=float, default=None,
                    help="pre-flight HBM guard limit in GiB (the axon "
                         "relay reports no bytes_limit, so the guard and "
                         "the HBM-aware extend default are off without "
                         "this; 16 = v5e)")
    ap.add_argument("--no_auto_provision", action="store_true",
                    default=False,
                    help="disable the engine's adaptive rung deepening")
    ap.add_argument("--provision_after", type=int, default=None,
                    help="polls of telemetry before the engine may adapt "
                         "(default: engine's 48); lower it so short bench "
                         "tick loops reach adapted steady state")
    ap.add_argument("--esc_batch", type=int, default=None,
                    help="explicit escalation batch (overrides the "
                         "1.25*rate*score_batch auto-sizing)")
    ap.add_argument("--calibrate_hbm", action="store_true", default=False,
                    help="one-shot: binary-search the usable device HBM "
                         "by bounded trial allocation, record it to the "
                         "sidecar (~/.cache/rtdsd_tpu/hbm_limit.json or "
                         "$RTDSD_HBM_LIMIT_FILE), and exit — later "
                         "processes' pre-flight guard and HBM-aware "
                         "extend default then engage without "
                         "--hbm_limit_gb (relay-attached devices report "
                         "no bytes_limit)")
    ap.add_argument("--calibrate_max_gb", type=float, default=64.0)
    args = ap.parse_args()
    if args.calibrate_hbm:
        from rtdsd_tpu.engine.serving import probe_hbm_bytes

        got = probe_hbm_bytes(max_gb=args.calibrate_max_gb, record=True)
        log(f"usable HBM: {got / 2**30:.2f} GiB")
        return
    sweep = args.streams or [32, 64, 128, 256]

    import jax.numpy as jnp
    import numpy as np

    from rtdsd_tpu.engine.serving import MultiStreamScorer
    from rtdsd_tpu.models.registry import get_model
    from rtdsd_tpu.utils.init_host import init_variables_host

    w2v = {"w8": True, "a8": True} if args.w8a8 else {}
    spec = get_model(args.model, dtype=jnp.bfloat16, w2v=w2v)
    model = spec.module
    cfg = model.w2v_cfg
    sr = 16000
    duration = int(args.window_sec * sr) // cfg.total_stride \
        * cfg.total_stride
    hop = int(args.hop_sec * sr) // cfg.total_stride * cfg.total_stride
    base = get_model(args.model, dtype=jnp.bfloat16).module
    variables = init_variables_host(base, jnp.zeros((2, duration),
                                                    jnp.float32),
                                    train=False)
    params, stats = variables["params"], variables.get("batch_stats", {})
    import jax

    if args.w8a8:
        from rtdsd_tpu.models.quantize import quantize_encoder_params

        params = quantize_encoder_params(jax.device_put(params))
    params = jax.device_put(params)
    stats = jax.device_put(stats)

    screener, sparams, sstats = model, params, stats
    esc_kwargs = {}
    if args.cascade is not None:
        squant = {"w8": True, "a8": True} if args.w8a8_screen else {}
        stud_spec = get_model("My_XLSR_AASIST", dtype=jnp.bfloat16,
                              num_layers=args.cascade_layers, w2v=squant)
        screener = stud_spec.module
        # init on the UNQUANTIZED module (mirrors the flagship --w8a8
        # path above), then quantize the param tree for the w8 module
        sbase = (get_model("My_XLSR_AASIST", dtype=jnp.bfloat16,
                           num_layers=args.cascade_layers).module
                 if squant else screener)
        svars = init_variables_host(sbase,
                                    jnp.zeros((2, duration), jnp.float32),
                                    train=False)
        sparams = dict(svars["params"])
        ssl = dict(sparams["ssl_model"])
        ssl["feature_extractor"] = params["ssl_model"]["feature_extractor"]
        sparams["ssl_model"] = ssl
        if squant:
            from rtdsd_tpu.models.quantize import quantize_encoder_params

            sparams = quantize_encoder_params(jax.device_put(sparams))
        sparams = jax.device_put(sparams)
        sstats = jax.device_put(svars.get("batch_stats", {}))
        esc_kwargs = dict(escalate=(model, params, stats),
                          escalate_band=-1.0,
                          esc_gather=args.esc_gather)

    budget_ms = hop / sr * 1000
    log(f"window {duration} hop {hop} budget {budget_ms:.0f} ms/tick")
    rng = np.random.default_rng(0)
    for S in sweep:
        if args.cascade is not None:
            # escalations arrive per SCORE dispatch: with a capped
            # score_batch each dispatch yields ~rate*score_batch in-band
            # windows, so sizing the esc batch from S runs it half-empty
            # (fixed-shape dispatch cost is paid on padding rows). 1.25x
            # headroom absorbs per-dispatch variance in the band.
            per_dispatch = min(S, args.score_batch or S)
            esc_kwargs["esc_batch"] = max(
                8, int(np.ceil(per_dispatch * args.cascade * 1.25)))
        if args.esc_batch is not None and args.cascade is not None:
            esc_kwargs["esc_batch"] = args.esc_batch
        prov = {} if args.provision_after is None \
            else {"provision_after": args.provision_after}
        eng = MultiStreamScorer(screener, sparams, sstats, cfg,
                                duration=duration, hop=hop, max_streams=S,
                                transport_dtype=args.transport,
                                score_batch=args.score_batch,
                                extend_batch=args.extend_batch,
                                extend_fastpath=not args.no_extend_fastpath,
                                extend_rungs=args.extend_rungs,
                                score_rungs=args.score_rungs,
                                esc_rungs=args.esc_rungs,
                                auto_provision=not args.no_auto_provision,
                                gate_rms_dbfs=args.gate_db,
                                **prov,
                                hbm_limit=(None if args.hbm_limit_gb
                                           is None
                                           else int(args.hbm_limit_gb
                                                    * 2**30)),
                                **esc_kwargs)
        log(f"S={S}: extend_batch={eng.extend_batch} "
            f"score_batch={eng.score_batch} esc_batch={eng.esc_batch} "
            f"est={eng.hbm_estimate / 2**30:.2f} GiB")
        t0 = time.time()
        eng.warmup()
        log(f"S={S}: warmup(compile) {time.time() - t0:.1f}s")
        handles = [eng.open_stream(i) for i in range(S)]
        chunk = (rng.standard_normal((S, hop)) * 0.1).astype(np.float32)
        n_silent = int(S * args.silence_frac)
        silent_ids = set()
        if n_silent:  # interleave so batches mix loud and silent rows
            step = max(1, S // max(1, n_silent))
            silent_ids = set(range(S)[::step][:n_silent])
            chunk[::step][:n_silent] = 0.0
        if args.cascade is not None:
            # calibrate the band so ~cascade of LOUD windows escalate.
            # Silent windows are excluded whether or not the gate is on:
            # gated ones carry the fixed gate_score, ungated ones a single
            # repeated screener logit — either constant, included, drags
            # the band's center/quantile to 0 (then EVERY silent window
            # sits dead-center in the band and escalates, which is a
            # probe artifact, not a 10% cascade; a deployment calibrates
            # its band from a dev set of real speech).
            cal = []
            for _ in range(4):
                for i, h in enumerate(handles):
                    eng.push(h, chunk[i])
                cal.extend(ws.score for ws in eng.drain()
                           if not ws.gated
                           and ws.stream_id not in silent_ids)
            if not cal:
                raise SystemExit(
                    "no loud/ungated windows to calibrate the escalation "
                    "band from — lower --silence_frac or --gate_db")
            cal = np.asarray(cal)
            eng.escalate_center = float(np.median(cal))
            eng.escalate_band = float(np.quantile(
                np.abs(cal - eng.escalate_center), args.cascade))
            log(f"S={S}: calibrated band {eng.escalate_band:.3f} around "
                f"{eng.escalate_center:.3f} from {len(cal)} scores")
        ticks = []
        n_scores = 0
        n_esc = 0
        n_gated = 0
        counts0 = dict(eng.dispatch_counts)
        counts_mid, mid_ticks = None, 0
        for t in range(args.ticks):
            if t == args.ticks - args.ticks * 2 // 3:
                # steady-state window: the last 2/3 of the loop, past any
                # adaptive-provisioning warmup/deepening transitions
                counts_mid = dict(eng.dispatch_counts)
                mid_ticks = args.ticks - t
            t0 = time.perf_counter()
            for i, h in enumerate(handles):
                eng.push(h, chunk[i])
            # drain, not poll: with a capped score_batch the per-tick
            # backlog needs ceil(S / score_batch) score dispatches
            out = eng.drain()
            n_scores += len(out)
            n_esc += sum(ws.escalated for ws in out)
            n_gated += sum(ws.gated for ws in out)
            dt = time.perf_counter() - t0
            if t >= 2:  # first windows complete at tick 2
                ticks.append(dt * 1000)
        p50 = float(np.percentile(ticks, 50))
        p95 = float(np.percentile(ticks, 95))
        cap = int(S * budget_ms / max(p95, 1e-9))
        casc = (f" esc={n_esc}/{n_scores}"
                if args.cascade is not None else "")
        if args.gate_db is not None:
            casc += f" gated={n_gated}/{n_scores}"
        log(f"S={S}: tick p50 {p50:.1f} ms p95 {p95:.1f} ms "
            f"(budget {budget_ms:.0f}) scores={n_scores}{casc} "
            f"{'SUSTAINED' if p95 < budget_ms else 'OVER'} "
            f"-> est capacity ~{cap} streams")
        # device-ms accounting: amortized per-dispatch chip time x actual
        # dispatch counts from the tick loop = chip-ms per tick. This is
        # the capacity number for a co-located deployment — the wall p95
        # above additionally pays the remote relay (~30 ms/dispatch here),
        # which swings +-30% run to run (PERFORMANCE.md).
        costs = eng.device_costs()
        per_tick = {k: (eng.dispatch_counts[k] - counts0.get(k, 0))
                    / args.ticks for k in eng.dispatch_counts}
        dev_ms = sum(costs.get(k, 0.0) * per_tick[k] for k in per_tick)
        from rtdsd_tpu.engine.serving import dispatch_detail_keys

        detail = " ".join(f"{k}:{costs.get(k, 0.0):.2f}ms x{per_tick[k]:.2f}"
                          for k in dispatch_detail_keys(per_tick)
                          if per_tick.get(k))
        dev_cap = int(S * budget_ms / max(dev_ms, 1e-9))
        log(f"S={S}: device {dev_ms:.1f} ms/tick ({detail}) "
            f"{'SUSTAINED' if dev_ms < budget_ms else 'OVER'} on-device "
            f"-> co-located capacity ~{dev_cap} streams")
        if counts_mid is not None and mid_ticks:
            per_tick2 = {k: (eng.dispatch_counts[k] - counts_mid.get(k, 0))
                         / mid_ticks for k in eng.dispatch_counts}
            dev2 = sum(costs.get(k, 0.0) * per_tick2[k] for k in per_tick2)
            det2 = " ".join(
                f"{k}:x{per_tick2[k]:.2f}"
                for k in dispatch_detail_keys(per_tick2)
                if per_tick2.get(k))
            log(f"S={S}: steady device {dev2:.1f} ms/tick over the last "
                f"{mid_ticks} ticks ({det2}) -> co-located capacity "
                f"~{int(S * budget_ms / max(dev2, 1e-9))} streams")
        del eng


if __name__ == "__main__":
    main()
