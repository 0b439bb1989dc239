"""Multi-stream serving CLI — concurrent real-time scoring on one chip.

The reference deployment story ends at batch file scoring
(/root/reference/main.py --score_all_folder_path); its real-time claim
(README.md:1-2) is single-utterance. This CLI is the production-serving
surface: N audio sources are treated as concurrent live streams — samples
arrive hop-by-hop, interleaved across streams — and scored by the
fixed-shape MultiStreamScorer (engine/serving.py: one batched conv-extend
+ one batched window-score dispatch per hop interval for ALL streams).

    python -m rtdsd_tpu.cli.serve --config cfg.yaml --ckpt best \\
        --audio a.wav b.wav ... [--window_sec 1 --hop_sec 0.5] \\
        [--max_streams 16] [--realtime] [--per_window] [--w8 | --w8a8]

Output: per-window lines ``"{path}#{w} {t_start_sec:.2f} {score}"`` as
windows complete (with --per_window), then one ``"{path} {score}"``
mean-aggregate line per file. stderr reports per-tick latency percentiles
and aggregate throughput; with --realtime the feed is paced to the wall
clock, so the latency numbers are true end-to-end serving latencies.
"""

import argparse
import math
import sys
import time

from rtdsd_tpu.utils.cache import enable_persistent_compile_cache

enable_persistent_compile_cache()


from rtdsd_tpu.config import load_yaml_config


def add_engine_args(p):
    """Engine/model flags shared with the network daemon (cli/daemon.py)."""
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--artifact", type=str, default=None,
                   help="serve from a cli.export --serving bundle prefix "
                        "instead of --config/--ckpt: the serialized "
                        "StableHLO programs run as-is (no model code is "
                        "traced on this host); window/hop/batches/"
                        "transport/cascade are baked into the bundle — "
                        "host-side knobs (--gate_db, --cascade_band, "
                        "--hbm_limit_gb) still apply")
    p.add_argument("--window_sec", type=float, default=None,
                   help="window length (default: ExpConfig.test_duration_sec)")
    p.add_argument("--hop_sec", type=float, default=None,
                   help="hop between windows (default: window / 2)")
    p.add_argument("--max_streams", type=int, default=None,
                   help="compiled stream-slot count (default: #files)")
    p.add_argument("--w8", action="store_true", default=False)
    p.add_argument("--w8a8", action="store_true", default=False)
    p.add_argument("--cascade_ckpt", type=str, default=None,
                   help="cascade: a cheap screener (e.g. a layer-pruned KD "
                        "student) scores every window; scores inside the "
                        "band are re-scored by --ckpt's model")
    p.add_argument("--cascade_config", type=str, default=None,
                   help="screener YAML (default: --config)")
    p.add_argument("--no_extend_fastpath", action="store_true",
                   default=False,
                   help="disable the zero-segment (dead-air) const-scatter"
                        " + half-batch extend fastpath (bit-exact, on by "
                        "default)")
    p.add_argument("--extend_rungs", type=int, default=2,
                   help="halving rungs below the full extend shape the "
                        "fastpath may dispatch at (default 2 = half + "
                        "quarter; each rung is one extra warmup compile; "
                        "quarter is +20%% capacity at 75%% dead air)")
    p.add_argument("--score_rungs", type=int, default=0,
                   help="halving rungs below score_batch the window-score "
                        "dispatch may drop to when few loud windows are "
                        "due (opt-in: each rung is one extra warmup "
                        "compile of the score program; for bursty/diurnal "
                        "workloads where loud concurrency undershoots the "
                        "provisioned score_batch)")
    p.add_argument("--esc_rungs", type=int, default=0,
                   help="halving rungs below esc_batch for the final "
                        "part-full escalation chunk (esc cost is ~linear "
                        "per row, so padding pays real time; opt-in, one "
                        "extra warmup compile per rung)")
    p.add_argument("--no_auto_provision", action="store_true",
                   default=False,
                   help="disable adaptive provisioning (the engine "
                        "deepening its rung ladders from observed "
                        "live-row EMAs; on by default — disable for "
                        "fixed-shape bit-stability)")
    p.add_argument("--esc_gather", type=str, default="slice",
                   choices=("slice", "flat"),
                   help="escalation window-gather form: 'slice' (vmapped "
                        "dynamic_slice, 6x faster, default) or 'flat' "
                        "(per-sample gather fallback)")
    p.add_argument("--cascade_w8a8", action="store_true", default=False,
                   help="quantize the screener's transformer stack (int8 "
                        "MXU w8a8) — the screen is the cascade's largest "
                        "steady per-tick cost; composes with --w8a8 "
                        "(escalation flagship)")
    p.add_argument("--cascade_band", type=float, default=None,
                   help="escalation half-band (default 2.0; for "
                        "--artifact: the bundle's baked band)")
    p.add_argument("--cascade_center", type=float, default=None,
                   help="escalation band center (default 0.0; for "
                        "--artifact: the bundle's baked center)")
    p.add_argument("--cascade_calibration", type=str, default=None,
                   help="cascade band sidecar from 'cli.evaluate "
                        "--cascade-sweep --cascade-out': sets the "
                        "escalation band/center chosen on a dev set "
                        "(explicit --cascade_band/--cascade_center "
                        "override it) — re-tuning after a screener "
                        "depth change is sweep -> sidecar -> serve, no "
                        "hand-carried numbers")
    p.add_argument("--score_batch", type=int, default=None,
                   help="cap the window-score batch below max_streams — the "
                        "HBM escape hatch for large stream counts; each tick "
                        "then needs ceil(due/score_batch) score dispatches, "
                        "trading tick latency for memory headroom")
    p.add_argument("--esc_batch", type=int, default=None,
                   help="cascade escalation chunk rows (default: sized "
                        "from the calibration sidecar's measured dev "
                        "escalation rate, ~1.25 x rate x score_batch — "
                        "esc cost is ~linear per row, so a chunk much "
                        "wider than the in-band arrival rate pays real "
                        "padding time; score_batch/4 without a sidecar)")
    p.add_argument("--extend_batch", type=int, default=None,
                   help="cap the conv-extend batch (default: full width "
                        "when the pre-flight HBM estimate fits, else "
                        "follows --score_batch)")
    p.add_argument("--auto_batch", action="store_true", default=False,
                   help="when the pre-flight HBM estimate exceeds the "
                        "device limit, shrink the dispatch batches to fit "
                        "instead of raising")
    p.add_argument("--hbm_limit_gb", type=float, default=None,
                   help="override the pre-flight HBM guard's device limit "
                        "(GiB); 0 disables the guard entirely")
    p.add_argument("--shard", action="store_true", default=False,
                   help="shard the serving rings + batches over all local "
                        "devices (SPMD multi-chip serving; no-op with one "
                        "device)")
    p.add_argument("--device_ms", action="store_true", default=False,
                   help="after serving, measure each compiled program's "
                        "amortized on-device ms and report chip-time per "
                        "tick (capacity number for co-located deployments; "
                        "wall p50/p95 above additionally pays the link)")
    p.add_argument("--f32_transport", action="store_true", default=False,
                   help="push float32 samples to the device instead of "
                        "16-bit PCM (int16 is lossless for 16-bit-sourced "
                        "audio and halves upload bytes)")
    p.add_argument("--transport", default=None,
                   choices=("float32", "int16", "mulaw8"),
                   help="sample transport dtype (overrides --f32_transport; "
                        "mulaw8 = companded 8-bit, halves ingest bytes "
                        "again at telephony-grade ~38 dB SNR)")
    p.add_argument("--gate_db", type=float, default=None,
                   help="energy gate: windows below this RMS dBFS "
                        "(re full scale 1.0; try -50) emit --gate_score "
                        "without a model dispatch — scoring is ~90%% of "
                        "serving device cost, so silence-heavy streams "
                        "cost ~nothing while silent")
    p.add_argument("--gate_score", type=float, default=0.0,
                   help="CM score emitted for energy-gated (silent) "
                        "windows (default 0.0 = undecided)")
    p.add_argument("--calibration", type=str, default=None,
                   help="calibration JSON from 'cli.evaluate --calibrate': "
                        "per-window lines gain calibrated P(bonafide), "
                        "aggregate lines gain an accept/reject decision at "
                        "--operating_point; the daemon routes the "
                        "calibrated probability in the wire f32")
    p.add_argument("--operating_point", type=str, default="eer",
                   help="decision threshold from --calibration: 'eer', "
                        "'far=<rate>' or 'frr=<rate>' (rates as passed to "
                        "evaluate --calibrate)")


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    add_engine_args(p)
    p.add_argument("--audio", required=True, nargs="+",
                   help="WAV/FLAC file(s); each is served as a live stream")
    p.add_argument("--realtime", action="store_true", default=False,
                   help="pace the feed to the wall clock (true serving "
                        "latency); default fast-forwards")
    p.add_argument("--per_window", action="store_true", default=False)
    p.add_argument("--out", type=str, default=None,
                   help="write '{path} {score}' aggregate lines here too")
    return p.parse_args(argv)


def snap_to_stride(n: int, stride: int, what: str) -> int:
    snapped = max(stride, (n // stride) * stride)
    if snapped != n:
        print(f"[serve] {what} snapped {n} -> {snapped} samples "
              f"(conv frame grid, stride {stride})", file=sys.stderr)
    return snapped


def build_engine(args, n_streams: int):
    """Construct a warmed :class:`MultiStreamScorer` from the shared
    engine flags (``add_engine_args``); used by this CLI and the network
    daemon (cli/daemon.py). Returns ``(engine, sample_rate_hz)``."""
    esc_rate = None  # sidecar-measured dev escalation rate (see below)
    if getattr(args, "cascade_calibration", None):
        from rtdsd_tpu.utils.metrics import load_cascade_calibration

        cal = load_cascade_calibration(args.cascade_calibration)
        # explicit flags win; the sidecar fills the rest
        if args.cascade_band is None:
            args.cascade_band = float(cal["band"])
        if args.cascade_center is None:
            args.cascade_center = float(cal["center"])
        rate = cal.get("escalation_rate")
        if rate is not None and math.isfinite(float(rate)):
            # the measured in-band fraction sizes the escalation chunk
            # (engine esc_rate; explicit --esc_batch wins inside the
            # engine) — the last DEPLOYMENT.md hand rule folded into the
            # sweep -> sidecar -> serve flow
            esc_rate = float(rate)
        args.cascade_esc_rate = esc_rate  # observability (daemon stats)
        print(f"[serve] cascade band {args.cascade_band} around "
              f"{args.cascade_center} from {args.cascade_calibration} "
              f"(dev escalation "
              f"{cal.get('escalation_rate', float('nan')) * 100:.1f}%, "
              f"cascade EER {cal.get('cascade_eer', float('nan')):.4f}%)",
              file=sys.stderr)
    if args.artifact:
        if args.config or args.ckpt:
            raise SystemExit(
                "--artifact replaces --config/--ckpt (the bundle carries "
                "the programs and weights)")
        baked = [flag for flag, val in (
            ("--window_sec", args.window_sec), ("--hop_sec", args.hop_sec),
            ("--score_batch", args.score_batch),
            ("--extend_batch", args.extend_batch),
            ("--esc_batch", args.esc_batch),
            ("--cascade_ckpt", args.cascade_ckpt),
            ("--transport", args.transport)) if val is not None]
        if args.w8 or args.w8a8 or args.cascade_w8a8 or args.auto_batch \
                or args.shard or getattr(args, "f32_transport", False):
            baked.append("--w8/--w8a8/--cascade_w8a8/--auto_batch/--shard")
        if baked:
            raise SystemExit(
                f"{', '.join(baked)} are baked into the serving artifact "
                f"at export time (cli.export --serving); re-export to "
                f"change them")
        from rtdsd_tpu.cli.export import load_serving

        eng, meta = load_serving(
            args.artifact,
            hbm_limit=(None if args.hbm_limit_gb is None
                       else int(args.hbm_limit_gb * 2**30)),
            gate_rms_dbfs=args.gate_db, gate_score=args.gate_score,
            escalate_band=args.cascade_band,
            escalate_center=args.cascade_center,
            extend_fastpath=not args.no_extend_fastpath)
        if args.max_streams is not None \
                and args.max_streams != eng.max_streams:
            raise SystemExit(
                f"--max_streams {args.max_streams} != the artifact's "
                f"compiled slot count {eng.max_streams}; re-export to "
                f"change it (or drop the flag / pass the baked value)")
        eng.warmup()
        return eng, float(meta["sample_rate"])
    if not args.config or not args.ckpt:
        raise SystemExit("--config and --ckpt are required "
                         "(or serve from a bundle with --artifact)")
    sys_config, exp_config = load_yaml_config(args.config)

    from rtdsd_tpu.cli.common import load_eval_model
    from rtdsd_tpu.engine.serving import MultiStreamScorer

    sr = float(exp_config.sample_rate)
    window_sec = (args.window_sec if args.window_sec is not None
                  else float(exp_config.test_duration_sec))
    hop_sec = args.hop_sec if args.hop_sec is not None else window_sec / 2
    if window_sec <= 0:
        raise SystemExit(f"--window_sec must be > 0 (got {window_sec})")
    if hop_sec <= 0:
        raise SystemExit(f"--hop_sec must be > 0 (got {hop_sec})")

    spec, state, _mesh, _bsh = load_eval_model(
        sys_config, exp_config, args.ckpt, w8=args.w8, w8a8=args.w8a8)
    cfg = spec.module.w2v_cfg

    esc_kwargs = {}
    if args.cascade_ckpt:
        # cascade: the screener becomes the engine's primary model and the
        # big --ckpt model re-scores in-band windows from the sample ring
        if args.cascade_config:
            from rtdsd_tpu.config import load_yaml_config as _load
            screen_sys, screen_exp = _load(args.cascade_config)
        else:
            screen_sys, screen_exp = sys_config, exp_config
        spec_s, state_s, _, _ = load_eval_model(screen_sys, screen_exp,
                                                args.cascade_ckpt,
                                                w8a8=args.cascade_w8a8)
        esc_kwargs = dict(escalate=(spec.module, state.params,
                                    state.batch_stats),
                          escalate_band=(2.0 if args.cascade_band is None
                                         else args.cascade_band),
                          escalate_center=(0.0 if args.cascade_center
                                           is None
                                           else args.cascade_center),
                          esc_batch=args.esc_batch, esc_rate=esc_rate,
                          esc_gather=args.esc_gather)
        spec, state, cfg = spec_s, state_s, spec_s.module.w2v_cfg

    duration = snap_to_stride(int(round(window_sec * sr)), cfg.total_stride,
                              "--window_sec")
    hop = snap_to_stride(int(round(hop_sec * sr)), cfg.total_stride,
                         "--hop_sec")

    mesh = None
    if args.shard:
        import jax
        import numpy as _np
        from jax.sharding import Mesh

        devs = jax.devices()
        if len(devs) > 1:
            mesh = Mesh(_np.array(devs).reshape(-1), ("data",))
            print(f"sharding serving over {len(devs)} devices",
                  file=sys.stderr)
    eng = MultiStreamScorer(
        spec.module, state.params, state.batch_stats, cfg,
        duration=duration, hop=hop,
        max_streams=args.max_streams or n_streams,
        score_batch=args.score_batch, extend_batch=args.extend_batch,
        extend_fastpath=not args.no_extend_fastpath,
        extend_rungs=args.extend_rungs,
        score_rungs=args.score_rungs, esc_rungs=args.esc_rungs,
        auto_provision=not args.no_auto_provision,
        auto_batch=args.auto_batch,
        transport_dtype=(args.transport if args.transport else
                         "float32" if args.f32_transport else "int16"),
        hbm_limit=(None if args.hbm_limit_gb is None
                   else int(args.hbm_limit_gb * 2**30)),
        gate_rms_dbfs=args.gate_db, gate_score=args.gate_score,
        mesh=mesh, **esc_kwargs)
    eng.warmup()
    return eng, sr


def reload_params(args):
    """Re-read the checkpoint path(s) with exactly build_engine's model
    prep (same quantization flags; in cascade mode --cascade_ckpt is the
    primary/screener and --ckpt the escalation flagship). Returns
    ``(params, batch_stats, escalate_or_None)`` ready for
    :meth:`MultiStreamScorer.swap_model` — used by the daemon's SIGHUP
    zero-downtime reload (cli/daemon.py). In --artifact mode the weight
    sidecars are re-read from disk (overwrite them with a re-export's
    sidecars, then HUP)."""
    if args.artifact:
        from rtdsd_tpu.cli.export import load_params_sidecar
        import json as _json

        with open(args.artifact + ".json") as f:
            meta = _json.load(f)
        variables = load_params_sidecar(args.artifact)
        esc = None
        if meta.get("escalate"):
            evars = load_params_sidecar(args.artifact + ".esc")
            esc = (evars["params"], evars.get("batch_stats", {}))
        return (variables["params"], variables.get("batch_stats", {}),
                esc)
    sys_config, exp_config = load_yaml_config(args.config)

    from rtdsd_tpu.cli.common import load_eval_model

    _, state, _, _ = load_eval_model(sys_config, exp_config, args.ckpt,
                                     w8=args.w8, w8a8=args.w8a8)
    esc = None
    if args.cascade_ckpt:
        esc = (state.params, state.batch_stats)
        if args.cascade_config:
            screen_sys, screen_exp = load_yaml_config(args.cascade_config)
        else:
            screen_sys, screen_exp = sys_config, exp_config
        _, state, _, _ = load_eval_model(screen_sys, screen_exp,
                                         args.cascade_ckpt,
                                         w8a8=args.cascade_w8a8)
    return state.params, state.batch_stats, esc


def main(argv=None):
    args = parse_args(argv)

    import numpy as np

    from rtdsd_tpu.data.dataset import resample
    from rtdsd_tpu.data.io import load_audio

    n_streams = len(args.audio)
    cal = thr = None
    if args.calibration:  # fail on a bad file BEFORE compiling the engine
        from rtdsd_tpu.utils.metrics import (calibration_threshold,
                                             load_calibration, platt_prob)
        cal = load_calibration(args.calibration)
        thr = calibration_threshold(cal, args.operating_point)
    eng, sr = build_engine(args, n_streams)
    hop = eng.hop

    waves = []
    for path in args.audio:
        wave, rate = load_audio(path)
        if rate != int(sr):
            wave = resample(wave, rate, int(sr))
        waves.append(np.asarray(wave, np.float32).squeeze())

    # stream ids are (occurrence-index, path) so duplicate --audio paths
    # stay distinct streams with their own windows/aggregates
    files = list(enumerate(args.audio))
    handles = {eng.open_stream((i, p)): i
               for i, p in files[:eng.max_streams]}
    if len(args.audio) > eng.max_streams:
        print(f"[serve] {len(args.audio)} files > {eng.max_streams} slots; "
              f"remaining files start as slots free", file=sys.stderr)
    queue = files[eng.max_streams:]
    cursors = {h: 0 for h in handles}

    per_file = [[] for _ in args.audio]
    tick_ms = []
    total_windows = 0
    total_audio = sum(len(w) for w in waves) / sr
    t_start = time.perf_counter()
    tick = 0
    counts0 = dict(eng.dispatch_counts)  # --device_ms: attribute only the
    # paced loop's dispatches to ticks (drain() after the loop also polls)
    pending_lines = []  # --per_window output, flushed OUTSIDE the timed
    # region so stdout latency (slow terminals/pipes) never skews tick p95

    def take(ws):
        nonlocal total_windows
        total_windows += 1
        idx, path = ws.stream_id
        per_file[idx].append(ws)
        if args.per_window:
            # a flush-time tail window starts off the hop grid; label it
            # "#tail" so it never collides with a hop-grid index
            w_idx = (ws.start_sample // hop
                     if ws.start_sample % hop == 0 else "tail")
            mark = " gated" if ws.gated else \
                   " escalated" if ws.escalated else ""
            prob = f" p={platt_prob(ws.score, cal):.4f}" if cal else ""
            pending_lines.append(
                f"{path}#{w_idx} {ws.start_sample / sr:.2f} "
                f"{ws.score}{prob}{mark}")

    def flush_lines():
        if pending_lines:
            print("\n".join(pending_lines))
            pending_lines.clear()

    # with a capped score/extend batch (explicit or auto_batch-shrunk)
    # each tick needs several dispatches to clear the due backlog —
    # drain it instead of single-polling
    capped = (eng.score_batch < eng.max_streams
              or eng.extend_batch < eng.max_streams)
    tick_poll = eng.drain if capped else eng.poll

    while handles or queue:
        t0 = time.perf_counter()
        done = []
        for h, i in handles.items():
            w = waves[i]
            c = cursors[h]
            if c < len(w):
                eng.push(h, w[c:c + hop])
                cursors[h] = c + hop
            if cursors[h] >= len(w):
                done.append(h)
        for ws in tick_poll():
            take(ws)
        for h in done:
            eng.close_stream(h, flush=True)
            del handles[h], cursors[h]
        # closed slots free once drained; admit queued files
        while queue and eng.active_streams < eng.max_streams:
            try:
                h = eng.open_stream(queue[0])
            except RuntimeError:
                break  # closing streams still draining
            handles[h] = queue.pop(0)[0]
            cursors[h] = 0
        if not handles and eng.active_streams:
            # only draining streams remain: keep polling them out
            for ws in eng.poll():
                take(ws)
        dt = time.perf_counter() - t0
        tick_ms.append(dt * 1000)
        flush_lines()
        if args.realtime and dt < hop / sr:
            time.sleep(hop / sr - dt)
        tick += 1
    counts_loop = dict(eng.dispatch_counts)  # before drain's extra polls
    for ws in eng.drain():
        take(ws)
    flush_lines()

    wall = time.perf_counter() - t_start
    out_fh = open(args.out, "w") if args.out else None
    for i, path in files:
        scores = [w.score for w in per_file[i]]
        agg = float(np.mean(scores)) if scores else float("nan")
        extra = ""
        if cal and np.isfinite(agg):
            verdict = "accept" if agg >= thr else "reject"
            extra = (f" p={platt_prob(agg, cal):.4f} "
                     f"{verdict}@{args.operating_point}")
        print(f"{path} {agg}{extra}")
        if out_fh:  # --out stays raw '{path} {score}' (CM-file compatible)
            out_fh.write(f"{path} {agg}\n")
    if out_fh:
        out_fh.close()
    tick_ms = np.asarray(tick_ms)
    mode = "realtime" if args.realtime else "fast-forward"
    print(f"  [{n_streams} streams, {total_windows} windows, "
          f"{total_audio:.1f}s audio in {wall:.2f}s ({mode}); "
          f"tick p50 {np.percentile(tick_ms, 50):.1f} ms / "
          f"p95 {np.percentile(tick_ms, 95):.1f} ms vs "
          f"{hop / sr * 1000:.0f} ms hop budget]", file=sys.stderr)
    if args.cascade_ckpt:
        n_esc = sum(w.escalated for ws_list in per_file for w in ws_list)
        print(f"  [cascade: {n_esc}/{total_windows} windows escalated "
              f"(band {eng.escalate_band} around {eng.escalate_center})]",
              file=sys.stderr)
    if args.gate_db is not None:
        print(f"  [energy gate: {eng.gated_windows}/{total_windows} "
              f"windows below {args.gate_db} dBFS scored as "
              f"{args.gate_score} with no model dispatch]",
              file=sys.stderr)
    if args.device_ms and tick:
        costs = eng.device_costs()
        per_tick = {k: (counts_loop[k] - counts0.get(k, 0)) / tick
                    for k in counts_loop}
        dev = sum(costs.get(k, 0.0) * per_tick[k] for k in per_tick)
        from rtdsd_tpu.engine.serving import dispatch_detail_keys

        detail = " ".join(f"{k}:{costs.get(k, 0.0):.2f}ms x{per_tick[k]:.2f}"
                          for k in dispatch_detail_keys(per_tick)
                          if per_tick.get(k))
        print(f"  [device {dev:.1f} ms/tick ({detail}) vs "
              f"{hop / sr * 1000:.0f} ms hop budget]", file=sys.stderr)


if __name__ == "__main__":
    main()
