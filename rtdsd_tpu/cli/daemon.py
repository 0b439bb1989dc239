"""Network serving daemon — live audio in over a socket, scores out.

The last mile past ``cli.serve`` (which replays FILES as streams): a
long-running process that owns the TPU engine and accepts concurrent
live PCM streams from external producers over a Unix or TCP socket,
answering with per-window CM scores as they are computed. Protocol and
engine-threading notes: rtdsd_tpu/engine/netserve.py.

    python -m rtdsd_tpu.cli.daemon --config cfg.yaml --ckpt best \\
        --max_streams 256 --listen unix:/run/rtdsd.sock
    python -m rtdsd_tpu.cli.daemon ... --listen 0.0.0.0:7750

All of ``cli.serve``'s engine flags apply (--window_sec/--hop_sec,
--w8a8, --cascade_ckpt, --score_batch/--auto_batch, --transport,
--shard, ...). --max_streams is required: a daemon has no file list to
infer the slot count from, and the compiled batch shapes are fixed at
startup.

Reference parity note: the reference has no serving daemon at all —
its inference surface is ``main.py --score_all_folder_path`` batch
scoring (/root/reference/main.py:199-221); this is framework-added
deployment capability.
"""

import argparse
import asyncio
import signal
import sys

from rtdsd_tpu.utils.cache import enable_persistent_compile_cache

enable_persistent_compile_cache()


def parse_args(argv=None):
    from rtdsd_tpu.cli.serve import add_engine_args

    p = argparse.ArgumentParser()
    add_engine_args(p)
    p.add_argument("--listen", required=True, type=str,
                   help="unix:/path/to.sock or host:port")
    p.add_argument("--tick_sec", type=float, default=None,
                   help="poll cadence (default: the hop interval; do not "
                        "set it far below the hop — every poll pads a "
                        "fixed-shape batch, see PERFORMANCE.md)")
    p.add_argument("--max_pending_sec", type=float, default=30.0,
                   help="shed a stream once this many seconds of its "
                        "audio are buffered but unscored (producer "
                        "outrunning the engine); 0 disables")
    p.add_argument("--idle_timeout_sec", type=float, default=0.0,
                   help="shed a stream with no PUSH for this long "
                        "(its connection stays up; re-OPEN resumes) — "
                        "frees slots held by stalled producers; "
                        "0 disables (default)")
    p.add_argument("--stats_every", type=float, default=60.0,
                   help="stderr stats interval in seconds (0 = off)")
    args = p.parse_args(argv)
    if not args.max_streams and not args.artifact:
        p.error("--max_streams is required for the daemon (fixed compiled "
                "batch shapes; no file list to infer it from) — unless "
                "serving an --artifact bundle, which bakes the slot count")
    return args


async def _amain(args):
    import os

    from rtdsd_tpu.cli.serve import build_engine
    from rtdsd_tpu.engine.netserve import ServeDaemon

    transform = None
    if args.calibration:
        from rtdsd_tpu.utils.metrics import load_calibration, platt_prob

        cal = load_calibration(args.calibration)
        transform = lambda s: platt_prob(s, cal)  # noqa: E731
        print(f"[daemon] calibrated wire scores: "
              f"P(bonafide)=sigmoid({cal['platt_a']:.4g}*s"
              f"{cal['platt_b']:+.4g}) from {args.calibration}",
              file=sys.stderr, flush=True)
    eng, sr = build_engine(args, args.max_streams)
    daemon = ServeDaemon(eng, int(sr), tick_sec=args.tick_sec,
                         max_pending_sec=args.max_pending_sec,
                         idle_timeout_sec=args.idle_timeout_sec,
                         score_transform=transform)

    # register handlers BEFORE the socket exists: a supervisor that
    # TERMs as soon as it sees the socket must not catch the process
    # with default signal disposition (observed under a saturated core)
    stop = asyncio.Event()
    loop = asyncio.get_event_loop()
    for sig in (signal.SIGINT, signal.SIGTERM):
        try:
            loop.add_signal_handler(sig, stop.set)
        except NotImplementedError:  # non-unix
            pass

    # SIGHUP: zero-downtime checkpoint reload. Re-reads --ckpt (and
    # --cascade_ckpt) from disk — point them at a rolling path (the
    # trainer's "last"/best) and HUP the daemon after each training
    # cycle. Same-architecture checkpoints swap in between ticks with
    # no recompile and no dropped streams; a failed load (missing file,
    # architecture mismatch) logs and keeps serving the old weights.
    reloading = False

    def _schedule_reload():
        nonlocal reloading
        if reloading:
            print("[daemon] reload already in progress; ignoring SIGHUP",
                  file=sys.stderr, flush=True)
            return

        async def do():
            nonlocal reloading
            reloading = True
            try:
                from rtdsd_tpu.cli.serve import reload_params

                p, bs, esc = await loop.run_in_executor(
                    None, reload_params, args)
                await daemon.swap_model(p, bs, escalate=esc)
                src = (f"artifact sidecars {args.artifact}*.params"
                       if args.artifact else f"checkpoint {args.ckpt}"
                       + (f" + cascade screener {args.cascade_ckpt}"
                          if args.cascade_ckpt else ""))
                print(f"[daemon] reloaded {src} "
                      f"(swap #{daemon.reloads})",
                      file=sys.stderr, flush=True)
            except Exception as e:  # noqa: BLE001 — keep serving
                print(f"[daemon] reload FAILED, serving continues on the "
                      f"previous weights: {e}", file=sys.stderr, flush=True)
            finally:
                reloading = False

        asyncio.ensure_future(do())

    try:
        loop.add_signal_handler(signal.SIGHUP, _schedule_reload)
    except (NotImplementedError, AttributeError):  # non-unix
        pass

    if args.listen.startswith("unix:"):
        path = args.listen[len("unix:"):]
        if os.path.exists(path):
            os.unlink(path)  # stale socket from a previous run
        await daemon.start(unix_path=path)
        where = f"unix:{path}"
    else:
        host, _, port = args.listen.rpartition(":")
        if not host or not port.isdigit():
            raise SystemExit(f"--listen must be unix:/path or host:port, "
                             f"got {args.listen!r}")
        await daemon.start(host=host, port=int(port))
        where = f"{host}:{port}"
    print(f"[daemon] serving on {where} — {eng.max_streams} slots, "
          f"window {eng.duration / sr:.2f}s hop {eng.hop / sr:.2f}s, "
          f"transport {daemon.engine._tdtype.__name__}, "
          f"~{eng.hbm_estimate / 2**30:.2f} GiB HBM", file=sys.stderr,
          flush=True)

    async def stats():
        while args.stats_every > 0:
            await asyncio.sleep(args.stats_every)
            print(f"[daemon] streams={eng.active_streams}/"
                  f"{eng.max_streams} ticks={daemon.ticks} "
                  f"scores={daemon.scores_sent} "
                  f"overruns={daemon.overruns} "
                  f"idle_sheds={daemon.idle_sheds} "
                  f"reloads={daemon.reloads} "
                  f"gated={eng.gated_windows} "
                  f"zero_segs={eng.zero_segments} "
                  f"dispatches={dict(eng.dispatch_counts)} "
                  f"provisioning={eng.provisioning()}",
                  file=sys.stderr, flush=True)

    stats_task = asyncio.ensure_future(stats())
    await stop.wait()
    stats_task.cancel()
    await daemon.stop()
    print("[daemon] stopped", file=sys.stderr)


def main(argv=None):
    asyncio.run(_amain(parse_args(argv)))


if __name__ == "__main__":
    main()
