"""Serving soak harness: sustained churn against a live daemon.

Production-stability evidence for the serving stack that single-shot
tests cannot give: runs `cli.daemon` as a real subprocess and hammers it
for `--minutes` with the failure modes a deployment actually sees —

- producer churn: streams open, push in irregular chunks, close (with
  and without flush), at randomized pacing;
- abrupt disconnects: a fraction of producers drop the TCP/Unix socket
  mid-stream without CLOSE (the disconnect path must free their slots);
- stalled producers: some connections stop pushing and hold their slot
  until the idle reaper sheds them (`--idle_timeout_sec`);
- overruns: some producers push far faster than real time into a small
  engine so the backlog guard sheds them (`--max_pending_sec`);
- hot reloads: SIGHUP every `--hup_every` seconds swaps the checkpoint
  in while all of the above is in flight.

Invariants checked continuously and at exit:

- every score belongs to a stream this harness opened, with monotone
  per-stream start_samples;
- the daemon's RSS is bounded (no leak from churn; limit scales with
  what the engine legitimately buffers);
- no Python traceback in the daemon log;
- SIGTERM at the end stops it gracefully (exit 0, "[daemon] stopped").

Prints ONE JSON line with the tallies, e.g.::

    python tools/soak.py --config /tmp/verify_ds/tiny.yaml \
        --ckpt /tmp/verify_ds/runs/best_* --minutes 10

The reference has no serving stack at all (its inference surface is
batch file scoring, /root/reference/main.py:199-221); this instruments
framework-added capability.
"""

import argparse
import json
import os
import random
import signal
import socket
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def rss_mb(pid: int) -> float:
    with open(f"/proc/{pid}/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


class Tally:
    def __init__(self):
        self.lock = threading.Lock()
        self.scores = 0
        self.gated = 0
        self.streams = 0
        self.drops = 0  # abrupt disconnects
        self.stalls = 0  # deliberate idle stalls
        self.overruns = 0  # deliberate fast pushes
        self.order_violations = 0
        self.errors = []

    def err(self, msg):
        with self.lock:
            if len(self.errors) < 20:
                self.errors.append(msg)


def producer(idx: int, args, stop: threading.Event, tally: Tally):
    """One connection's lifetime loop: open streams, push, misbehave."""
    import numpy as np

    from rtdsd_tpu.engine.netserve import FLAG_GATED, ServeClient

    rng = random.Random(idx * 7919)
    nrng = np.random.default_rng(idx)
    host, port = args.listen.rsplit(":", 1)
    while not stop.is_set():
        try:
            cli = ServeClient(host=host, port=int(port), timeout=120.0)
        except (ConnectionError, OSError) as e:
            tally.err(f"connect: {e}")
            time.sleep(1.0)
            continue
        sr, dur, hop = cli.sample_rate, cli.duration, cli.hop
        try:
            mode = rng.choice(["normal", "normal", "normal", "drop",
                               "stall", "overrun"])
            try:
                h = cli.open(f"soak{idx}")
            except RuntimeError:
                # all slots busy (expected under churn) — back off
                cli.close_socket()
                time.sleep(0.5)
                continue
            with tally.lock:
                tally.streams += 1
            n_sec = rng.uniform(1.5, 6.0)
            wave = (nrng.standard_normal(int(n_sec * sr)) * 0.1) \
                .astype(np.float32)
            if rng.random() < 0.5:  # silent span exercises the gate
                a = len(wave) // 3
                wave[a:2 * a] = 0.0
            pace = 0.0 if mode == "overrun" else (hop / sr) * 0.5
            cut = rng.randint(1, len(wave)) if mode == "drop" else None
            sent = 0
            while sent < len(wave) and not stop.is_set():
                n = rng.randint(500, 4000)
                cli.push(h, wave[sent:sent + n])
                sent += n
                if cut is not None and sent >= cut:
                    cli.close_socket()  # vanish without CLOSE
                    with tally.lock:
                        tally.drops += 1
                    raise ConnectionResetError("deliberate drop")
                if mode == "stall" and sent > len(wave) // 2:
                    with tally.lock:
                        tally.stalls += 1
                    # hold the slot silently; the idle reaper must shed
                    # us (we learn via ERROR) or we resume after a while
                    time.sleep(args.stall_sec)
                    mode = "normal"
                if pace:
                    time.sleep(pace * n / hop)
            if mode == "overrun":
                with tally.lock:
                    tally.overruns += 1
            cli.close(h, flush=rng.random() < 0.8)
            # drain events until CLOSED (shed streams get ERROR first)
            last_start = -1
            deadline = time.time() + 240
            for ev in cli.events():
                if ev[0] == "score" and ev[1] == h:
                    with tally.lock:
                        tally.scores += 1
                        if ev[4] & FLAG_GATED:
                            tally.gated += 1
                    if ev[2] < last_start:
                        with tally.lock:
                            tally.order_violations += 1
                    last_start = ev[2]
                elif ev[0] == "closed" and ev[1] == h:
                    break
                if time.time() > deadline:
                    tally.err(f"p{idx}: no CLOSED within 240s")
                    break
            cli.close_socket()
        except ConnectionResetError:
            pass  # deliberate drop
        except RuntimeError as e:
            # ERROR frames (shed for overrun/idle) surface here — that
            # is the daemon doing its job; reconnect and carry on
            if "shed" not in str(e) and "overrun" not in str(e) \
                    and "idle" not in str(e):
                tally.err(f"p{idx}: {e}")
            try:
                cli.close_socket()
            except OSError:
                pass
        except (ConnectionError, OSError) as e:
            tally.err(f"p{idx}: {type(e).__name__}: {e}")
        time.sleep(rng.uniform(0.05, 0.5))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--minutes", type=float, default=10.0)
    p.add_argument("--producers", type=int, default=6)
    p.add_argument("--max_streams", type=int, default=4)
    p.add_argument("--window_sec", type=float, default=1.0)
    p.add_argument("--hop_sec", type=float, default=0.5)
    p.add_argument("--listen", default="127.0.0.1:7757")
    p.add_argument("--gate_db", type=float, default=-50.0)
    p.add_argument("--hup_every", type=float, default=45.0)
    p.add_argument("--stall_sec", type=float, default=8.0)
    p.add_argument("--idle_timeout_sec", type=float, default=4.0)
    p.add_argument("--max_pending_sec", type=float, default=3.0)
    p.add_argument("--rss_slack_mb", type=float, default=400.0,
                   help="allowed RSS growth over the run (beyond what "
                        "the engine legitimately buffers)")
    p.add_argument("--log", default="/tmp/soak_daemon.log")
    args = p.parse_args(argv)

    cmd = [sys.executable, "-m", "rtdsd_tpu.cli.daemon",
           "--config", args.config, "--ckpt", args.ckpt,
           "--max_streams", str(args.max_streams),
           "--window_sec", str(args.window_sec),
           "--hop_sec", str(args.hop_sec),
           "--listen", args.listen,
           "--gate_db", str(args.gate_db), "--gate_score", "0.0",
           "--idle_timeout_sec", str(args.idle_timeout_sec),
           "--max_pending_sec", str(args.max_pending_sec),
           "--stats_every", "30"]
    log = open(args.log, "w")
    daemon = subprocess.Popen(cmd, cwd=REPO, stdout=log,
                              stderr=subprocess.STDOUT)
    host, port = args.listen.rsplit(":", 1)
    deadline = time.time() + 600
    while True:
        try:
            socket.create_connection((host, int(port)), timeout=2).close()
            break
        except OSError:
            if daemon.poll() is not None or time.time() > deadline:
                print(open(args.log).read()[-3000:], file=sys.stderr)
                raise SystemExit("daemon failed to start")
            time.sleep(1.0)

    tally = Tally()
    stop = threading.Event()
    threads = [threading.Thread(target=producer, args=(i, args, stop,
                                                       tally), daemon=True)
               for i in range(args.producers)]
    for t in threads:
        t.start()

    t_end = time.time() + args.minutes * 60
    rss0 = rss_mb(daemon.pid)
    rss_peak = rss0
    hups = 0
    next_hup = time.time() + args.hup_every
    while time.time() < t_end:
        time.sleep(5.0)
        if daemon.poll() is not None:
            stop.set()
            print(open(args.log).read()[-3000:], file=sys.stderr)
            raise SystemExit(f"daemon died mid-soak "
                             f"(exit {daemon.returncode})")
        rss_peak = max(rss_peak, rss_mb(daemon.pid))
        if time.time() >= next_hup:
            daemon.send_signal(signal.SIGHUP)
            hups += 1
            next_hup = time.time() + args.hup_every

    stop.set()
    for t in threads:
        t.join(timeout=300)
    rss_end = rss_mb(daemon.pid)
    daemon.send_signal(signal.SIGTERM)
    try:
        daemon.wait(timeout=180)
    except subprocess.TimeoutExpired:
        daemon.kill()
        raise SystemExit("daemon did not stop on SIGTERM")
    log.close()
    text = open(args.log).read()

    ok = (daemon.returncode == 0
          and "[daemon] stopped" in text
          and "Traceback" not in text
          and tally.order_violations == 0
          and rss_peak - rss0 <= args.rss_slack_mb
          and not tally.errors)
    reloads = text.count("reloaded checkpoint")
    print(json.dumps({
        "ok": ok,
        "minutes": args.minutes,
        "streams": tally.streams,
        "scores": tally.scores,
        "gated": tally.gated,
        "drops": tally.drops,
        "stalls": tally.stalls,
        "overruns_forced": tally.overruns,
        "hups_sent": hups,
        "reloads_logged": reloads,
        "order_violations": tally.order_violations,
        "rss_start_mb": round(rss0, 1),
        "rss_peak_mb": round(rss_peak, 1),
        "rss_end_mb": round(rss_end, 1),
        "daemon_exit": daemon.returncode,
        "harness_errors": tally.errors,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
