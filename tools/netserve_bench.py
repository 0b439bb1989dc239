"""Ingest wire overhead of the serving daemon (engine/netserve.py).

The capacity tables in PERFORMANCE.md are engine-direct (tools/
serving_bench.py); a real deployment talks to the daemon over a socket.
This probe isolates what the socket front-end ADDS per stream-push on
the serving host — producer sendall, kernel copy, asyncio reader,
frame parse, and the per-frame engine-lock handoff — by timing the
same S hop-sized pushes two ways:

  A) direct:  eng.push() x S per round, in-process
  B) daemon:  the same pre-encoded int16 PUSH frames as one blob over a
              Unix socket, paced by a trailing PING: the reader handles
              frames in order, so PONG arrives only after every PUSH
              has reached the engine

overhead/stream-push = (B - A) / S. The daemon's ticker is parked
(tick_sec=forever) so neither side dispatches device work — scoring
cost is serving_bench's job, and a paced-tick A/B at machine speed
mostly measures eager-dispatch waste: a tick far faster than the hop
makes every poll pad a nearly-empty fixed-shape extend batch (measured
2.2x the direct cost at S=256 with tick_sec=1 ms on one core — keep
``tick_sec`` at its default, the hop).

Both sides share one CPU core here (worst case: a co-located
producer); a remote producer leaves only the reader+parse+push share
on the serving host.

Run on CPU:  env -u PYTHONPATH JAX_PLATFORMS=cpu \
                 python tools/netserve_bench.py [S ...] [--rounds 30]
"""

import argparse
import asyncio
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("streams", nargs="*", type=int, default=None)
    ap.add_argument("--rounds", type=int, default=30)
    ap.add_argument("--clients", action="store_true",
                    help="also compare producer-side per-push cost: "
                         "Python ServeClient.push (numpy encode + "
                         "sendall) vs the native C client rtdsd_push "
                         "(serve_client.cpp)")
    args = ap.parse_args()
    sweep = args.streams or [64, 256, 512]

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rtdsd_tpu.engine.netserve import (PING, PUSH, ServeClient,
                                           ServeDaemon, _U32, _frame)
    from rtdsd_tpu.engine.serving import MultiStreamScorer
    from rtdsd_tpu.models.wav2vec2 import Wav2Vec2Config
    from rtdsd_tpu.models.zoo import XLSR_AASIST

    cfg = Wav2Vec2Config(conv_layers=((8, 10, 5), (8, 4, 4), (8, 2, 2)),
                         encoder_embed_dim=8, encoder_ffn_dim=16,
                         encoder_heads=2, encoder_layers=2, conv_pos=4,
                         conv_pos_groups=2)
    model = XLSR_AASIST(w2v_cfg=cfg)
    duration = 80 * cfg.total_stride  # 3200 samples
    hop = duration // 2
    variables = model.init(jax.random.key(0), jnp.zeros((1, duration)))
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    rng = np.random.default_rng(0)

    def build(S):
        return MultiStreamScorer(model, params, stats, cfg,
                                 duration=duration, hop=hop,
                                 max_streams=S, transport_dtype="int16")

    for S in sweep:
        chunk = np.clip(np.rint(rng.standard_normal((S, hop)) * 3000),
                        -32768, 32767).astype(np.int16)

        # ---- A) direct ingest: eng.push x S per round --------------------
        eng = build(S)
        handles = [eng.open_stream(i) for i in range(S)]
        direct = []
        for r in range(args.rounds + 2):
            t0 = time.perf_counter()
            for i, h in enumerate(handles):
                eng.push(h, chunk[i])
            if r >= 2:  # first rounds warm allocators/caches
                direct.append(time.perf_counter() - t0)
        a_ms = float(np.percentile(direct, 50)) * 1000

        # ---- B) the same pushes over the daemon socket --------------------
        eng2 = build(S)
        # park the ticker: this probe times INGEST only (see module doc);
        # disable overrun shedding — backlog grows by design here
        daemon = ServeDaemon(eng2, 16000, tick_sec=1e9,
                             max_pending_sec=0)
        loop = asyncio.new_event_loop()
        started = threading.Event()
        sock = f"/tmp/netserve_bench_{os.getpid()}_{S}.sock"

        def run_loop():
            asyncio.set_event_loop(loop)

            async def go():
                await daemon.start(unix_path=sock)
                started.set()

            loop.run_until_complete(go())
            loop.run_forever()

        th = threading.Thread(target=run_loop, daemon=True)
        th.start()
        assert started.wait(30)

        cli = ServeClient(unix_path=sock, timeout=120)
        wire = [cli.open() for _ in range(S)]
        # pre-encode each stream's PUSH frame once: producer-side encode
        # is paid here, not inside the timed rounds
        blob = b"".join(_frame(PUSH, _U32.pack(h) + chunk[i].tobytes())
                        for i, h in enumerate(wire))
        blob += _frame(PING)  # reader is in-order: PONG = all pushed

        wired = []
        for r in range(args.rounds + 2):
            t0 = time.perf_counter()
            cli._sock.sendall(blob)
            cli._expect(0x84)  # PONG
            if r >= 2:
                wired.append(time.perf_counter() - t0)
        b_ms = float(np.percentile(wired, 50)) * 1000

        over = (b_ms - a_ms) / S * 1000  # us per stream-push
        mb = len(blob) / 1e6
        log(f"S={S}: direct {a_ms:.2f} ms/round, daemon {b_ms:.2f} ms/round "
            f"({mb:.1f} MB blob) -> wire overhead {b_ms - a_ms:.2f} ms/round "
            f"= {over:.0f} us/stream-push (one shared core, "
            f"co-located producer)")

        if args.clients:
            # producer-side per-push cost: float wave in, encode + frame
            # + sendall per call (what a real feeder pays per hop).
            # Same parked daemon; trailing PING paces each round.
            fwave = chunk.astype(np.float32) / 32768.0

            def timed_rounds(push_one, ping):
                out = []
                for r in range(args.rounds + 2):
                    t0 = time.perf_counter()
                    for i in range(S):
                        push_one(i)
                    ping()
                    if r >= 2:
                        out.append(time.perf_counter() - t0)
                return float(np.percentile(out, 50)) * 1000

            py_ms = timed_rounds(
                lambda i: cli.push(wire[i], fwave[i]), cli.ping)

            # free the slots for the native client (max_streams == S)
            for h in wire:
                cli.close(h, flush=False)
            closed = 0
            for ev in cli.events():
                if ev[0] == "closed":
                    closed += 1
                    if closed == S:
                        break

            from rtdsd_tpu.native import client as nclient

            try:
                nclient.build()
            except Exception as e:
                log(f"  (native client unavailable: {e})")
            else:
                nc = nclient.NativeServeClient(unix_path=sock)
                nwire = [nc.open() for _ in range(S)]
                c_ms = timed_rounds(
                    lambda i: nc.push(nwire[i], fwave[i]), nc.ping)
                nc.close_socket()
                log(f"  producer per-push (float in, int16 out): python "
                    f"{py_ms / S * 1000:.0f} us vs native C "
                    f"{c_ms / S * 1000:.0f} us "
                    f"({py_ms / max(c_ms, 1e-9):.2f}x)")

        cli.close_socket()

        async def halt():
            await daemon.stop()
            loop.stop()

        asyncio.run_coroutine_threadsafe(halt(), loop)
        th.join(timeout=30)
        loop.close()
        try:
            os.unlink(sock)
        except OSError:
            pass


if __name__ == "__main__":
    main()
