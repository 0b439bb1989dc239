"""Wire overhead of the serving daemon (engine/netserve.py).

The capacity tables in PERFORMANCE.md are engine-direct (tools/
serving_bench.py); a real deployment talks to the daemon over a socket.
This probe isolates what the socket front-end ADDS per stream-tick on
the host — frame encode/send (producer side), kernel copy, asyncio
reader, frame parse, and the engine-lock handoff — by running the same
S-stream hop-push workload twice on a tiny CPU model (so device compute
is negligible and does not confound the host numbers):

  A) direct:  eng.push() x S + eng.drain() per round, in-process
  B) daemon:  the same pre-encoded int16 PCM frames over a Unix socket
              to a ServeDaemon, paced per round by collecting the S
              expected window scores back over the wire

overhead/stream-tick = (B - A) / S. Both sides share the one CPU core
here (worst case: a co-located producer); a remote producer leaves only
the reader+parse+push share on the serving host.

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
    args = ap.parse_args()
    sweep = args.streams or [64, 256, 512]

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rtdsd_tpu.engine.netserve import ServeClient, ServeDaemon
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

        # ---- A) engine-direct rounds -------------------------------------
        eng = build(S)
        eng.warmup()
        handles = [eng.open_stream(i) for i in range(S)]
        # prime: first window completes after ceil(duration/hop) pushes
        for _ in range(2):
            for i, h in enumerate(handles):
                eng.push(h, chunk[i])
            eng.drain()
        direct = []
        for _ in range(args.rounds):
            t0 = time.perf_counter()
            for i, h in enumerate(handles):
                eng.push(h, chunk[i])
            got = len(eng.drain())
            direct.append(time.perf_counter() - t0)
            assert got == S, f"direct: expected {S} scores, got {got}"
        a_ms = float(np.percentile(direct, 50)) * 1000

        # ---- B) the same rounds over the daemon socket -------------------
        eng2 = build(S)
        eng2.warmup()
        daemon = ServeDaemon(eng2, 16000, tick_sec=0.001)
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
        # pre-encode each stream's PUSH frame once: the producer-side
        # encode cost is paid here, not inside the timed rounds — the
        # timed region is send+parse+push+poll+score-routing
        from rtdsd_tpu.engine.netserve import PUSH, _U32, _frame
        frames = [_frame(PUSH, _U32.pack(h) + chunk[i].tobytes())
                  for i, h in enumerate(wire)]
        blob = b"".join(frames)  # one sendall per round

        def round_trip():
            cli._sock.sendall(blob)
            got = 0
            for ev in cli.events():
                if ev[0] == "score":
                    got += 1
                    if got == S:
                        return

        # prime: no window completes until TWO hops of samples plus the
        # conv receptive-field tail have arrived (segment lookahead —
        # see MultiStreamScorer docstring), so under hop-sized pushes
        # scores trail the pushes by one round. Send two unpaced hops to
        # fill the pipeline, then warm with paced rounds (each round k
        # receives the scores unlocked by hop k).
        for _ in range(2):
            cli._sock.sendall(blob)
            time.sleep(0.3)
        for _ in range(2):
            round_trip()
        wired = []
        for _ in range(args.rounds):
            t0 = time.perf_counter()
            round_trip()
            wired.append(time.perf_counter() - t0)
        b_ms = float(np.percentile(wired, 50)) * 1000

        over = (b_ms - a_ms) / S * 1000  # us per stream-tick
        log(f"S={S}: direct {a_ms:.1f} ms/round, daemon {b_ms:.1f} ms/round "
            f"-> wire overhead {b_ms - a_ms:.1f} ms/round "
            f"= {over:.0f} us/stream-tick (one shared core, "
            f"co-located producer)")

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
