"""Network serving daemon tests (engine/netserve.py, cli/daemon.py).

The daemon is a socket front-end over MultiStreamScorer, so the oracle
is the same as test_serving's: window scores received over the wire
must equal direct window scoring of the same samples. The daemon runs
on a private asyncio loop in a background thread; the blocking
ServeClient talks to it over a Unix socket — exactly a producer's view.
"""

import asyncio
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtdsd_tpu.engine.netserve import ServeClient, ServeDaemon, _frame
from rtdsd_tpu.engine.serving import MultiStreamScorer
from rtdsd_tpu.engine.steps import make_score_step
from rtdsd_tpu.models.wav2vec2 import Wav2Vec2Config
from rtdsd_tpu.models.zoo import XLSR_AASIST


@pytest.fixture(scope="module")
def tiny():
    cfg = Wav2Vec2Config(conv_layers=((8, 10, 5), (8, 4, 4), (8, 2, 2)),
                         encoder_embed_dim=8, encoder_ffn_dim=16,
                         encoder_heads=2, encoder_layers=2, conv_pos=4,
                         conv_pos_groups=2)
    model = XLSR_AASIST(w2v_cfg=cfg)
    duration = 80 * cfg.total_stride  # 3200 samples, stride 40
    variables = model.init(jax.random.key(0), jnp.zeros((1, duration)))
    return (model, variables["params"], variables.get("batch_stats", {}),
            cfg, duration)


class _DaemonThread:
    """Run a ServeDaemon on its own loop in a background thread."""

    def __init__(self, engine, sock_path, tick_sec=0.02, **kw):
        self.daemon = ServeDaemon(engine, 16000, tick_sec=tick_sec, **kw)
        self.sock_path = str(sock_path)
        self.loop = asyncio.new_event_loop()
        self._started = threading.Event()
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()
        assert self._started.wait(30), "daemon failed to start"

    def _run(self):
        asyncio.set_event_loop(self.loop)

        async def go():
            await self.daemon.start(unix_path=self.sock_path)
            self._started.set()

        self.loop.run_until_complete(go())
        self.loop.run_forever()

    def stop(self):
        fut = asyncio.run_coroutine_threadsafe(self.daemon.stop(),
                                               self.loop)
        try:
            fut.result(timeout=25)  # surface stop() exceptions
        finally:
            self.loop.call_soon_threadsafe(self.loop.stop)
            self.thread.join(timeout=30)
            self.loop.close()


@pytest.fixture()
def served(tiny, tmp_path):
    model, params, stats, cfg, duration = tiny
    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            hop=duration // 2, max_streams=3,
                            transport_dtype="int16")
    dt = _DaemonThread(eng, tmp_path / "rtdsd.sock")
    yield dt, duration
    dt.stop()


def _expected(tiny, wave, duration, hop):
    """Direct window scoring of the int16-quantized wave (the daemon's
    wire transport quantizes exactly like the engine's own push)."""
    model, params, stats, _, _ = tiny
    q = np.clip(np.rint(wave * 32768.0), -32768, 32767).astype(np.int16)
    w = q.astype(np.float32) / 32768.0
    step = make_score_step(model)
    starts = range(0, len(w) - duration + 1, hop)
    windows = np.stack([w[s:s + duration] for s in starts])
    return np.asarray(step(params, stats, jnp.asarray(windows)))


def test_daemon_scores_match_direct(served, tiny):
    """Two concurrent wire streams, pushed in uneven chunks, score
    exactly like direct window scoring; CLOSED arrives after the final
    flush window and frees the slot."""
    dt, duration = served
    hop = duration // 2
    cli = ServeClient(unix_path=dt.sock_path)
    assert cli.transport == "int16"
    assert cli.duration == duration and cli.hop == hop

    rng = np.random.default_rng(5)
    waves = [rng.standard_normal(4 * hop + duration).astype(np.float32)
             * 0.1,
             rng.standard_normal(2 * hop + duration).astype(np.float32)
             * 0.1]
    handles = [cli.open(f"wire{i}") for i in range(2)]
    cursors = [0, 0]
    while any(c < len(w) for c, w in zip(cursors, waves)):
        for i, (h, w) in enumerate(zip(handles, waves)):
            n = int(rng.integers(300, 2000))
            if cursors[i] < len(w):
                cli.push(h, w[cursors[i]:cursors[i] + n])
                cursors[i] += n
    for h in handles:
        cli.close(h, flush=True)
    got = cli.collect(set(handles))

    for i, (h, w) in enumerate(zip(handles, waves)):
        exp = _expected(tiny, w, duration, hop)
        scores = sorted(got[h])  # (start_sample, score, escalated)
        assert [s for s, _, _ in scores] == \
            [k * hop for k in range(len(exp))]
        np.testing.assert_allclose([v for _, v, _ in scores], exp,
                                   rtol=2e-4, atol=2e-5)
    cli.close_socket()
    # slots freed: a new client can claim all three
    cli2 = ServeClient(unix_path=dt.sock_path)
    hs = [cli2.open() for _ in range(3)]
    assert len(set(hs)) == 3
    cli2.close_socket()


def test_daemon_error_paths(served):
    dt, _ = served
    cli = ServeClient(unix_path=dt.sock_path)
    cli.ping()

    # foreign/unknown handle is rejected per-stream, connection survives
    cli._sock.sendall(_frame(0x02, b"\x63\x00\x00\x00" + b"\x00\x00"))
    with pytest.raises(RuntimeError, match="not an open stream"):
        next(cli.events())
    cli.ping()  # still connected

    # slot exhaustion answers ERROR (engine has 3 slots)
    hs = [cli.open() for _ in range(3)]
    with pytest.raises(RuntimeError, match="busy"):
        cli.open()
    for h in hs:
        cli.close(h, flush=False)  # nothing pushed: CLOSED is immediate
    seen = set()
    for ev in cli.events():
        assert ev[0] == "closed"
        seen.add(ev[1])
        if seen == set(hs):
            break
    cli.close_socket()


def test_daemon_tcp_listener(tiny):
    """The TCP listener path (host/port) speaks the same protocol as the
    Unix-socket path: HELLO, OPEN, short-stream flush (repeat-tiled to
    one window), CLOSED."""
    model, params, stats, cfg, duration = tiny
    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            hop=duration // 2, max_streams=2,
                            transport_dtype="int16")
    dt = _DaemonTCP(eng)
    try:
        cli = ServeClient(host="127.0.0.1", port=dt.port)
        cli.ping()
        h = cli.open("tcp")
        cli.push(h, np.random.default_rng(0)
                 .standard_normal(duration // 2).astype(np.float32) * 0.1)
        cli.close(h, flush=True)  # < one window: repeat-tiled
        got = cli.collect({h})
        assert len(got[h]) == 1 and np.isfinite(got[h][0][1])
        cli.close_socket()
    finally:
        dt.stop()


class _DaemonTCP:
    def __init__(self, engine, tick_sec=0.02):
        self.daemon = ServeDaemon(engine, 16000, tick_sec=tick_sec)
        self.loop = asyncio.new_event_loop()
        self.port = None
        self._started = threading.Event()
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()
        assert self._started.wait(30), "daemon failed to start"

    def _run(self):
        asyncio.set_event_loop(self.loop)

        async def go():
            server = await self.daemon.start(host="127.0.0.1", port=0)
            self.port = server.sockets[0].getsockname()[1]
            self._started.set()

        self.loop.run_until_complete(go())
        self.loop.run_forever()

    def stop(self):
        async def halt():
            await self.daemon.stop()
            self.loop.stop()

        asyncio.run_coroutine_threadsafe(halt(), self.loop)
        self.thread.join(timeout=30)
        self.loop.close()


def test_daemon_mulaw8_wire(tiny, tmp_path):
    """mulaw8 transport over the wire: the client compands float waves
    to int8, the daemon's device-side expand scores them — scores match
    an engine fed the same mulaw-encoded samples directly."""
    from rtdsd_tpu.engine.serving import mulaw_encode

    model, params, stats, cfg, duration = tiny
    hop = duration // 2
    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            hop=hop, max_streams=2,
                            transport_dtype="mulaw8")
    dt = _DaemonThread(eng, tmp_path / "mu.sock")
    try:
        cli = ServeClient(unix_path=dt.sock_path)
        assert cli.transport == "mulaw8"
        rng = np.random.default_rng(9)
        wave = rng.standard_normal(2 * hop + duration).astype(
            np.float32) * 0.1
        h = cli.open()
        cli.push(h, wave)
        cli.close(h, flush=True)
        got = cli.collect({h})
        cli.close_socket()

        ref = MultiStreamScorer(model, params, stats, cfg,
                                duration=duration, hop=hop, max_streams=2,
                                transport_dtype="mulaw8")
        rh = ref.open_stream()
        ref.push(rh, mulaw_encode(wave))
        ref.close_stream(rh, flush=True)
        want = {ws.start_sample: ws.score for ws in ref.drain()}
        assert {s for s, _, _ in got[h]} == set(want)
        for s, v, _ in got[h]:
            np.testing.assert_allclose(v, want[s], rtol=2e-4, atol=2e-5)
    finally:
        dt.stop()


def test_daemon_cascade_escalation_over_wire(tiny, tmp_path):
    """A cascade engine behind the daemon: with an everything-escalates
    band the wire scores are exactly the flagship's, and the escalated
    flag survives the protocol round-trip."""
    model, params, stats, cfg, duration = tiny
    hop = duration // 2
    # screener = the same model re-initialized (any pair works)
    import jax as _jax
    import jax.numpy as _jnp

    svars = model.init(_jax.random.key(1), _jnp.zeros((1, duration)))
    eng = MultiStreamScorer(model, svars["params"],
                            svars.get("batch_stats", {}), cfg,
                            duration=duration, hop=hop, max_streams=2,
                            transport_dtype="int16",
                            escalate=(model, params, stats),
                            escalate_band=1e9)
    dt = _DaemonThread(eng, tmp_path / "casc.sock")
    try:
        cli = ServeClient(unix_path=dt.sock_path)
        rng = np.random.default_rng(13)
        wave = rng.standard_normal(2 * hop + duration).astype(
            np.float32) * 0.1
        h = cli.open()
        cli.push(h, wave)
        cli.close(h, flush=True)
        got = cli.collect({h})
        cli.close_socket()
        assert len(got[h]) == 3
        assert all(esc for _, _, esc in got[h])  # flag over the wire
        exp = _expected(tiny, wave, duration, hop)  # flagship direct
        np.testing.assert_allclose(
            [v for _, v, _ in sorted(got[h])], exp, rtol=2e-4, atol=2e-5)
    finally:
        dt.stop()


def test_daemon_sheds_overrunning_stream(tiny, tmp_path):
    """A producer pushing faster than the engine scores must not grow
    daemon memory without bound: past max_pending_sec of buffered
    backlog the stream is shed (ERROR then CLOSED, slot freed) while
    the connection and its other streams stay alive."""
    import time

    model, params, stats, cfg, duration = tiny
    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            hop=duration // 2, max_streams=3,
                            transport_dtype="int16")
    # ticker parked: backlog can only grow, so the shed is deterministic
    dt = _DaemonThread(eng, tmp_path / "shed.sock", tick_sec=1e9,
                       max_pending_sec=0.5)  # 8000 samples
    try:
        cli = ServeClient(unix_path=dt.sock_path)
        keeper = cli.open("slow")
        fast = cli.open("fast")
        wave = np.zeros(4000, np.float32)
        for _ in range(3):  # 12000 samples > the 8000 cap
            cli.push(fast, wave)
        # ERROR raised by the client iterator names the overrun...
        with pytest.raises(RuntimeError, match="overrun"):
            next(cli.events())
        # ...after which CLOSED for the shed stream is on the wire
        ftype, payload = cli._read_frame()
        assert ftype == 0x83 and int.from_bytes(payload[:4], "little") \
            == fast
        deadline = time.time() + 10
        while eng.is_open(fast) and time.time() < deadline:
            time.sleep(0.02)
        assert not eng.is_open(fast), "shed slot was not freed"
        assert dt.daemon.overruns == 1
        # in-flight pushes racing the shed (producer hasn't seen the
        # ERROR yet) are tombstoned — silently dropped, no ERROR bounce
        cli.push(fast, wave)
        cli.close(fast, flush=True)
        # the connection and its other stream survive
        cli.ping()
        cli.push(keeper, np.zeros(1000, np.float32))
        # the shed slot returned to the pool: all 3 slots are claimable
        h3, h4 = cli.open(), cli.open()
        assert {keeper, h3, h4} == {0, 1, 2}
        cli.close_socket()
    finally:
        dt.stop()


def test_ticker_stops_on_executor_shutdown(tiny, tmp_path):
    """Executor (interpreter) shutdown must END the ticker task, not
    spin it: the old catch-all retry turned process exit into a busy
    loop re-raising 'cannot schedule new futures after shutdown' every
    tick (found by tools/netserve_bench.py teardown)."""
    import time
    from concurrent.futures import ThreadPoolExecutor

    model, params, stats, cfg, duration = tiny
    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            hop=duration // 2, max_streams=2,
                            transport_dtype="int16")
    dt = _DaemonThread(eng, tmp_path / "shut.sock", tick_sec=0.01)
    try:
        cli = ServeClient(unix_path=dt.sock_path)
        cli.open()  # non-empty _owners: the ticker's poll branch runs
        ex = ThreadPoolExecutor(1)
        dt.loop.call_soon_threadsafe(dt.loop.set_default_executor, ex)
        ex.shutdown(wait=False)  # next run_in_executor submit raises
        deadline = time.time() + 15
        while not dt.daemon._ticker.done() and time.time() < deadline:
            time.sleep(0.05)
        assert dt.daemon._ticker.done(), \
            "ticker kept spinning after executor shutdown"
        cli.close_socket()
    finally:
        dt.stop()


def test_daemon_disconnect_releases_slots(served):
    """A vanished producer's streams are abandoned (no flush) and the
    slots return to the pool."""
    dt, duration = served
    cli = ServeClient(unix_path=dt.sock_path)
    h = cli.open("drop")
    cli.push(h, np.zeros(duration // 4, np.float32))
    cli.close_socket()  # vanish without CLOSE

    deadline = __import__("time").time() + 20
    cli2 = ServeClient(unix_path=dt.sock_path)
    hs = []
    while len(hs) < 3 and __import__("time").time() < deadline:
        try:
            hs.append(cli2.open())
        except RuntimeError:  # cleanup hasn't run yet
            __import__("time").sleep(0.05)
    assert len(hs) == 3
    cli2.close_socket()


def test_daemon_survives_malformed_frames(served, tiny):
    """The daemon parses untrusted network bytes; no byte sequence may
    take down the process or the ticker. Feed adversarial frames on
    throwaway connections, then prove a fresh connection still scores
    exactly."""
    import socket
    import time

    dt, duration = served
    hop = duration // 2

    def raw_conn():
        s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        s.connect(dt.sock_path)
        s.settimeout(10)
        return s

    attacks = [
        b"\x00" * 5,                                   # unknown type 0
        _frame(0x7F, b"\x01\x02\x03"),                 # unknown type
        b"\x02\xff\xff\xff\xff",                       # 4 GiB PUSH claim
        _frame(0x02, b""),                             # PUSH no handle
        _frame(0x02, b"\x00\x00\x00\x00\x01"),         # odd int16 payload
        _frame(0x03, b"\x07"),                         # CLOSE short
        _frame(0x01, b"\xff" * 300),                   # OPEN garbage name
        b"\x82\x10",                                   # truncated header
        bytes(range(256)) * 8,                         # plain garbage
    ]
    for blob in attacks:
        s = raw_conn()
        try:
            s.sendall(blob)
            # read whatever comes back (HELLO/ERRORs) until the daemon
            # closes or goes quiet; the point is no daemon crash
            s.settimeout(0.5)
            try:
                while s.recv(4096):
                    pass
            except socket.timeout:
                pass
        except (BrokenPipeError, ConnectionResetError):
            pass  # daemon dropped the connection — acceptable
        finally:
            s.close()

    # fresh connection still scores exactly after every attack
    deadline = time.time() + 20
    cli = None
    while cli is None:
        try:
            cli = ServeClient(unix_path=dt.sock_path)
        except (ConnectionError, RuntimeError):
            assert time.time() < deadline, "daemon dead after fuzzing"
            time.sleep(0.1)
    cli.ping()
    rng = np.random.default_rng(17)
    wave = rng.standard_normal(2 * hop + duration).astype(np.float32) * 0.1
    h = cli.open("post-fuzz")
    cli.push(h, wave)
    cli.close(h, flush=True)
    got = sorted(cli.collect({h})[h])
    exp = _expected(tiny, wave, duration, hop)
    np.testing.assert_allclose([v for _, v, _ in got], exp,
                               rtol=2e-4, atol=2e-5)
    cli.close_socket()


def test_daemon_concurrent_connections_interleaved(tiny, tmp_path):
    """Several producer threads on separate connections, pushing
    concurrently in ragged chunks: every stream's scores must equal
    direct window scoring of its own wave (no cross-stream mixups under
    interleaving), and every slot returns to the pool."""
    import threading as th
    import time

    model, params, stats, cfg, duration = tiny
    hop = duration // 2
    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            hop=hop, max_streams=8,
                            transport_dtype="int16")
    dt = _DaemonThread(eng, tmp_path / "many.sock", tick_sec=0.02)
    try:
        rng = np.random.default_rng(23)
        waves = [rng.standard_normal(
            int(rng.integers(2, 5)) * hop + duration).astype(np.float32)
            * 0.1 for _ in range(8)]
        results = {}
        errors = []

        def producer(idx):
            try:
                cli = ServeClient(unix_path=str(tmp_path / "many.sock"))
                h = cli.open(f"conn{idx}")
                w = waves[idx]
                cur = 0
                r = np.random.default_rng(100 + idx)
                while cur < len(w):
                    n = int(r.integers(200, 1500))
                    cli.push(h, w[cur:cur + n])
                    cur += n
                    time.sleep(0.001)
                cli.close(h, flush=True)
                results[idx] = sorted(cli.collect({h})[h])
                cli.close_socket()
            except Exception as e:  # pragma: no cover
                errors.append((idx, e))

        threads = [th.Thread(target=producer, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errors, errors
        assert len(results) == 8
        for idx, got in results.items():
            exp = _expected(tiny, waves[idx], duration, hop)
            assert [s for s, _, _ in got] == \
                [k * hop for k in range(len(exp))]
            np.testing.assert_allclose([v for _, v, _ in got], exp,
                                       rtol=2e-4, atol=2e-5)
        # all 8 slots back in the pool
        deadline = time.time() + 20
        cli = ServeClient(unix_path=str(tmp_path / "many.sock"))
        hs = []
        while len(hs) < 8 and time.time() < deadline:
            try:
                hs.append(cli.open())
            except RuntimeError:
                time.sleep(0.05)
        assert len(hs) == 8
        cli.close_socket()
    finally:
        dt.stop()


def test_daemon_reaps_idle_streams(tiny, tmp_path):
    """A producer that keeps its connection open but stops pushing must
    not hold a slot forever: past idle_timeout_sec the ticker sheds the
    stream (ERROR + CLOSED), the slot returns to the pool, and the
    connection plus its active streams keep working."""
    import time

    model, params, stats, cfg, duration = tiny
    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            hop=duration // 2, max_streams=2,
                            transport_dtype="int16")
    dt = _DaemonThread(eng, tmp_path / "idle.sock", tick_sec=0.02,
                       idle_timeout_sec=0.3)
    try:
        cli = ServeClient(unix_path=dt.sock_path)
        silent = cli.open("silent")  # OPENed, never pushed
        active = cli.open("active")
        # keep the active stream pushing past the silent one's timeout
        deadline = time.time() + 10
        shed_seen = False
        while time.time() < deadline and not shed_seen:
            cli.push(active, np.zeros(400, np.float32))
            cli._sock.settimeout(0.1)
            try:
                ftype, payload = cli._read_frame()
            except Exception:
                continue
            finally:
                cli._sock.settimeout(60)
            if ftype == 0xFF:
                h = int.from_bytes(payload[:4], "little")
                assert h == silent
                assert b"idle timeout" in payload[4:]
                shed_seen = True
            elif ftype == 0x82:
                pass  # scores from the active stream
        assert shed_seen, "idle stream was never shed"
        # CLOSED for the silent stream follows
        for ev in cli.events():
            if ev == ("closed", silent):
                break
            assert ev[0] in ("score",)
        assert dt.daemon.idle_sheds == 1
        # the active stream survived; the freed slot is claimable
        cli.push(active, np.zeros(400, np.float32))
        cli.ping()
        h2 = cli.open("reclaim")
        assert h2 == silent  # the reaped slot, recycled
        cli.close_socket()
    finally:
        dt.stop()


def test_daemon_score_transform_calibrates_wire_scores(tiny, tmp_path):
    """score_transform (cli.daemon --calibration) maps every wire f32
    through the calibration while the protocol frame stays unchanged:
    received scores equal platt_prob(direct engine scores)."""
    from rtdsd_tpu.utils.metrics import platt_prob

    model, params, stats, cfg, duration = tiny
    hop = duration // 2
    cal = {"platt_a": 0.7, "platt_b": -0.3, "eer_threshold": 0.0}
    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            hop=hop, max_streams=2,
                            transport_dtype="int16")
    dt = _DaemonThread(eng, tmp_path / "cal.sock",
                       score_transform=lambda s: platt_prob(s, cal))
    try:
        cli = ServeClient(unix_path=dt.sock_path)
        rng = np.random.default_rng(9)
        wave = rng.standard_normal(2 * hop + duration).astype(np.float32) \
            * 0.1
        h = cli.open("calstream")
        cli.push(h, wave)
        cli.close(h, flush=True)
        got = sorted(cli.collect({h})[h])
        cli.close_socket()
    finally:
        dt.stop()
    exp = platt_prob(_expected(tiny, wave, duration, hop), cal)
    assert len(got) >= len(exp)
    np.testing.assert_allclose([v for _, v, _ in got[:len(exp)]], exp,
                               rtol=2e-4, atol=2e-5)
    assert all(0.0 <= v <= 1.0 for _, v, _ in got)


def test_daemon_gated_flag_over_wire(tiny, tmp_path):
    """An energy-gated engine behind the daemon marks silent windows
    with FLAG_GATED in the SCORE flags byte (loud windows carry 0), so
    wire clients can tell a real model score from a gate fill-in."""
    from rtdsd_tpu.engine.netserve import FLAG_ESCALATED, FLAG_GATED

    model, params, stats, cfg, duration = tiny
    hop = duration // 2
    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            hop=hop, max_streams=2,
                            transport_dtype="int16",
                            gate_rms_dbfs=-50.0, gate_score=-3.0)
    dt = _DaemonThread(eng, tmp_path / "gate.sock")
    try:
        cli = ServeClient(unix_path=dt.sock_path)
        rng = np.random.default_rng(29)
        loud = rng.standard_normal(duration).astype(np.float32) * 0.1
        wave = np.concatenate([loud, np.zeros(2 * duration, np.float32),
                               loud])
        h = cli.open("g")
        cli.push(h, wave)
        cli.close(h, flush=True)
        got = sorted(cli.collect({h})[h])
        cli.close_socket()
    finally:
        dt.stop()
    assert got
    n_gated = 0
    for start, score, flags in got:
        silent = (start >= duration
                  and start + duration <= 3 * duration)
        if silent:
            assert flags == FLAG_GATED and score == -3.0, (start, flags)
            n_gated += 1
        else:
            assert not (flags & FLAG_GATED), (start, flags)
            assert not (flags & FLAG_ESCALATED)
    assert n_gated >= 2


def test_daemon_from_artifact_matches_ckpt_daemon(tiny, tmp_path):
    """r4 (VERDICT item 5) wire exactness: a daemon running on an
    artifact-reconstructed engine (cli.export --serving bundle, no model
    code traced) must emit byte-identical SCORE events to a daemon on
    the model-backed engine for the same pushed samples."""
    from rtdsd_tpu.cli.export import export_serving, load_serving, \
        save_serving

    model, params, stats, cfg, duration = tiny
    hop = duration // 2
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    ext, sco, escx, meta = export_serving(
        model, variables, cfg, duration=duration, hop=hop, max_streams=2,
        transport_dtype="int16", platforms=("cpu",))
    prefix = str(tmp_path / "bundle")
    save_serving(ext, sco, escx, prefix, meta, variables)
    art_eng, _meta = load_serving(prefix)

    ckpt_eng = MultiStreamScorer(model, params, stats, cfg,
                                 duration=duration, hop=hop,
                                 max_streams=2, transport_dtype="int16")
    rng = np.random.default_rng(9)
    wave = rng.standard_normal(3 * hop + duration).astype(np.float32) * 0.1
    results = []
    for tag, eng in (("art", art_eng), ("ckpt", ckpt_eng)):
        dt = _DaemonThread(eng, tmp_path / f"{tag}.sock")
        try:
            cli = ServeClient(unix_path=dt.sock_path)
            h = cli.open("wire")
            for i in range(0, len(wave), 700):
                cli.push(h, wave[i:i + 700])
            cli.close(h, flush=True)
            results.append(sorted(cli.collect({h})[h]))
            cli.close_socket()
        finally:
            dt.stop()
    art, ckpt = results
    assert len(art) == len(ckpt) > 0
    assert [s for s, _, _ in art] == [s for s, _, _ in ckpt]
    np.testing.assert_allclose([sc for _, sc, _ in art],
                               [sc for _, sc, _ in ckpt],
                               rtol=1e-5, atol=1e-6)
