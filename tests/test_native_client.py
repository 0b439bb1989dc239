"""Native C daemon-client tests (native/serve_client.cpp via ctypes).

The C library re-implements the wire protocol AND the client-side
transport encodings (float->int16 PCM with round-half-even, continuous
mu-law), so the oracles are:

  1. encoding parity — bytes the C client puts on the wire must equal
     the pure-Python ServeClient's (np.rint / mulaw_encode) bit-exactly;
  2. end-to-end — scores received through the C client must equal the
     Python client's for the same audio (same engine, same daemon);
  3. the standalone feeder binary (rtdsd_feed) streams a real WAV file
     and its printed aggregate matches direct engine scoring.

All tests build the library with g++ on first use (session-cached .so).
"""

import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtdsd_tpu.engine.netserve import ServeClient
from rtdsd_tpu.engine.serving import MultiStreamScorer, mulaw_encode
from rtdsd_tpu.models.wav2vec2 import Wav2Vec2Config
from rtdsd_tpu.models.zoo import XLSR_AASIST

from test_netserve import _DaemonThread, tiny  # noqa: F401  (fixture)


@pytest.fixture(scope="module")
def native():
    from rtdsd_tpu.native import client

    try:
        client.build()
    except Exception as e:  # g++ missing on a minimal host
        pytest.skip(f"cannot build librtdsd_client.so: {e}")
    return client


def _engine(tiny, **kw):
    model, params, stats, cfg, duration = tiny
    return MultiStreamScorer(model, params, stats, cfg, duration=duration,
                             hop=duration // 2, max_streams=4, **kw), duration


# ------------------------------------------------------------- encoding


@pytest.mark.parametrize("transport", ["int16", "mulaw8", "float32"])
def test_wire_encoding_matches_python_client(native, transport, tmp_path,
                                             tiny):
    """The C client's transport conversion must put the SAME bytes on
    the wire as the Python client (engine/serving.py push() semantics):
    int16 = clip(rint(x*32768)) half-to-even, mulaw8 = continuous mu-law
    quantized after companding. A mismatch would silently score slightly
    different waves depending on which client fed the daemon."""
    eng, duration = _engine(tiny, transport_dtype=transport)
    dt = _DaemonThread(eng, tmp_path / f"enc_{transport}.sock",
                       tick_sec=1e9)  # ticker parked: inspect raw buffers
    try:
        rng = np.random.default_rng(3)
        # adversarial values: exact halves after scaling, clip edges, ±1
        wave = np.concatenate([
            rng.uniform(-1.2, 1.2, 3000).astype(np.float32),
            np.float32([1.0, -1.0, 0.5 / 32768, 1.5 / 32768, -0.5 / 32768,
                        32766.5 / 32768, -32768.5 / 32768, 0.0])])

        pc = ServeClient(unix_path=dt.sock_path)
        nc = native.NativeServeClient(unix_path=dt.sock_path)
        assert (nc.sample_rate, nc.duration, nc.hop, nc.transport,
                nc.max_streams) == (pc.sample_rate, pc.duration, pc.hop,
                                    pc.transport, pc.max_streams)
        hp = pc.open("py")
        hn = nc.open("c")
        pc.push(hp, wave)
        nc.push(hn, wave)
        pc.ping()
        nc.ping()  # PONGs flush both pushes through the daemon loop

        import time
        deadline = time.time() + 10
        while time.time() < deadline:
            a = eng._slots[hp]
            b = eng._slots[hn]
            if a.chunks_len == b.chunks_len and a.chunks_len >= len(wave):
                break
            time.sleep(0.02)
        got_py = np.concatenate(list(eng._slots[hp].chunks))
        got_c = np.concatenate(list(eng._slots[hn].chunks))
        assert got_py.dtype == got_c.dtype
        np.testing.assert_array_equal(got_py, got_c)
        if transport == "mulaw8":  # pin against the encoder directly too
            np.testing.assert_array_equal(got_c, mulaw_encode(wave))
        nc.close_socket()
        pc.close_socket()
    finally:
        dt.stop()


# ----------------------------------------------------------- end-to-end


def test_native_client_scores_match_python_client(native, tiny, tmp_path):
    """Same audio through the C client and the Python client must yield
    identical window scores (same engine; both encodings already pinned
    equal above, so any difference is a framing/protocol bug)."""
    eng, duration = _engine(tiny, transport_dtype="int16")
    dt = _DaemonThread(eng, tmp_path / "native.sock", tick_sec=0.02)
    try:
        rng = np.random.default_rng(11)
        wave = rng.uniform(-0.5, 0.5, duration * 3).astype(np.float32)

        nc = native.NativeServeClient(unix_path=dt.sock_path)
        hn = nc.open("c-stream")
        for i in range(0, len(wave), 1000):
            nc.push(hn, wave[i:i + 1000])
        nc.close(hn, flush=True)
        got_c = nc.collect({hn})[hn]

        pc = ServeClient(unix_path=dt.sock_path)
        hp = pc.open("py-stream")
        for i in range(0, len(wave), 1000):
            pc.push(hp, wave[i:i + 1000])
        pc.close(hp, flush=True)
        got_py = pc.collect({hp})[hp]

        assert len(got_c) == len(got_py) > 0
        for (s1, v1, e1), (s2, v2, e2) in zip(got_c, got_py):
            assert s1 == s2 and e1 == e2
            assert v1 == pytest.approx(v2, abs=0.0)  # identical bytes in
        nc.close_socket()
        pc.close_socket()
    finally:
        dt.stop()


def test_native_client_error_events_not_fatal(native, tiny, tmp_path):
    """ERROR frames surface as ("error", handle, message) events so one
    bad stream doesn't kill a consumer multiplexing many streams."""
    eng, duration = _engine(tiny)
    dt = _DaemonThread(eng, tmp_path / "err.sock", tick_sec=0.02)
    try:
        nc = native.NativeServeClient(unix_path=dt.sock_path)
        nc.push_bytes(99, np.zeros(100, np.int16).tobytes())  # never opened
        ev = next(nc.events())
        assert ev[0] == "error" and ev[1] == 99
        assert "not an open stream" in ev[2]
        nc.ping()  # connection still healthy
        nc.close_socket()
    finally:
        dt.stop()


def test_feeder_binary_end_to_end(native, tiny, tmp_path):
    """rtdsd_feed (the dependency-free C deployment feeder) must stream
    a PCM16 WAV and print the same per-file aggregate as direct engine
    scoring through the Python client."""
    from rtdsd_tpu.data.io import write_wav
    from rtdsd_tpu.native.build import build_feeder

    try:
        feed = build_feeder(verbose=False)
    except Exception as e:
        pytest.skip(f"cannot build rtdsd_feed: {e}")

    eng, duration = _engine(tiny, transport_dtype="int16")
    dt = _DaemonThread(eng, tmp_path / "feed.sock", tick_sec=0.02)
    try:
        rng = np.random.default_rng(7)
        wave = rng.uniform(-0.5, 0.5, duration * 2).astype(np.float32)
        wav_path = tmp_path / "clip.wav"
        write_wav(str(wav_path), wave, 16000)

        out = subprocess.run(
            [feed, f"unix:{dt.sock_path}", str(wav_path)],
            capture_output=True, text=True, timeout=120)
        assert out.returncode == 0, out.stderr
        last = out.stdout.strip().splitlines()[-1].split()
        feed_mean = float(last[-1])

        # oracle: the same WAV file through the Python client — the
        # feeder reads PCM16 bytes, so push the PCM ints, not floats
        from rtdsd_tpu.data.io import load_audio
        w2, _ = load_audio(str(wav_path))
        pc = ServeClient(unix_path=dt.sock_path)
        h = pc.open("oracle")
        pc.push(h, w2)
        pc.close(h, flush=True)
        scores = [s for _, s, _ in pc.collect({h})[h]]
        assert feed_mean == pytest.approx(float(np.mean(scores)), abs=1e-4)
        pc.close_socket()
    finally:
        dt.stop()
