"""Native decoder/loader tests.

Includes a minimal FLAC *encoder* (test-only) that produces spec-conformant
streams covering the decoder's subframe types: CONSTANT, VERBATIM,
FIXED(order 2) and LPC(order 2) with partitioned Rice residuals, plus
mid-side stereo. Round-tripping through the native decoder must reproduce
the exact integer samples.
"""

import os

import numpy as np
import pytest

from rtdsd_tpu.native import flac as native

if not native.build_if_needed():
    pytest.skip("native toolchain unavailable", allow_module_level=True)


# ------------------------------------------------------- minimal FLAC writer

class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int):
        value &= (1 << n) - 1
        self.acc = (self.acc << n) | value
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.bytes.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, n: int):
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int):
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.bytes)


def _streaminfo(block_size, sr, channels, bps, total):
    bw = BitWriter()
    bw.write(block_size, 16)
    bw.write(block_size, 16)
    bw.write(0, 24)
    bw.write(0, 24)
    bw.write(sr, 20)
    bw.write(channels - 1, 3)
    bw.write(bps - 1, 5)
    bw.write(total, 36)
    for _ in range(16):
        bw.write(0, 8)
    return b"\x80\x00\x00\x22" + bw.getvalue()  # last-block, type 0, len 34


def _rice_residual(bw: BitWriter, resid, param):
    bw.write(0, 2)       # method: 4-bit rice
    bw.write(0, 4)       # partition order 0
    bw.write(param, 4)
    for r in resid:
        zz = (r << 1) ^ (r >> 63) if r < 0 else (r << 1)
        zz = (abs(r) << 1) - (1 if r < 0 else 0)
        q, rem = zz >> param, zz & ((1 << param) - 1)
        bw.write_unary(q)
        bw.write(rem, param)


def _subframe_constant(bw, value, bps):
    bw.write(0, 1); bw.write(0, 6); bw.write(0, 1)
    bw.write_signed(value, bps)


def _subframe_verbatim(bw, samples, bps):
    bw.write(0, 1); bw.write(1, 6); bw.write(0, 1)
    for s in samples:
        bw.write_signed(int(s), bps)


def _subframe_fixed2(bw, samples, bps, param=6):
    bw.write(0, 1); bw.write(0b001010, 6); bw.write(0, 1)
    bw.write_signed(int(samples[0]), bps)
    bw.write_signed(int(samples[1]), bps)
    resid = [int(samples[i]) - (2 * int(samples[i - 1]) - int(samples[i - 2]))
             for i in range(2, len(samples))]
    _rice_residual(bw, resid, param)


def _subframe_lpc2(bw, samples, bps, c0=3, c1=-1, shift=1, precision=5,
                   param=6):
    order = 2
    bw.write(0, 1); bw.write(0b100000 | (order - 1), 6); bw.write(0, 1)
    for i in range(order):
        bw.write_signed(int(samples[i]), bps)
    bw.write(precision - 1, 4)
    bw.write_signed(shift, 5)
    bw.write_signed(c0, precision)
    bw.write_signed(c1, precision)
    resid = [int(samples[i]) - ((c0 * int(samples[i - 1]) +
                                 c1 * int(samples[i - 2])) >> shift)
             for i in range(order, len(samples))]
    _rice_residual(bw, resid, param)


def _frame(channel_samples, bps=16, kinds=("verbatim",), ch_asgn=None):
    block_size = len(channel_samples[0])
    nch = len(channel_samples)
    if ch_asgn is None:
        ch_asgn = nch - 1
    bw = BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 1)            # reserved
    bw.write(0, 1)            # fixed blocksize strategy
    bw.write(0b0111, 4)       # 16-bit block size follows
    bw.write(0, 4)            # sample rate from streaminfo
    bw.write(ch_asgn, 4)
    bw.write(0b100, 3)        # 16 bps
    bw.write(0, 1)
    bw.write(0, 8)            # utf8 frame number 0
    bw.write(block_size - 1, 16)
    bw.write(0, 8)            # CRC-8 (decoder skips)
    for c, samples in enumerate(channel_samples):
        sub_bps = bps
        if (ch_asgn == 8 and c == 1) or (ch_asgn == 9 and c == 0) or \
           (ch_asgn == 10 and c == 1):
            sub_bps += 1
        kind = kinds[c % len(kinds)]
        if kind == "constant":
            _subframe_constant(bw, int(samples[0]), sub_bps)
        elif kind == "verbatim":
            _subframe_verbatim(bw, samples, sub_bps)
        elif kind == "fixed2":
            _subframe_fixed2(bw, samples, sub_bps)
        elif kind == "lpc2":
            _subframe_lpc2(bw, samples, sub_bps)
    bw.align()
    bw.write(0, 16)           # CRC-16 (decoder skips)
    return bw.getvalue()


def write_flac(path, channel_samples, sr=16000, bps=16, kinds=("verbatim",),
               ch_asgn=None):
    block = len(channel_samples[0])
    data = (b"fLaC" +
            _streaminfo(block, sr, len(channel_samples), bps, block) +
            _frame(channel_samples, bps, kinds, ch_asgn))
    with open(path, "wb") as f:
        f.write(data)


def _int16(rng, n):
    return rng.integers(-2000, 2000, n).astype(np.int64)


# ------------------------------------------------------------------- tests

@pytest.mark.parametrize("kind", ["constant", "verbatim", "fixed2", "lpc2"])
def test_flac_subframe_types_roundtrip(tmp_path, rng, kind):
    n = 256
    if kind == "constant":
        samples = np.full(n, 137, np.int64)
    elif kind == "lpc2":
        # smooth signal so LPC residuals stay small
        t = np.arange(n)
        samples = (1500 * np.sin(t / 9.0)).astype(np.int64)
    else:
        samples = _int16(rng, n)
    path = str(tmp_path / f"{kind}.flac")
    write_flac(path, [samples], kinds=(kind,))
    wave, sr = native.decode(path)
    assert sr == 16000
    assert wave.shape == (1, n)
    np.testing.assert_array_equal(
        np.round(wave[0] * 32768.0).astype(np.int64), samples)


def test_flac_stereo_mid_side(tmp_path, rng):
    n = 192
    left = _int16(rng, n)
    right = _int16(rng, n)
    mid = (left + right) >> 1
    side = left - right
    path = str(tmp_path / "ms.flac")
    write_flac(path, [mid, side], kinds=("verbatim",), ch_asgn=10)
    wave, _ = native.decode(path)
    assert wave.shape == (2, n)
    got = np.round(wave * 32768.0).astype(np.int64)
    np.testing.assert_array_equal(got[0], left)
    np.testing.assert_array_equal(got[1], right)


def test_flac_via_load_audio(tmp_path, rng):
    """data.io.load_audio routes .flac through the native decoder."""
    from rtdsd_tpu.data.io import load_audio

    n = 200
    samples = _int16(rng, n)
    path = str(tmp_path / "x.flac")
    write_flac(path, [samples])
    wave, sr = load_audio(path)
    assert sr == 16000 and wave.shape == (n,)
    np.testing.assert_array_equal(np.round(wave * 32768).astype(np.int64),
                                  samples)


def test_native_wav_matches_python_reader(tmp_path, rng):
    from rtdsd_tpu.data.io import read_wav, write_wav

    wave = (rng.standard_normal(1000) * 0.4).astype(np.float32)
    path = str(tmp_path / "w.wav")
    write_wav(path, wave, 16000)
    nat, sr_n = native.decode(path)
    py, sr_p = read_wav(path)
    assert sr_n == sr_p
    np.testing.assert_allclose(nat, py, atol=1e-7)


def test_batch_loader_tile_and_crop(tmp_path, rng):
    paths = []
    refs = []
    for i, n in enumerate([300, 900, 1600]):
        samples = _int16(rng, n)
        p = str(tmp_path / f"b{i}.flac")
        # block size must equal n for single-frame files
        write_flac(p, [samples])
        paths.append(p)
        refs.append(samples.astype(np.float32) / 32768.0)

    duration = 800
    out, failed = native.load_batch(paths, duration, seed=0)
    assert failed == 0
    assert out.shape == (3, duration)
    for i, ref in enumerate(refs):
        expected = np.resize(ref, duration) if len(ref) < duration \
            else ref[:duration]
        np.testing.assert_allclose(out[i], expected, atol=1e-6)

    # random-start: deterministic per seed, differs from first-window
    out_a, _ = native.load_batch(paths, duration, seed=99)
    out_b, _ = native.load_batch(paths, duration, seed=99)
    np.testing.assert_array_equal(out_a, out_b)
    assert not np.allclose(out_a[2], out[2])


def test_batch_loader_missing_file(tmp_path, rng):
    samples = _int16(rng, 400)
    good = str(tmp_path / "g.flac")
    write_flac(good, [samples])
    out, failed = native.load_batch([good, str(tmp_path / "missing.flac")],
                                    300)
    assert failed == 1
    assert np.all(out[1] == 0)
    assert not np.all(out[0] == 0)


def test_batch_loader_resamples(tmp_path, rng):
    """A 32 kHz file is resampled to the pipeline's 16 kHz."""
    from rtdsd_tpu.data.io import write_wav

    t = np.arange(3200) / 32000  # 0.1 s at 32 kHz
    wave = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    path = str(tmp_path / "hi.wav")
    write_wav(path, wave, 32000)
    out, failed = native.load_batch([path], duration=1600, expected_sr=16000)
    assert failed == 0
    # 0.1 s at 16 kHz = 1600 samples of a 440 Hz tone: same frequency content
    spec = np.abs(np.fft.rfft(out[0]))
    peak_hz = np.argmax(spec) * 16000 / 1600
    assert abs(peak_hz - 440) < 20
    # without resampling the tone would read as 220 Hz worth of cycles... and
    # with expected_sr=0 the raw samples are tiled instead
    out2, _ = native.load_batch([path], duration=1600, expected_sr=0)
    assert not np.allclose(out, out2)
