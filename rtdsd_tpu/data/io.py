"""Host-side audio decode.

The reference decodes with torchaudio/librosa (libsox/ffmpeg C++ backends,
``/root/reference/data/train_set.py:109``, ``test_set.py:41,183,286``).
Decode stays on the host here too (SURVEY.md §2.4); this module resolves a
decoder per container format:

- WAV: pure-numpy RIFF reader (PCM 8/16/24/32 and float32/64), no
  dependencies, with int -> float scaling matching torchaudio
  (int16/32768 etc.).
- FLAC: the framework's native C++ decoder (:mod:`rtdsd_tpu.native`) when
  built, else ``soundfile`` if installed.

All decoders return (mono float32 waveform, sample_rate). Multi-channel
audio is collapsed by taking channel 0 after a squeeze, matching the
reference's ``utter.squeeze()`` on (1, T) tensors.
"""

from __future__ import annotations

import os
import struct
from typing import Tuple

import numpy as np


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Minimal RIFF/WAVE reader (PCM + IEEE float), returns (float32 (C,T), sr)."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError(f"{path}: not a RIFF/WAVE file")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
            fmt_body = body
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)
    if fmt is None or raw is None:
        raise ValueError(f"{path}: missing fmt/data chunk")
    audio_fmt, channels, sr, _, _, bits = fmt
    if audio_fmt == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: the SubFormat GUID's
        # first two bytes carry the real format code (1=PCM, 3=IEEE float)
        audio_fmt = (struct.unpack("<H", fmt_body[24:26])[0]
                     if len(fmt_body) >= 26 else 1)
    if audio_fmt == 3:  # IEEE float
        dt = np.float32 if bits == 32 else np.float64
        x = np.frombuffer(raw, dtype=dt).astype(np.float32)
    elif audio_fmt == 1:
        if bits == 16:
            x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 32:
            x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
        elif bits == 8:
            x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        elif bits == 24:
            b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
            x = ((b[:, 0].astype(np.int32)) | (b[:, 1].astype(np.int32) << 8)
                 | (b[:, 2].astype(np.int32) << 16))
            x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.float32) / 8388608.0
        else:
            raise ValueError(f"{path}: unsupported PCM bit depth {bits}")
    else:
        raise ValueError(f"{path}: unsupported WAV format code {audio_fmt}")
    n = (len(x) // channels) * channels
    return x[:n].reshape(-1, channels).T.copy(), sr


_NATIVE_FLAC = None
_SOUNDFILE = None


def _flac_backends():
    global _NATIVE_FLAC, _SOUNDFILE
    if _NATIVE_FLAC is None:
        try:
            from rtdsd_tpu.native import flac as native_flac
            _NATIVE_FLAC = native_flac if native_flac.available() else False
        except Exception:
            _NATIVE_FLAC = False
    if _SOUNDFILE is None:
        try:
            import soundfile
            _SOUNDFILE = soundfile
        except Exception:
            _SOUNDFILE = False
    return _NATIVE_FLAC, _SOUNDFILE


def read_flac(path: str) -> Tuple[np.ndarray, int]:
    native_flac, soundfile = _flac_backends()
    if native_flac:
        wave, sr = native_flac.decode(path)
        return wave, sr
    if soundfile:
        x, sr = soundfile.read(path, dtype="float32", always_2d=True)
        return x.T.copy(), sr
    raise RuntimeError(
        "No FLAC decoder available: build the native decoder "
        "(python -m rtdsd_tpu.native.build) or install soundfile")


def load_audio(path: str, mono: bool = True) -> Tuple[np.ndarray, int]:
    """Decode an audio file -> (float32 waveform, sample_rate).

    Returns shape (T,) when ``mono`` (channel 0, matching the reference's
    squeeze of torchaudio's (1, T)), else (C, T).
    """
    # sniff the container by magic bytes — extension is only a hint (the
    # ASVspoof protocols hard-code .flac names; decode what's actually there)
    with open(path, "rb") as f:
        magic = f.read(4)
    x, sr = read_flac(path) if magic == b"fLaC" else read_wav(path)
    if mono:
        return np.ascontiguousarray(x[0]), sr
    return x, sr


def write_wav(path: str, wave: np.ndarray, sr: int) -> None:
    """PCM16 WAV writer (for tests and tools)."""
    wave = np.asarray(wave)
    if wave.ndim == 1:
        wave = wave[None]
    pcm = np.clip(wave.T * 32768.0, -32768, 32767).astype("<i2")
    c, n = wave.shape[0], pcm.size
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + 2 * n) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, c, sr,
                                      sr * c * 2, c * 2, 16))
        f.write(b"data" + struct.pack("<I", 2 * n))
        f.write(pcm.tobytes())
