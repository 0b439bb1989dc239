"""ctypes bindings for the native decoder/loader (librtdsd_native.so).

API:
  available() -> bool
  decode(path) -> (float32 (C, T) array, sample_rate)
  load_batch(paths, duration, seed=0, threads=N, expected_sr=16000)
      -> ((B, duration) float32 waves, n_failed)

``load_batch`` releases the GIL for the whole batch (decode + tile/crop run
on a C++ thread pool), making it the host-side fast path the threaded Python
loader calls into when the library is built.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "librtdsd_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.rtdsd_decode.restype = ctypes.c_int64
        lib.rtdsd_decode.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.rtdsd_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        lib.rtdsd_load_batch_sr.restype = ctypes.c_int
        lib.rtdsd_load_batch_sr.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int64,
            ctypes.c_uint64, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int]
        if hasattr(lib, "rtdsd_load_batch_status"):
            lib.rtdsd_load_batch_status.restype = ctypes.c_int
            lib.rtdsd_load_batch_status.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.c_int64, ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int)]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def build_if_needed() -> bool:
    if available():
        return True
    try:
        from rtdsd_tpu.native.build import build

        build(verbose=False)
        global _tried
        _tried = False
        return available()
    except Exception:
        return False


def decode(path: str) -> Tuple[np.ndarray, int]:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built "
                           "(python -m rtdsd_tpu.native.build)")
    out = ctypes.POINTER(ctypes.c_float)()
    channels = ctypes.c_int()
    sr = ctypes.c_int()
    n = lib.rtdsd_decode(path.encode(), ctypes.byref(out),
                         ctypes.byref(channels), ctypes.byref(sr))
    if n < 0:
        raise ValueError(f"native decode failed: {path}")
    c = channels.value
    arr = np.ctypeslib.as_array(out, shape=(int(n) * c,)).copy()
    lib.rtdsd_free(out)
    return arr.reshape(-1, c).T.copy(), sr.value


def load_batch(paths: List[str], duration: int, seed: int = 0,
               threads: int = 0, expected_sr: int = 16000
               ) -> Tuple[np.ndarray, int]:
    """Decode + (linear) resample to expected_sr if needed + duration-fit a
    batch. Returns ((B, duration) float32, n_failed). seed=0 ->
    deterministic first-window crops; expected_sr=0 disables resampling."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built")
    if threads <= 0:
        threads = min(len(paths), os.cpu_count() or 1)
    out = np.empty((len(paths), duration), np.float32)
    c_paths = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    failed = lib.rtdsd_load_batch_sr(
        c_paths, len(paths), duration, seed,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), threads,
        expected_sr)
    return out, int(failed)


def load_batch_status(paths: List[str], duration: int, seed: int = 0,
                      threads: int = 0, expected_sr: int = 16000
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Like :func:`load_batch` but returns per-file outcomes: ((B, duration)
    float32, (B,) int32 failed-indices array). Failed rows are zero-filled;
    the caller decides whether to raise, skip, or substitute them."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built")
    if not hasattr(lib, "rtdsd_load_batch_status"):  # stale .so on disk
        out, n_failed = load_batch(paths, duration, seed, threads, expected_sr)
        if n_failed:
            # the legacy ABI cannot say WHICH rows failed (guessing by
            # all-zero rows would misattribute legitimate digital silence)
            raise RuntimeError(
                f"{n_failed} file(s) failed to decode and the built native "
                "library predates per-file status reporting — rebuild it: "
                "python -m rtdsd_tpu.native.build")
        return out, np.empty((0,), np.int32)
    if threads <= 0:
        threads = min(len(paths), os.cpu_count() or 1)
    out = np.empty((len(paths), duration), np.float32)
    status = np.zeros((len(paths),), np.int32)
    c_paths = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    lib.rtdsd_load_batch_status(
        c_paths, len(paths), duration, seed,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), threads,
        expected_sr, status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return out, np.where(status != 0)[0].astype(np.int32)
