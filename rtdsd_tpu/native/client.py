"""ctypes bindings for the native daemon client (librtdsd_client.so).

The C library (serve_client.cpp) speaks the serving daemon's wire
protocol v1 (engine/netserve.py) with zero dependencies, so non-Python
producers can stream audio in. This binding exists for tests and for
Python deployments that want the C transport encoding; it mirrors the
pure-Python :class:`rtdsd_tpu.engine.netserve.ServeClient` API.

API:
  available() -> bool
  build() -> str                      (compile the .so with g++)
  NativeServeClient(unix_path=... | host=..., port=...)
      .open(name) -> handle
      .push(handle, float_wave)       (C-side transport conversion)
      .push_bytes(handle, bytes)      (raw transport bytes)
      .close(handle, flush=True)
      .ping()
      .events(timeout_ms) -> iterator of ("score", h, start, score,
                             flags) / ("closed", h) / ("error", h, message)
      .collect(handles) -> {h: [(start, score, flags), ...]}
        (flags: bit0 escalated by the cascade flagship, bit1 energy-
        gated — netserve.FLAG_ESCALATED / FLAG_GATED)
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "librtdsd_client.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


class _Event(ctypes.Structure):
    _fields_ = [("type", ctypes.c_int32),
                ("handle", ctypes.c_uint32),
                ("start_sample", ctypes.c_uint64),
                ("score", ctypes.c_float),
                ("flags", ctypes.c_uint8)]


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        P = ctypes.c_void_p
        lib.rtdsd_connect_unix.restype = P
        lib.rtdsd_connect_unix.argtypes = [ctypes.c_char_p,
                                           ctypes.c_char_p, ctypes.c_int]
        lib.rtdsd_connect_tcp.restype = P
        lib.rtdsd_connect_tcp.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                          ctypes.c_char_p, ctypes.c_int]
        lib.rtdsd_disconnect.argtypes = [P]
        for name in ("rtdsd_proto", "rtdsd_sample_rate",
                     "rtdsd_window_samples", "rtdsd_hop_samples",
                     "rtdsd_max_streams"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_uint32
            fn.argtypes = [P]
        lib.rtdsd_transport.restype = ctypes.c_int
        lib.rtdsd_transport.argtypes = [P]
        lib.rtdsd_last_error.restype = ctypes.c_char_p
        lib.rtdsd_last_error.argtypes = [P]
        lib.rtdsd_open.restype = ctypes.c_int64
        lib.rtdsd_open.argtypes = [P, ctypes.c_char_p]
        lib.rtdsd_push.restype = ctypes.c_int
        lib.rtdsd_push.argtypes = [P, ctypes.c_uint32,
                                   ctypes.POINTER(ctypes.c_float),
                                   ctypes.c_uint32]
        lib.rtdsd_push_bytes.restype = ctypes.c_int
        lib.rtdsd_push_bytes.argtypes = [P, ctypes.c_uint32,
                                         ctypes.c_void_p, ctypes.c_uint32]
        lib.rtdsd_close_stream.restype = ctypes.c_int
        lib.rtdsd_close_stream.argtypes = [P, ctypes.c_uint32, ctypes.c_int]
        lib.rtdsd_ping.restype = ctypes.c_int
        lib.rtdsd_ping.argtypes = [P]
        lib.rtdsd_next_event.restype = ctypes.c_int
        lib.rtdsd_next_event.argtypes = [P, ctypes.POINTER(_Event),
                                         ctypes.c_int]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def build() -> str:
    """Compile librtdsd_client.so (g++) and (re)load it."""
    global _tried, _lib
    from rtdsd_tpu.native.build import build_client

    path = build_client(verbose=False)
    _tried = False
    _lib = None
    if _load() is None:
        raise RuntimeError(f"built {path} but could not load it")
    return path


_TRANSPORT_NAMES = {0: "float32", 1: "int16", 2: "mulaw8"}


class NativeServeClient:
    """Blocking daemon client backed by the C library."""

    def __init__(self, *, unix_path: Optional[str] = None,
                 host: Optional[str] = None, port: Optional[int] = None):
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "librtdsd_client.so not built — run "
                "rtdsd_tpu.native.client.build()")
        self._lib = lib
        err = ctypes.create_string_buffer(256)
        if unix_path is not None:
            self._c = lib.rtdsd_connect_unix(unix_path.encode(), err, 256)
        else:
            self._c = lib.rtdsd_connect_tcp(host.encode(), int(port),
                                            err, 256)
        if not self._c:
            raise ConnectionError(err.value.decode() or "connect failed")
        self.proto = lib.rtdsd_proto(self._c)
        self.sample_rate = lib.rtdsd_sample_rate(self._c)
        self.duration = lib.rtdsd_window_samples(self._c)
        self.hop = lib.rtdsd_hop_samples(self._c)
        self.transport = _TRANSPORT_NAMES[lib.rtdsd_transport(self._c)]
        self.max_streams = lib.rtdsd_max_streams(self._c)

    # ------------------------------------------------------------------ api

    def _err(self) -> str:
        return self._lib.rtdsd_last_error(self._c).decode()

    def open(self, name: str = "") -> int:
        h = self._lib.rtdsd_open(self._c, name.encode())
        if h < 0:
            raise RuntimeError(self._err())
        return int(h)

    def push(self, handle: int, wave: np.ndarray) -> None:
        wave = np.ascontiguousarray(np.asarray(wave).reshape(-1),
                                    np.float32)
        rc = self._lib.rtdsd_push(
            self._c, handle,
            wave.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(wave))
        if rc != 0:
            raise RuntimeError(self._err())

    def push_bytes(self, handle: int, data: bytes) -> None:
        rc = self._lib.rtdsd_push_bytes(self._c, handle, data, len(data))
        if rc != 0:
            raise RuntimeError(self._err())

    def close(self, handle: int, flush: bool = True) -> None:
        rc = self._lib.rtdsd_close_stream(self._c, handle, int(flush))
        if rc != 0:
            raise RuntimeError(self._err())

    def ping(self) -> None:
        if self._lib.rtdsd_ping(self._c) != 0:
            raise RuntimeError(self._err())

    def events(self, timeout_ms: int = 60000):
        """Yield events until a read times out or the connection drops.

        ERROR frames are yielded as ("error", handle, message) — the
        consumer decides whether one bad stream is fatal."""
        ev = _Event()
        while True:
            rc = self._lib.rtdsd_next_event(self._c, ctypes.byref(ev),
                                            timeout_ms)
            if rc == 0:
                return  # timeout
            if rc < 0:
                raise ConnectionError(self._err())
            if ev.type == 1:
                yield ("score", ev.handle, int(ev.start_sample),
                       float(ev.score), int(ev.flags))
            elif ev.type == 2:
                yield ("closed", ev.handle)
            else:
                yield ("error", ev.handle, self._err())

    def collect(self, want_closed, timeout_ms: int = 60000):
        """Drain events until every handle in ``want_closed`` closed."""
        out = {h: [] for h in want_closed}
        pending = set(want_closed)
        for ev in self.events(timeout_ms):
            if ev[0] == "score" and ev[1] in out:
                out[ev[1]].append((ev[2], ev[3], ev[4]))
            elif ev[0] == "closed":
                pending.discard(ev[1])
                if not pending:
                    return out
            elif ev[0] == "error":
                raise RuntimeError(ev[2])
        raise TimeoutError("daemon events timed out before CLOSED")

    def close_socket(self) -> None:
        if self._c:
            self._lib.rtdsd_disconnect(self._c)
            self._c = None

    def __del__(self):
        try:
            self.close_socket()
        except Exception:
            pass
