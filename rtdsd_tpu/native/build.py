"""Build the native decoder/loader shared library.

    python -m rtdsd_tpu.native.build

Uses g++ directly (no pybind11 — the Python side binds via ctypes)."""

from __future__ import annotations

import os
import subprocess
import sys

_HERE = os.path.dirname(__file__)
SRC = os.path.join(_HERE, "flac_decoder.cpp")
OUT = os.path.join(_HERE, "librtdsd_native.so")
CLIENT_SRC = os.path.join(_HERE, "serve_client.cpp")
CLIENT_OUT = os.path.join(_HERE, "librtdsd_client.so")
FEED_OUT = os.path.join(_HERE, "rtdsd_feed")


def build(verbose: bool = True) -> str:
    cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
           SRC, "-o", OUT]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return OUT


def build_client(verbose: bool = True) -> str:
    """Daemon wire-protocol client library (C ABI, no dependencies)."""
    cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC",
           CLIENT_SRC, "-o", CLIENT_OUT]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return CLIENT_OUT


def build_feeder(verbose: bool = True) -> str:
    """Standalone WAV feeder binary (streams a file, prints scores)."""
    cmd = ["g++", "-O2", "-std=c++17", "-DRTDSD_FEED_MAIN",
           CLIENT_SRC, "-o", FEED_OUT]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return FEED_OUT


if __name__ == "__main__":
    targets = sys.argv[1:] or ["decoder", "client", "feeder"]
    for t in targets:
        path = {"decoder": build, "client": build_client,
                "feeder": build_feeder}[t]()
        print(f"built {path}")
    sys.exit(0)
