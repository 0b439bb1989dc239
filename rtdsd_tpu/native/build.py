"""Build the native decoder/loader shared library.

    python -m rtdsd_tpu.native.build

Uses g++ directly (no pybind11 — the Python side binds via ctypes)."""

from __future__ import annotations

import os
import subprocess
import sys

SRC = os.path.join(os.path.dirname(__file__), "flac_decoder.cpp")
OUT = os.path.join(os.path.dirname(__file__), "librtdsd_native.so")


def build(verbose: bool = True) -> str:
    cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
           SRC, "-o", OUT]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    path = build()
    print(f"built {path}")
    sys.exit(0)
