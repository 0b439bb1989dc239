"""Persistent XLA compilation cache setup.

The flagship's conv front-end takes minutes to compile cold on the TPU
toolchain; the persistent cache cuts re-compiles to seconds across
processes (measured 169 s -> 21 s). Call before the first jit executes."""

from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache_tpu")


def enable_persistent_compile_cache(path: str | None = None) -> str:
    cache_dir = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or _DEFAULT
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir)
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass
    return os.environ["JAX_COMPILATION_CACHE_DIR"]
