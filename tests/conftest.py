"""Test harness: force an 8-device virtual CPU mesh.

Multi-chip behavior (DP/FSDP shardings, collectives) is tested on host CPU
via XLA's virtual device flag — the idiomatic JAX substitute for a real
multi-chip run (SURVEY.md §4). Must run before jax is imported anywhere.
"""

import os
import sys

# The image's sitecustomize registers a remote-TPU PJRT plugin in every
# python process and pins JAX_PLATFORMS=axon; under it every XLA compile is
# a network round-trip, and it cannot be undone after interpreter start. Run
# the test suite in a clean re-exec'd interpreter on the CPU backend instead.
_axon = ("axon" in os.environ.get("JAX_PLATFORMS", "")
         or ".axon_site" in os.environ.get("PYTHONPATH", ""))
if _axon and os.environ.get("RTDSD_TEST_REEXEC") != "1":
    env = dict(os.environ)
    env["RTDSD_TEST_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
          if p and ".axon_site" not in p]
    if pp:
        env["PYTHONPATH"] = os.pathsep.join(pp)
    else:
        env.pop("PYTHONPATH", None)

    # NOTE: pyproject.toml sets addopts="--capture=sys" so fds 1/2 are still
    # the real terminal here and survive the exec.
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
# This box may have very few cores; persist XLA compilations across test runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
# The persistent cache may hold CPU AOT entries compiled on a different
# machine (the bench host); XLA loads them fine but prints a full-page
# machine-feature warning per load. Silence the C++ log spam.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1024)
