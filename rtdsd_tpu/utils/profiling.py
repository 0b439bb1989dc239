"""Profiling / timing harness.

The reference has no tracing at all (SURVEY.md §5 — tqdm bars only). This
module provides the two tools a TPU deployment needs:

- :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace (XLA op timeline, HBM usage).
- :func:`measure` — wall-clock latency/throughput of a jitted callable with
  proper ``block_until_ready`` fencing, warm-up, and percentile stats. Used
  by ``bench.py`` and the latency tests.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Callable, Sequence

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context; view with TensorBoard."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class Timing:
    p50_ms: float
    p90_ms: float
    p99_ms: float
    mean_ms: float
    iters: int

    def per_item_ms(self, batch: int) -> "Timing":
        return Timing(self.p50_ms / batch, self.p90_ms / batch,
                      self.p99_ms / batch, self.mean_ms / batch, self.iters)

    def throughput(self, batch: int) -> float:
        return batch / (self.mean_ms / 1000.0)


def _block(tree):
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()


def measure(fn: Callable, args: Sequence, warmup: int = 3,
            iters: int = 20) -> Timing:
    """Time ``fn(*args)`` end-to-end (dispatch + device compute)."""
    for _ in range(warmup):
        _block(fn(*args))
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _block(fn(*args))
        samples.append((time.perf_counter() - t0) * 1000.0)
    arr = np.asarray(samples)
    return Timing(float(np.percentile(arr, 50)), float(np.percentile(arr, 90)),
                  float(np.percentile(arr, 99)), float(arr.mean()), iters)
