"""Seeding and PRNG-key threading.

Replaces the reference's global ``set_seed`` (``/root/reference/utils.py:45-51``,
python/numpy/torch + cudnn-deterministic) with JAX's functional PRNG: one root
key per experiment, split per purpose/step. Numpy is still seeded for the
host-side data pipeline (shuffles, random-start crops).
"""

from __future__ import annotations

import random as _random

import jax
import numpy as np


def set_seed(seed: int) -> jax.Array:
    """Seed host-side RNGs and return the root JAX key."""
    _random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)


class RngStream:
    """Stateful-looking wrapper over functional key splitting.

    Host-side convenience for the epoch driver: ``stream.next()`` returns a
    fresh key each call; inside jitted code keys are threaded explicitly.
    """

    def __init__(self, key: jax.Array):
        self._key = key

    def next(self, n: int | None = None):
        if n is None:
            self._key, sub = jax.random.split(self._key)
            return sub
        self._key, *subs = jax.random.split(self._key, n + 1)
        return list(subs)

    def fold_in(self, data: int) -> jax.Array:
        return jax.random.fold_in(self._key, data)
