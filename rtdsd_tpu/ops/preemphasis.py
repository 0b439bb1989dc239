"""Batched pre-emphasis filter.

Reference: ``PreEmphasis`` (``/root/reference/data/preprocess.py:8-29``) —
reflect-pad by one sample then conv1d with fixed kernel ``[-alpha, 1]`` under
``no_grad``; train-time only (the scoring path never applies it,
``/root/reference/main.py:199-221``). Reflect padding prepends ``x[1]``, so
``y[0] = x[0] - alpha*x[1]`` and ``y[t] = x[t] - alpha*x[t-1]`` for t>=1.

On TPU a length-2 conv is pure bandwidth; we express it as a shift-and-
subtract that XLA fuses into neighbors. ``stop_gradient`` reproduces the
reference's ``no_grad`` (the filter is a fixed preprocessing step, not a
trainable layer).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pre_emphasis(x: jax.Array, alpha: float = 0.97,
                 enabled: bool = True) -> jax.Array:
    """y[t] = x[t] - alpha * x[t-1] with one-sample reflect pad.

    x: (..., T). Matches torch's ``F.pad(mode='reflect')`` + ``conv1d`` with
    kernel ``[-alpha, 1]`` exactly: the reflected sample is x[..., 1].
    """
    if not enabled:
        return x
    prev = jnp.concatenate([x[..., 1:2], x[..., :-1]], axis=-1)
    return jax.lax.stop_gradient(x - alpha * prev)
