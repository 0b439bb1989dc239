"""Host-side parameter materialization.

``model.init`` compiles an XLA program for every initializer, which is
expensive on remote-compile setups (and pointless when the values will be
overwritten by a converted checkpoint). ``init_variables_host`` traces the
init with ``jax.eval_shape`` (no compile, no device work) and fills the
shapes with numpy RNG draws on the host, matching init distribution scale
where it matters (fan-in scaled kernels, zeros for biases, ones for scales).
"""

from __future__ import annotations

import jax
import numpy as np


def init_variables_host(model, sample, seed: int = 0, **apply_kwargs):
    shapes = jax.eval_shape(
        lambda s: model.init(jax.random.key(0), s, **apply_kwargs), sample)
    rng = np.random.default_rng(seed)

    def fill(path, sds):
        name = str(getattr(path[-1], "key", "")) if path else ""
        shape, dtype = sds.shape, sds.dtype
        if name in ("bias", "mean"):
            return np.zeros(shape, dtype)
        if name in ("scale", "var"):
            return np.ones(shape, dtype)
        if name == "kernel" and len(shape) >= 2:
            fan_in = int(np.prod(shape[:-1]))
            std = (1.0 / max(fan_in, 1)) ** 0.5
            return (rng.standard_normal(shape) * std).astype(dtype)
        if np.issubdtype(dtype, np.integer):
            return np.zeros(shape, dtype)
        return (rng.standard_normal(shape) * 0.02).astype(dtype)

    return jax.tree_util.tree_map_with_path(fill, shapes)
