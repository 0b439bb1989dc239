"""Device mesh + sharding rules.

The reference's only parallelism is single-node data-parallel DDP over NCCL
(``/root/reference/main.py:42-90``; SURVEY.md §2.2). The TPU-native
equivalent is SPMD under one jit: a ``Mesh`` with axes ``("data", "model")``,
batches sharded over ``data``, and gradient all-reduce emitted automatically
by XLA over ICI — no explicit collectives, no process groups, no port
scanning (SURVEY.md §2.3).

Beyond DDP parity this module adds what a TPU deployment actually needs:

- ``mode="dp"``   — replicate params, shard batch (DDP equivalent).
- ``mode="fsdp"`` — additionally shard large param leaves over ``data``
  (ZeRO-3-style; XLA inserts all-gathers at use and reduce-scatters on
  grads).
- ``mode="tp"``   — Megatron-style tensor parallelism over ``model`` for the
  XLSR transformer stack: q/k/v and fc1 kernels column-sharded, out_proj and
  fc2 row-sharded, so each pair needs a single psum that XLA places on ICI.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
the same code spans hosts (``jax.devices()`` is global); host-local data
feeding uses process striping in :mod:`rtdsd_tpu.data.loader`.
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1,
              devices: Optional[list] = None) -> Mesh:
    """Create a ("data", "model") mesh. data=-1 uses all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} exceeds {n} devices")
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Tensor-parallel rules for the scanned XLSR transformer stack. Kernels are
# stacked (L, in, out); "col" shards the output dim, "row" the input dim.
_TP_RULES = [
    (r"layers/layer/(q_proj|k_proj|v_proj|fc1)/kernel", P(None, None, "model")),
    (r"layers/layer/(q_proj|k_proj|v_proj|fc1)/bias", P(None, "model")),
    (r"layers/layer/(out_proj|fc2)/kernel", P(None, "model", None)),
]


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def _fsdp_spec(leaf, min_size: int = 2 ** 16) -> P:
    """Shard the largest axis of big leaves over 'data' (must divide evenly
    at lowering time; jax tolerates uneven via padding, we only pick exact)."""
    shape = getattr(leaf, "shape", ())
    if len(shape) < 2 or int(np.prod(shape)) < min_size:
        return P()
    axis = int(np.argmax(shape))
    spec = [None] * len(shape)
    spec[axis] = "data"
    return P(*spec)


def sharding_for_tree(tree, mesh: Mesh, mode: str = "dp"):
    """Build a NamedSharding pytree for params/opt-state leaves.

    mode: "dp" (replicated), "fsdp" (big leaves sharded over data),
    "tp" (transformer rules over model + replicate rest),
    "fsdp+tp" (both).
    """
    if mode not in ("dp", "fsdp", "tp", "fsdp+tp"):
        raise ValueError(f"unknown parallel mode {mode!r}")

    data_ax = mesh.shape.get("data", 1)
    model_ax = mesh.shape.get("model", 1)

    def spec_for(path, leaf) -> P:
        ps = _path_str(path)
        if "tp" in mode and model_ax > 1:
            for pat, spec in _TP_RULES:
                if re.search(pat, ps):
                    # verify divisibility of the sharded dims
                    ok = all(s is None or leaf.shape[i] % model_ax == 0
                             for i, s in enumerate(spec))
                    if ok:
                        return spec
        if "fsdp" in mode and data_ax > 1:
            spec = _fsdp_spec(leaf)
            if any(s is not None for s in spec):
                axis = [i for i, s in enumerate(spec) if s is not None][0]
                if leaf.shape[axis] % data_ax == 0:
                    return spec
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for(path, leaf)), tree)


def shard_params(params, mesh: Mesh, mode: str = "dp"):
    """device_put a param tree according to the mode's sharding rules."""
    shardings = sharding_for_tree(params, mesh, mode)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
