"""Multi-host (DCN) utilities.

The reference is single-node only (``MASTER_ADDR`` hardcoded to localhost,
``/root/reference/main.py:45``; SURVEY.md §2.2). Multi-host here is the
standard JAX recipe: ``jax.distributed.initialize`` for rendezvous (one
process per host, all devices global), per-process data striping in the
loader, and host-side object collectives via ``multihost_utils`` — the
functional replacement for the reference's gloo object-gather
(``ddp_util.py:131-193``).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def maybe_initialize_distributed(coordinator: Optional[str] = None,
                                 num_processes: Optional[int] = None,
                                 process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running multi-host.

    Reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID when
    args are not given (also honors the standard TPU pod metadata, which
    ``jax.distributed.initialize()`` discovers on its own). No-op when
    single-host. Returns True if distributed mode is active.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None and os.environ.get("TPU_WORKER_HOSTNAMES") in (
            None, "", "localhost"):
        return False
    try:
        kwargs = {}
        if coordinator:
            kwargs["coordinator_address"] = coordinator
        if num_processes or os.environ.get("JAX_NUM_PROCESSES"):
            kwargs["num_processes"] = int(
                num_processes or os.environ["JAX_NUM_PROCESSES"])
        if process_id is not None or os.environ.get("JAX_PROCESS_ID"):
            kwargs["process_id"] = int(
                process_id if process_id is not None
                else os.environ["JAX_PROCESS_ID"])
        jax.distributed.initialize(**kwargs)
        return True
    except Exception:
        return jax.process_count() > 1


def all_gather_objects(obj: Any) -> list:
    """Gather an arbitrary picklable object from every process (the gloo
    object-all_gather equivalent, ddp_util.py:158-193)."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    return list(multihost_utils.process_allgather(obj, tiled=False))


def broadcast_object(obj: Any, root: int = 0) -> Any:
    """Broadcast a host object from the root process (shared_random_seed
    equivalent, ddp_util.py)."""
    if jax.process_count() == 1:
        return obj
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(
        obj, is_source=jax.process_index() == root)


def shared_random_seed() -> int:
    """A random seed agreed across all processes (ref ddp_util.py
    shared_random_seed)."""
    import numpy as np

    seed = np.random.randint(0, 2 ** 31)
    return int(broadcast_object(np.asarray(seed)))
