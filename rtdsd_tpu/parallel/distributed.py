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

import logging
import os
from typing import Any, Optional

import jax

_log = logging.getLogger(__name__)


def maybe_initialize_distributed(coordinator: Optional[str] = None,
                                 num_processes: Optional[int] = None,
                                 process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running multi-host.

    Reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID when
    args are not given (also honors the standard TPU pod metadata, which
    ``jax.distributed.initialize()`` discovers on its own). No-op when
    single-host. Returns True if distributed mode is active.

    When the caller explicitly requested distributed mode (a coordinator
    address via arg or env), a rendezvous failure RAISES — silently
    degrading to single-host training on a pod would train on 1/N of the
    data at 1/N throughput with no error anywhere.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None and os.environ.get("TPU_WORKER_HOSTNAMES") in (
            None, "", "localhost"):
        return False
    explicit = coordinator is not None
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
        # Warm the host-collective clique NOW, while every process sits
        # at the same point: Gloo contexts are created lazily at the
        # first collective with a ~30 s peer-connect budget, and a peer
        # stuck in a long XLA compile mid-run can miss it (observed
        # flaking under CPU contention, r5). A tiny gather here builds
        # the rendezvous machinery when skew is minimal.
        try:
            from jax.experimental import multihost_utils
            import numpy as _np

            multihost_utils.process_allgather(_np.zeros(1, _np.uint8),
                                              tiled=False)
        except Exception as e:  # warm-up only — never fail init for it
            _log.warning("host-collective warmup failed: %s", e)
        return True
    except Exception as e:
        if explicit:
            _log.error("jax.distributed.initialize failed for explicitly "
                       "requested coordinator %r: %s", coordinator, e)
            raise
        # auto-discovery path (TPU pod metadata): initialize() may refuse
        # when already initialized or when discovery is incomplete; fall
        # back to whatever the runtime already knows, but say so.
        _log.warning("jax.distributed auto-initialization failed (%s); "
                     "process_count=%d", e, jax.process_count())
        return jax.process_count() > 1


def barrier() -> None:
    """Align every process (cheap: reuses the rendezvous warmup gather's
    compiled program and Gloo context, so it does not itself pay a
    context-init budget). Call before the first execution of a NEW
    collective program (the first jitted step, a new gather shape):
    Gloo builds a context per program with a ~30 s peer-connect budget,
    and a peer skewed by a cold compile misses it (observed r5 — both
    the 2-process test and the dryrun leg flaked exactly there)."""
    if jax.process_count() == 1:
        return
    import numpy as np
    from jax.experimental import multihost_utils

    multihost_utils.process_allgather(np.zeros(1, np.uint8), tiled=False)


def make_global_array(local: Any, sharding) -> jax.Array:
    """Assemble a global batch-sharded array from per-process local rows.

    Multi-process SPMD feeding: each process holds only its loader stripe
    (``data/loader.py`` ``process_index::process_count`` striping — the
    DistributedSampler equivalent, ``/root/reference/main.py:33-39``); the
    jitted step consumes ONE global array spanning all hosts' devices. The
    global batch is the process-order concatenation of the local batches
    (process p owns global rows ``[p*B_local, (p+1)*B_local)``).
    Single-process: a plain sharded device_put.
    """
    if jax.process_count() == 1:
        return jax.device_put(local, sharding)
    return jax.make_array_from_process_local_data(sharding, local)


def host_local_rows(arr) -> "np.ndarray":
    """Read back THIS process's rows of a batch-sharded global array.

    The inverse of :func:`make_global_array` for program outputs: a
    multi-process global array is not fully addressable, so ``np.asarray``
    raises; each process instead reads its own addressable shards in
    row order — exactly the rows matching its loader stripe's utt_ids.
    """
    import numpy as np

    if jax.process_count() == 1:
        return np.asarray(arr)
    # one shard per distinct row range (a model-axis replica holds the
    # same rows on several devices), in row order
    by_start = {}
    for s in arr.addressable_shards:
        by_start.setdefault(s.index[0].start or 0, s)
    return np.concatenate([np.asarray(by_start[k].data)
                           for k in sorted(by_start)])


def all_gather_objects(obj: Any) -> list:
    """Gather an arbitrary picklable object from every process (the gloo
    object-all_gather equivalent, ddp_util.py:158-193).

    ``multihost_utils.process_allgather`` gathers ARRAY pytrees leaf-wise;
    arbitrary objects (mixed dicts, strings, ragged lists) go through the
    classic pickle + length-padded byte-gather, exactly like torch's
    ``all_gather_object``: gather lengths, pad to the max, gather rows,
    unpickle each row at its true length.
    """
    if jax.process_count() == 1:
        return [obj]
    import pickle

    import numpy as np
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    lens = np.asarray(multihost_utils.process_allgather(
        np.asarray(len(payload), np.int64), tiled=False)).ravel()
    # bucket the padded size: every distinct gather shape compiles a new
    # XLA program AND spins up a new Gloo context (30 s peer budget) —
    # power-of-two buckets make repeat gathers reuse both
    width = max(int(lens.max()), 1)
    bucket = 4096
    while bucket < width:
        bucket *= 2
    padded = np.zeros(bucket, np.uint8)
    padded[: len(payload)] = payload
    rows = np.asarray(multihost_utils.process_allgather(padded, tiled=False))
    return [pickle.loads(rows[i, : int(lens[i])].tobytes())
            for i in range(jax.process_count())]


def broadcast_object(obj: Any, root: int = 0) -> Any:
    """Broadcast a host object from the root process (shared_random_seed
    equivalent, ddp_util.py). Same pickle framing as
    :func:`all_gather_objects` (length first, then the payload) so any
    picklable object works, not just same-shape arrays."""
    if jax.process_count() == 1:
        return obj
    import pickle

    import numpy as np
    from jax.experimental import multihost_utils

    is_src = jax.process_index() == root
    payload = (np.frombuffer(pickle.dumps(obj), np.uint8) if is_src
               else np.zeros(0, np.uint8))
    n = int(multihost_utils.broadcast_one_to_all(
        np.asarray(len(payload), np.int64), is_source=is_src))
    bucket = 4096  # same shape-bucketing rationale as all_gather_objects
    while bucket < max(n, 1):
        bucket *= 2
    buf = np.zeros(bucket, np.uint8)
    buf[: len(payload)] = payload[:n]
    out = np.asarray(multihost_utils.broadcast_one_to_all(
        buf, is_source=is_src))
    return pickle.loads(out.tobytes()[:n])


def shared_random_seed() -> int:
    """A random seed agreed across all processes (ref ddp_util.py
    shared_random_seed)."""
    import numpy as np

    seed = np.random.randint(0, 2 ** 31)
    return int(broadcast_object(np.asarray(seed)))
