"""Multi-host utility behavior in the single-process degenerate case.

(`parallel/distributed.py` wraps jax multihost_utils; on one process the
contracts below are what callers rely on. Multi-process behavior runs only
on a real multi-host pod — the 8-virtual-device CPU mesh is still one
process.)
"""

import numpy as np

from rtdsd_tpu.parallel.distributed import (all_gather_objects,
                                            broadcast_object,
                                            maybe_initialize_distributed,
                                            shared_random_seed)


def test_all_gather_single_process_identity():
    obj = {"names": ["a", "b"], "arr": np.arange(3)}
    out = all_gather_objects(obj)
    assert len(out) == 1 and out[0] is obj


def test_broadcast_single_process_identity():
    obj = ("x", 1)
    assert broadcast_object(obj) is obj


def test_shared_random_seed_is_int_in_range():
    s = shared_random_seed()
    assert isinstance(s, int) and 0 <= s < 2 ** 31


def test_maybe_initialize_distributed_no_env(monkeypatch):
    for var in ("JAX_COORDINATOR", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert maybe_initialize_distributed() is False
