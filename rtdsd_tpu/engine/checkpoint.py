"""Checkpointing: full train state (params + batch stats + optimizer + step).

The reference saves weights-only ``state_dict`` checkpoints named
``best_LA_epoch{e}_{loss}_{acc}.pt`` on rank 0 when dev loss improves and
accuracy > 95 (``/root/reference/main.py:157-183``), so "resume" loses
optimizer state (SURVEY.md §5). Here a checkpoint is the complete pytree, so
resume is exact; a weights-only export also exists for deployment.

Format: a directory with ``state.msgpack`` (flax serialization — fast,
dependency-free, host-portable) and ``meta.json``. Orbax async saving is
used when available for large states (non-blocking on the train loop).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization

from rtdsd_tpu.engine.steps import TrainState


def save_checkpoint(path: str, state: TrainState,
                    meta: Optional[dict] = None) -> None:
    os.makedirs(path, exist_ok=True)
    blob = serialization.to_bytes({
        "step": state.step, "params": state.params,
        "batch_stats": state.batch_stats, "opt_state": state.opt_state})
    tmp = os.path.join(path, "state.msgpack.tmp")
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, os.path.join(path, "state.msgpack"))
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta or {}, f, indent=2)


def restore_checkpoint(path: str, target_state: TrainState) -> TrainState:
    """Restore into the structure of ``target_state`` (shapes must match)."""
    with open(os.path.join(path, "state.msgpack"), "rb") as f:
        blob = f.read()
    tree = serialization.from_bytes({
        "step": target_state.step, "params": target_state.params,
        "batch_stats": target_state.batch_stats,
        "opt_state": target_state.opt_state}, blob)
    return target_state.replace(**tree)


_ASYNC_CKPT = None


def save_checkpoint_async(path: str, state: TrainState,
                          meta: Optional[dict] = None):
    """Non-blocking save via orbax's AsyncCheckpointer (the training loop
    continues while the state streams to disk). Falls back to the sync
    msgpack writer when orbax is unavailable. Returns a handle with
    ``wait_until_finished()`` (no-op object on the fallback path)."""
    global _ASYNC_CKPT
    tree = {"step": state.step, "params": state.params,
            "batch_stats": state.batch_stats, "opt_state": state.opt_state}
    try:
        import orbax.checkpoint as ocp

        if _ASYNC_CKPT is None:
            _ASYNC_CKPT = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        else:
            # a prior in-flight save must commit before we move dirs around
            _ASYNC_CKPT.wait_until_finished()
        target = os.path.abspath(os.path.join(path, "orbax"))
        prev = target + ".prev"
        import shutil

        # Keep the last committed checkpoint as .prev until the new save
        # commits (orbax renames its tmp dir into `target` atomically on
        # commit): a crash mid-save leaves .prev restorable instead of
        # nothing. .prev is reclaimed on the next call.
        if os.path.exists(prev):
            shutil.rmtree(prev)
        if os.path.exists(target):
            os.rename(target, prev)
        os.makedirs(path, exist_ok=True)
        _ASYNC_CKPT.save(target, tree)
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta or {}, f, indent=2)
        return _ASYNC_CKPT
    except Exception as e:
        import sys

        print(f"warning: async checkpoint save failed ({e!r}); "
              f"falling back to sync msgpack", file=sys.stderr)
        save_checkpoint(path, state, meta)
        # The sync msgpack is now the NEWEST complete state; stale orbax
        # dirs left behind (possibly from the failed attempt above) would
        # shadow it in restore_checkpoint_any and silently resume an older
        # epoch — remove them. If the exception struck AFTER
        # _ASYNC_CKPT.save() started (e.g. the meta.json write failed),
        # orbax's background commit could re-materialize `orbax` after our
        # rmtree — settle the in-flight save first.
        if _ASYNC_CKPT is not None:
            try:
                _ASYNC_CKPT.wait_until_finished()
            except Exception:
                pass  # the failed save's own error; dirs cleaned below
        import shutil

        for stale in (os.path.join(path, "orbax"),
                      os.path.join(path, "orbax.prev")):
            if os.path.exists(stale):
                shutil.rmtree(stale, ignore_errors=True)

        class _Done:
            def wait_until_finished(self):
                return None

        return _Done()


def restore_checkpoint_any(path: str, target_state: TrainState) -> TrainState:
    """Restore either format: orbax dir (falling back to the .prev kept
    during an interrupted async save) or msgpack."""
    orbax_dir = os.path.join(path, "orbax")
    if not os.path.exists(orbax_dir) and os.path.exists(orbax_dir + ".prev"):
        orbax_dir = orbax_dir + ".prev"
    if os.path.exists(orbax_dir):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        tree = ckptr.restore(
            os.path.abspath(orbax_dir),
            {"step": target_state.step, "params": target_state.params,
             "batch_stats": target_state.batch_stats,
             "opt_state": target_state.opt_state})
        return target_state.replace(**tree)
    return restore_checkpoint(path, target_state)


def load_meta(path: str) -> dict:
    try:
        with open(os.path.join(path, "meta.json")) as f:
            return json.load(f)
    except FileNotFoundError:
        return {}


def save_params_only(path: str, params: Any, batch_stats: Any = None) -> None:
    """Weights-only export (deployment / reference-style ckpt equivalent)."""
    os.makedirs(path, exist_ok=True)
    blob = serialization.to_bytes({"params": params,
                                   "batch_stats": batch_stats or {}})
    with open(os.path.join(path, "weights.msgpack"), "wb") as f:
        f.write(blob)


def load_params_only(path: str, target_params: Any,
                     target_batch_stats: Any = None):
    with open(os.path.join(path, "weights.msgpack"), "rb") as f:
        blob = f.read()
    tree = serialization.from_bytes(
        {"params": target_params, "batch_stats": target_batch_stats or {}},
        blob)
    return tree["params"], tree["batch_stats"]
