"""Batched loader with background decode and device prefetch.

Replaces torch ``DataLoader`` + ``DistributedSampler``
(``/root/reference/main.py:33-39,60-70``):

- deterministic epoch-seeded shuffling that actually reseeds per epoch
  (the reference never calls ``sampler.set_epoch`` — documented defect #5,
  SURVEY.md §7 — so it reshuffled identically every epoch; fixed here),
- per-process striping for multi-host data parallelism
  (``process_index::process_count``, DistributedSampler semantics),
- background decode overlapping device compute: with the native C++
  decoder, ``num_workers`` sizes a GIL-free decode thread pool inside
  each batch; on the pure-python fallback one producer thread decodes
  batches ahead serially (``num_workers`` then only sizes the queue —
  python decode holds the GIL, so more threads would not parallelize),
- optional device put with sharding for jit-consumption.

Yields ``(utt_ids: list[str], waves: (B, T) float32, labels: (B,) int32)``.
For eval, the last partial batch is padded up to the batch size and a
``valid`` count is attached so score writers can truncate.
"""

from __future__ import annotations

import collections
import queue
import threading
from typing import Iterator, List, NamedTuple, Optional

import numpy as np

from rtdsd_tpu.data.dataset import AudioDataset


class Batch(NamedTuple):
    utt_ids: List[str]
    waves: np.ndarray
    labels: np.ndarray
    valid: int


class DataLoader:
    def __init__(self, dataset: AudioDataset, batch_size: int,
                 shuffle: bool = False, drop_last: bool = False,
                 seed: int = 1024, num_workers: int = 2,
                 process_index: int = 0, process_count: int = 1,
                 pad_last: bool = True, use_native: bool = True,
                 on_decode_error: str = "raise"):
        if on_decode_error not in ("raise", "skip"):
            raise ValueError(f"on_decode_error must be 'raise' or 'skip', "
                             f"got {on_decode_error!r}")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_workers = max(num_workers, 1)
        self.process_index = process_index
        self.process_count = process_count
        self.pad_last = pad_last
        # "raise": any decode failure aborts the epoch (reference behavior —
        # torchaudio/librosa raise too). "skip": warn, substitute the failed
        # row with another valid row in the batch, keep going — a corrupt
        # file should not kill a multi-day training run.
        self.on_decode_error = on_decode_error
        self.epoch = 0
        # native C++ batch decode+crop (GIL-free thread pool) when built
        self._native = None
        if use_native:
            try:
                from rtdsd_tpu.native import flac as _native_mod

                if _native_mod.available():
                    self._native = _native_mod
            except Exception:
                self._native = None

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        # stripe across processes (DistributedSampler-style, padded)
        if self.process_count > 1:
            per = -(-n // self.process_count)
            padded = np.concatenate([idx, idx[: per * self.process_count - n]])
            idx = padded[self.process_index::self.process_count]
        return idx

    def __len__(self) -> int:
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _make_batch(self, batch_idx: np.ndarray, rng) -> Batch:
        if self._native is not None:
            return self._make_batch_native(batch_idx, rng)
        ids, waves, labels = [], [], []
        for i in batch_idx:
            try:
                uid, wave, label = self.dataset.get(int(i), rng)
            except Exception as e:
                if self.on_decode_error == "raise":
                    raise
                import warnings

                warnings.warn(f"skipping undecodable item "
                              f"{self.dataset.trials[int(i)].path}: {e}")
                continue
            ids.append(uid)
            waves.append(wave)
            labels.append(label)
        if not ids:
            raise RuntimeError("every item in the batch failed to decode")
        valid = len(ids)
        if valid < len(batch_idx) and not self.pad_last:
            # keep the static batch shape: duplicate the last good row in
            # place of skipped ones (labels follow, so loss stays sane)
            while len(ids) < len(batch_idx):
                ids.append(ids[-1])
                waves.append(waves[-1])
                labels.append(labels[-1])
        if self.pad_last and valid < self.batch_size:
            for _ in range(self.batch_size - valid):
                ids.append(ids[-1])
                waves.append(waves[-1])
                labels.append(labels[-1])
        return Batch(ids, np.stack(waves), np.asarray(labels, np.int32), valid)

    def _make_batch_native(self, batch_idx: np.ndarray, rng) -> Batch:
        trials = [self.dataset.trials[int(i)] for i in batch_idx]
        seed = (int(rng.integers(1, 2 ** 62))
                if self.dataset.is_random_start else 0)
        waves, failed_idx = self._native.load_batch_status(
            [t.path for t in trials], self.dataset.duration, seed=seed,
            threads=self.num_workers,
            expected_sr=self.dataset.sample_rate)
        if len(failed_idx):
            bad = [trials[int(i)].path for i in failed_idx]
            if self.on_decode_error == "raise":
                raise RuntimeError(
                    f"native decode failed for {len(bad)} file(s) in batch: "
                    f"{bad[:4]}{'...' if len(bad) > 4 else ''}")
            if len(failed_idx) == len(trials):
                raise RuntimeError("every item in the batch failed to decode")
            import warnings

            warnings.warn(f"skipping {len(bad)} undecodable item(s): "
                          f"{bad[:4]}{'...' if len(bad) > 4 else ''}")
            # drop the failed (zero-filled) rows — same semantics as the
            # pure-Python path: skipped rows are excluded from `valid`
            # (never scored under a wrong id), shape is restored by the
            # end-padding below
            bad_set = set(int(i) for i in failed_idx)
            keep = [i for i in range(len(trials)) if i not in bad_set]
            waves = waves[keep]
            trials = [trials[i] for i in keep]
        valid = len(trials)
        pad_to = self.batch_size if self.pad_last else len(batch_idx)
        if valid < pad_to:
            reps = pad_to - valid
            waves = np.concatenate([waves, np.repeat(waves[-1:], reps,
                                                     axis=0)])
            trials = trials + [trials[-1]] * reps
        aug = getattr(self.dataset, "host_augment", None)
        if aug is not None:
            waves = np.stack([aug(w, rng) for w in waves])
        return Batch([t.utt_id for t in trials], waves,
                     np.asarray([t.label for t in trials], np.int32), valid)

    def __iter__(self) -> Iterator[Batch]:
        idx = self._indices()
        nb = len(self)
        starts = [b * self.batch_size for b in range(nb)]
        rng = np.random.default_rng((self.seed, self.epoch, self.process_index))

        if self.num_workers <= 1:
            for s in starts:
                yield self._make_batch(idx[s:s + self.batch_size], rng)
            return

        # Pipeline: worker threads decode batches in order; bounded queue.
        q: "queue.Queue" = queue.Queue(maxsize=self.num_workers * 2)
        stop = threading.Event()

        def put(item) -> bool:
            # bounded put that re-checks stop: a consumer that abandons
            # iteration mid-epoch must not leave the producer parked
            # forever inside q.put on a full queue
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for s in starts:
                    if stop.is_set():
                        return
                    if not put(self._make_batch(idx[s:s + self.batch_size],
                                                rng)):
                        return
            except BaseException as e:  # surface decode errors to consumer
                put(e)
            finally:
                put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


def device_prefetch(iterator, size: int = 2, sharding=None):
    """Move batches to device ahead of compute.

    With a ``NamedSharding``, waves/labels land pre-sharded across the mesh
    data axis (jit then consumes them with no layout transfer). Under
    multi-process SPMD the sharding spans other hosts' devices: each
    process's loader stripe becomes its slice of ONE global array
    (``parallel/distributed.py::make_global_array``), so the same jitted
    step runs unchanged on a pod.
    ``size <= 0`` degrades to depth-1 (prefetch disabled, batches still
    flow — a zero fill would silently yield nothing).
    """
    import jax

    from rtdsd_tpu.parallel.distributed import make_global_array

    size = max(int(size), 1)
    buf: "queue.Queue" = queue.Queue()
    it = iter(iterator)

    def put_next() -> bool:
        try:
            b = next(it)
        except StopIteration:
            return False
        waves, labels = b.waves, b.labels
        if sharding is not None:
            waves = make_global_array(waves, sharding)
            labels = make_global_array(labels, sharding)
        else:
            waves = jax.device_put(waves)
            labels = jax.device_put(labels)
        buf.put(Batch(b.utt_ids, waves, labels, b.valid))
        return True

    alive = True
    for _ in range(size):
        alive = put_next() and alive
        if not alive:
            break
    while not buf.empty():
        nxt = buf.get()
        put_next()
        yield nxt


def readback_late(entries, depth: int = 3):
    """Yield dispatched-work entries ``depth`` items late.

    The dispatch-ahead/read-late companion to :func:`device_prefetch` for
    the OUTPUT side: the caller's generator dispatches a device program per
    entry and this keeps ``depth`` results in flight before the caller
    reads any back, so per-item device latency + link RTT (~30 ms per
    dispatch on a remote relay) overlap with subsequent dispatches instead
    of serializing the loop. Used by the scoring/eval/streaming loops.
    """
    pending = collections.deque()
    for e in entries:
        pending.append(e)
        if len(pending) > depth:
            yield pending.popleft()
    while pending:
        yield pending.popleft()
