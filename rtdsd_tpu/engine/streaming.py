"""Streaming / long-audio scoring.

The reference handles long audio by cropping to a fixed window — never by
scaling sequence length (SURVEY.md §5, long-context row: "longer audio is
handled by cropping"). The real-time-capable equivalent is a *chunked
sliding-window scorer*: fixed-size windows (static shapes, one compiled
program) slide over arbitrarily long audio, batched onto the device, with
per-window CM scores aggregated to an utterance score.

This is the deployment path for "real-time" detection: windows of
``duration`` samples with ``hop`` stride are scored as they arrive; static
window shape keeps XLA happy and latency flat.
"""

from __future__ import annotations

from typing import Callable, Literal, Optional

import jax
import numpy as np

Aggregate = Literal["mean", "min", "max", "median"]


def frame_starts(t: int, duration: int, hop: int) -> list:
    """Window start samples for a length-t wave: hop-strided, plus a final
    tail window at ``t - duration`` when the stride doesn't reach the end.
    A short wave gets the single window [0]."""
    if t <= duration:
        return [0]
    starts = list(range(0, t - duration + 1, hop))
    if starts[-1] + duration < t:  # cover the tail
        starts.append(t - duration)
    return starts


def frame_windows(wave: np.ndarray, duration: int, hop: int) -> np.ndarray:
    """Slice a (T,) wave into (N, duration) windows at :func:`frame_starts`;
    a short input is repeat-tiled like the dataset duration-fit
    (dataset.py adjust_duration) into exactly one window."""
    wave = np.asarray(wave, np.float32).squeeze()
    t = wave.shape[-1]
    if t <= duration:
        reps = -(-duration // max(t, 1))
        return np.tile(wave, reps)[None, :duration]
    return np.stack([wave[s:s + duration]
                     for s in frame_starts(t, duration, hop)])


class StreamingScorer:
    """Scores arbitrarily-long audio with a fixed-window jitted model.

    ``score_step``: (params, batch_stats, waves (B, duration)) -> (B,) CM
    scores (bonafide logits) — e.g. ``make_score_step(model)``.
    ``batch_size`` fixes the compiled batch; windows are padded up to it.
    """

    def __init__(self, score_step: Callable, params, batch_stats,
                 duration: int, hop: Optional[int] = None,
                 batch_size: int = 8, aggregate: Aggregate = "mean"):
        self.score_step = score_step
        self.params = params
        self.batch_stats = batch_stats
        self.duration = duration
        self.hop = hop or duration // 2
        self.batch_size = batch_size
        self.aggregate = aggregate

    def window_scores(self, wave: np.ndarray) -> np.ndarray:
        windows = frame_windows(wave, self.duration, self.hop)
        n = windows.shape[0]
        scores = []
        for s in range(0, n, self.batch_size):
            chunk = windows[s:s + self.batch_size]
            valid = chunk.shape[0]
            if valid < self.batch_size:  # pad to the compiled batch shape
                pad = np.repeat(chunk[-1:], self.batch_size - valid, axis=0)
                chunk = np.concatenate([chunk, pad])
            out = np.asarray(self.score_step(self.params, self.batch_stats,
                                             jax.numpy.asarray(chunk)))
            scores.append(out[:valid])
        return np.concatenate(scores)

    def aggregate_scores(self, ws: np.ndarray) -> float:
        """Window scores -> utterance CM score per the configured policy."""
        if self.aggregate == "mean":
            return float(ws.mean())
        if self.aggregate == "min":
            return float(ws.min())
        if self.aggregate == "max":
            return float(ws.max())
        if self.aggregate == "median":
            return float(np.median(ws))
        raise ValueError(f"unknown aggregate {self.aggregate!r}")

    def score(self, wave: np.ndarray) -> float:
        """Utterance-level CM score from aggregated window scores."""
        return self.aggregate_scores(self.window_scores(wave))
