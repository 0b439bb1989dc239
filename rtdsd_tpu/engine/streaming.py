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
        from rtdsd_tpu.data.loader import readback_late

        def dispatch():
            for s in range(0, n, self.batch_size):
                chunk = windows[s:s + self.batch_size]
                valid = chunk.shape[0]
                if valid < self.batch_size:  # pad to the compiled shape
                    pad = np.repeat(chunk[-1:], self.batch_size - valid,
                                    axis=0)
                    chunk = np.concatenate([chunk, pad])
                yield (self.score_step(self.params, self.batch_stats,
                                       jax.numpy.asarray(chunk)), valid)

        # read results late so device latency + link RTT overlap with
        # subsequent dispatches
        scores = [np.asarray(out)[:v] for out, v in readback_late(dispatch())]
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


def receptive_field(conv_layers) -> int:
    """Conv-stack receptive field in samples (XLSR: 400). Delegates to the
    single implementation in models.wav2vec2."""
    from rtdsd_tpu.models.wav2vec2 import conv_receptive_field

    return conv_receptive_field(conv_layers)


class IncrementalStreamingScorer:
    """Streaming scorer that computes the conv front-end ONCE per audio.

    At hop = window/2, :class:`StreamingScorer` recomputes half of every
    window's conv features. The conv stack is strictly stride-aligned
    (total stride 320 for XLSR, receptive field 400, VALID padding, and the
    layer_norm extractor normalizes per frame), so the conv features of any
    window starting on the 320-sample grid are an exact slice of the
    full-audio conv features. This scorer:

    1. runs the conv extractor over the whole wave in fixed-size segments
       (``seg_frames`` frames each — static shapes, one compiled program,
       segment hop = seg_frames * stride so frames line up exactly);
    2. slices cached frames per window (window starts snapped DOWN to the
       frame grid — at 16 kHz that moves a window by < 20 ms) and batches
       them through the transformer + back-end.

    Conv FLOPs drop from (window/hop)x realtime to ~1x realtime; scores are
    numerically identical to :class:`StreamingScorer` for grid-aligned
    window starts (tests/test_streaming.py).

    ``model`` must accept ``conv_feats=`` (models/zoo.py);
    ``cfg`` is its ``Wav2Vec2Config``. Requires ``extractor_mode ==
    'layer_norm'`` (group_norm couples frames across the whole window).
    """

    def __init__(self, model, params, batch_stats, cfg,
                 duration: int, hop: Optional[int] = None,
                 batch_size: int = 8, aggregate: Aggregate = "mean",
                 seg_frames: int = 256):
        if cfg.extractor_mode != "layer_norm":
            raise ValueError(
                "incremental streaming requires the layer_norm extractor "
                "(group_norm normalizes across the full window)")
        import jax.numpy as jnp

        from rtdsd_tpu.models.wav2vec2 import ConvFeatureExtractor

        self.params = params
        self.batch_stats = batch_stats
        self.duration = duration
        self.hop = hop or duration // 2
        self.batch_size = batch_size
        self.aggregate = aggregate
        self.stride = cfg.total_stride
        if self.hop < self.stride:
            # starts snap to the conv frame grid; a sub-frame hop would
            # silently dedup windows away — make the floor explicit
            raise ValueError(
                f"hop {self.hop} is below the conv frame stride "
                f"{self.stride} ({self.stride / 16000 * 1000:.0f} ms at "
                f"16 kHz) — the incremental scorer cannot produce "
                f"sub-frame window offsets; use the naive scorer")
        from rtdsd_tpu.models.wav2vec2 import conv_segment_geometry

        self.rf = cfg.conv_receptive_field
        self.win_frames = cfg.num_frames(duration)
        self.seg_frames = seg_frames
        self.seg_samples, _, _ = conv_segment_geometry(cfg, seg_frames, 1)
        self._seg_geometry = lambda n: conv_segment_geometry(
            cfg, seg_frames, n)
        self._num_frames = cfg.num_frames

        conv = ConvFeatureExtractor(cfg, model.dtype)
        self._conv_params = params["ssl_model"]["feature_extractor"]
        # One batched dispatch over all segments; features stay ON DEVICE —
        # per-segment B=1 calls + host readback would pay the dispatch
        # latency (and, through the axon relay, ~30 ms) per segment.
        self._conv_step = jax.jit(lambda p, segs: conv.apply(
            {"params": p}, segs).reshape(-1, conv.cfg.conv_layers[-1][0]))

        def feats_step(p, stats, feats_flat, idx):
            variables = {"params": p}
            if stats:
                variables["batch_stats"] = stats
            windows = feats_flat[idx]  # (B, win_frames, C) device gather
            logits = model.apply(variables, None, train=False,
                                 conv_feats=windows)
            return logits[:, 1]

        self._score_feats = jax.jit(feats_step)

    # ------------------------------------------------------------ internals

    def conv_features(self, wave: np.ndarray):
        """(T,) wave -> (>= num_frames, C) conv features, ON DEVICE.

        Segments are strided host views batched into one (S, seg_samples)
        dispatch; rows beyond ``num_frames(T)`` are tail-padding garbage the
        window gather never indexes."""
        t = wave.shape[-1]
        total = self._num_frames(t)
        n_segs = -(-total // self.seg_frames)
        # bucket the segment count so audio of similar lengths reuses the
        # compiled programs (both the conv step and the gather+score step
        # specialize on the feature-array length)
        n_segs = -(-n_segs // 4) * 4
        _, seg_hop, pad_to = self._seg_geometry(n_segs)
        if t < pad_to:
            wave = np.pad(wave, (0, pad_to - t))
        segs = np.stack([wave[i * seg_hop: i * seg_hop + self.seg_samples]
                         for i in range(n_segs)])
        return self._conv_step(self._conv_params, segs), total

    def bucket_key(self, t: int) -> int:
        """Segment-count bucket a length-t wave compiles under — lets a
        caller warm each bucket once before timing (cli/stream.py)."""
        total = self._num_frames(max(t, self.duration))
        n_segs = -(-total // self.seg_frames)
        return -(-n_segs // 4) * 4

    def _grid_starts(self, t: int):
        starts = [s - (s % self.stride)  # snap DOWN to the conv frame grid
                  for s in frame_starts(t, self.duration, self.hop)]
        return sorted(dict.fromkeys(starts))  # dedup, keep order

    # ------------------------------------------------------------------ api

    def window_scores(self, wave: np.ndarray) -> np.ndarray:
        wave = np.asarray(wave, np.float32).squeeze()
        t = wave.shape[-1]
        if t <= self.duration:  # short input: tile like the dataset fit
            reps = -(-self.duration // max(t, 1))
            wave = np.tile(wave, reps)[: self.duration]
            t = self.duration
        feats_flat, _total = self.conv_features(wave)
        starts = self._grid_starts(t)
        base = np.arange(self.win_frames, dtype=np.int32)
        idx_all = np.stack([s // self.stride + base for s in starts])
        n = idx_all.shape[0]
        from rtdsd_tpu.data.loader import readback_late

        def dispatch():  # pipelined readback (see StreamingScorer)
            for s in range(0, n, self.batch_size):
                idx = idx_all[s: s + self.batch_size]
                valid = idx.shape[0]
                if valid < self.batch_size:
                    pad = np.repeat(idx[-1:], self.batch_size - valid,
                                    axis=0)
                    idx = np.concatenate([idx, pad])
                yield (self._score_feats(
                    self.params, self.batch_stats, feats_flat,
                    jax.numpy.asarray(idx)), valid)

        scores = [np.asarray(out)[:v] for out, v in readback_late(dispatch())]
        return np.concatenate(scores)

    aggregate_scores = StreamingScorer.aggregate_scores

    def score(self, wave: np.ndarray) -> float:
        return self.aggregate_scores(self.window_scores(wave))
