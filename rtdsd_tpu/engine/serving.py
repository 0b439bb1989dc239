"""Multi-stream real-time serving engine.

The reference's real-time story is single-utterance cropping
(/root/reference/data/test_set.py pads/crops to a fixed duration); its
deployment surface ends at batch scoring of files. This module is the
production-serving counterpart for live audio: N concurrent 16 kHz
streams, each pushing samples as they arrive, scored on ONE chip with
fixed-shape compiled programs.

TPU-native design (everything static-shaped, two jitted programs total):

- per-stream conv features live in a device-resident ring buffer
  ``(max_streams + 1, ring_frames, C)`` — the XLSR conv stack is strictly
  stride-aligned (stride 320, receptive field 400, VALID padding,
  per-frame layer_norm), so the features of any window are an exact
  slice of the stream's feature history (engine/streaming.py proved this
  for the offline incremental scorer; serving extends it across time);
- ``extend``: one batched dispatch computes conv features for up to
  ``extend_batch`` new segments across all streams and scatters them
  into the rings at ``frame % ring_frames``;
- ``score``: one batched dispatch gathers up to ``score_batch`` due
  windows (mod-ring gather, again across streams) and runs the
  transformer + back-end on them via the models' ``conv_feats=`` entry.

Per hop interval each stream costs exactly one segment row in ``extend``
and one window row in ``score`` — conv FLOPs are ~1x realtime per stream
(vs window/hop x for naive windowing) and dispatch count is O(1) in the
number of streams, which matters on high-dispatch-latency links.

Slot ``max_streams`` is a scratch slot: batch padding rows write/read it
so the compiled shapes never change with occupancy.

Cascade escalation (``escalate=``): a cheap screener (layer-pruned KD
student) can be the engine's primary model, with a flagship re-scoring
only windows whose screener score falls in an uncertainty band. The
flagship reads a raw-sample ring (the feature ring's geometry in
samples) through its ordinary wave entry, so the pair may be ANY two
models — escalated scores are exactly the flagship's direct scores.
Escalations run as extra fixed-shape dispatches inside the same poll,
before any subsequent extend can overwrite the ring rows.
"""

from __future__ import annotations

import collections
from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["MultiStreamScorer", "WindowScore"]


class WindowScore(NamedTuple):
    stream_id: object
    start_sample: int  # window start in absolute stream samples
    score: float  # bonafide CM score (logit), higher = more bonafide
    escalated: bool = False  # scored by the escalation model (cascade)


class _StreamState:
    __slots__ = ("stream_id", "buf", "chunks", "chunks_len", "next_seg",
                 "next_win", "final_win")

    def __init__(self, stream_id, dtype=np.float32):
        self.stream_id = stream_id
        self.buf = np.zeros((0,), dtype)  # samples from next_seg's start
        self.chunks = []  # pushed-but-uncoalesced chunks (O(1) push)
        self.chunks_len = 0
        self.next_seg = 0  # next conv segment index to extract
        self.next_win = 0  # next window index to score
        self.final_win = None  # set by close(flush=True): total window count

    def coalesce(self):
        if self.chunks:
            parts = ([self.buf] if len(self.buf) else []) + self.chunks
            self.buf = parts[0] if len(parts) == 1 else np.concatenate(parts)
            self.chunks = []
            self.chunks_len = 0

    @property
    def pending_samples(self):
        return len(self.buf) + self.chunks_len


class MultiStreamScorer:
    """Scores many concurrent live audio streams on one device.

    Usage::

        eng = MultiStreamScorer(model, params, batch_stats, cfg,
                                duration=16000, hop=8000, max_streams=64)
        h = eng.open_stream("caller-17")
        eng.push(h, samples)          # any chunk size, any cadence
        for ws in eng.poll():         # one extend + one score dispatch
            ...                       # WindowScore(stream_id, start, score)
        eng.close_stream(h)

    ``duration``/``hop`` are in samples and must be multiples of the conv
    stride (320 for XLSR) so windows land exactly on the conv frame grid.
    ``model`` must accept ``conv_feats=`` (models/zoo.py) and ``cfg`` is
    its ``Wav2Vec2Config`` with the ``layer_norm`` extractor (group_norm
    couples frames across a whole window and cannot stream).
    """

    def __init__(self, model, params, batch_stats, cfg, *,
                 duration: int, hop: Optional[int] = None,
                 max_streams: int = 8,
                 seg_frames: Optional[int] = None,
                 ring_frames: Optional[int] = None,
                 extend_batch: Optional[int] = None,
                 score_batch: Optional[int] = None,
                 escalate: Optional[tuple] = None,
                 escalate_band: float = 2.0,
                 escalate_center: float = 0.0,
                 esc_batch: Optional[int] = None,
                 transport_dtype: str = "float32"):
        if cfg.extractor_mode != "layer_norm":
            raise ValueError(
                "multi-stream serving requires the layer_norm extractor "
                "(group_norm normalizes across the full window)")
        stride = cfg.total_stride
        hop = duration // 2 if hop is None else hop
        if duration % stride or hop % stride:
            raise ValueError(
                f"duration ({duration}) and hop ({hop}) must be multiples "
                f"of the conv stride ({stride}) so windows land on the "
                f"conv frame grid")
        if hop <= 0 or duration <= 0:
            raise ValueError("duration and hop must be positive")
        from rtdsd_tpu.models.wav2vec2 import conv_segment_geometry

        self.duration = duration
        self.hop = hop
        self.stride = stride
        self.rf = cfg.conv_receptive_field
        self.win_frames = cfg.num_frames(duration)
        self.hop_frames = hop // stride
        self.seg_frames = seg_frames or self.hop_frames
        self.seg_samples, self.seg_hop, _ = conv_segment_geometry(
            cfg, self.seg_frames, 1)
        self._escalate = escalate is not None
        # Escalation stores whole overlapping segments in the sample ring
        # (each segment's rf-stride tail = the next segment's head), so a
        # window due with ZERO spare segment frames still has the rf-1
        # samples its last conv frame needs; the write overruns the
        # frame-aligned region by rf-stride samples (< 1 frame), so the
        # escalating engine keeps one extra ring frame of margin.
        self._ring_margin = 1 if self._escalate else 0
        # Ring must hold a full window plus the segments that can land
        # while its windows are still pending; 2 extra segments give the
        # scheduler slack before backpressure defers a stream's extends.
        min_ring = self.win_frames + 2 * self.seg_frames + self._ring_margin
        self.ring_frames = ring_frames or -(-min_ring // 8) * 8
        if self.ring_frames < min_ring:
            raise ValueError(
                f"ring_frames {self.ring_frames} < minimum {min_ring} "
                f"(win_frames + 2*seg_frames + escalation margin)")
        self.max_streams = max_streams
        self.extend_batch = extend_batch or max_streams
        self.score_batch = score_batch or max_streams
        # int16 transport halves (and on high-latency relay links, far
        # more than halves) the per-tick host->device sample upload; it
        # is lossless for 16-bit-sourced audio (WAV/FLAC), and the
        # dequant (x/32768) runs on device inside the extend program
        if transport_dtype not in ("float32", "int16"):
            raise ValueError(f"transport_dtype must be float32 or int16, "
                             f"got {transport_dtype!r}")
        self._tdtype = np.int16 if transport_dtype == "int16" \
            else np.float32

        self.params = params
        self.batch_stats = batch_stats
        self._channels = cfg.conv_layers[-1][0]
        # +1 slot: scratch for batch-padding rows (writes and reads of the
        # pad rows land there; occupancy never changes compiled shapes)
        self._scratch = max_streams
        self._feats = jnp.zeros(
            (max_streams + 1, self.ring_frames, self._channels), model.dtype)

        from rtdsd_tpu.models.wav2vec2 import ConvFeatureExtractor

        conv = ConvFeatureExtractor(cfg, model.dtype)
        # params stay EXPLICIT jit arguments (CLAUDE.md: closing jit over a
        # param tree bakes it into the HLO and constant-folds for minutes)
        self._conv_params = params["ssl_model"]["feature_extractor"]
        ring_frames_ = self.ring_frames
        seg_arange = jnp.arange(self.seg_frames, dtype=jnp.int32)
        win_arange = jnp.arange(self.win_frames, dtype=jnp.int32)

        dequant = self._tdtype is np.int16
        # ----- optional cascade escalation: a second (bigger) model that
        # re-scores windows whose screener score lands in the uncertainty
        # band |score - center| <= band. The flagship scores from a RAW
        # SAMPLE ring (int16/f32, mirrors the feature ring's geometry in
        # samples, ~65 KB/stream) through its ordinary wave entry, so the
        # two models need share nothing — any screener works, including
        # KD students whose conv drifted from the teacher's during
        # distillation — and an escalated score is exactly the flagship's
        # direct score of that window.
        self.escalate_band = escalate_band
        self.escalate_center = escalate_center
        self.esc_batch = esc_batch or max(1, self.score_batch // 4)
        self.ring_samples = self.ring_frames * stride
        stride_ = stride
        seg_hop_ = self.seg_hop
        ring_samples_ = self.ring_samples
        # allocated even without escalation (donated pass-through keeps
        # the extend signature stable; ~65 KB/stream, negligible)
        self._swave = jnp.zeros(
            (max_streams + 1, self.ring_samples),
            jnp.int16 if dequant else jnp.float32)
        samp_arange = jnp.arange(self.seg_samples, dtype=jnp.int32)
        escalate_on = self._escalate

        def extend(cp, feats, swave, segs, slots, frame_pos):
            waves = segs
            if dequant:
                waves = segs.astype(jnp.float32) * (1.0 / 32768.0)
            new = conv.apply({"params": cp}, waves)
            idx = (frame_pos[:, None] + seg_arange) % ring_frames_
            feats = feats.at[slots[:, None], idx].set(
                new.astype(feats.dtype))
            if escalate_on:
                # whole overlapping segments: segment k's rf-stride tail
                # equals segment k+1's head (same stream samples), so
                # in-batch duplicate indices write identical values and
                # the ring always holds the last frame's full receptive
                # field even for zero-spare-frame window geometries
                sidx = (frame_pos[:, None] * stride_ + samp_arange) \
                    % ring_samples_
                swave = swave.at[slots[:, None], sidx].set(segs)
            return feats, swave

        def score(p, stats, feats, slots, start_frames):
            variables = {"params": p}
            if stats:
                variables["batch_stats"] = stats
            idx = (start_frames[:, None] + win_arange) % ring_frames_
            windows = feats[slots[:, None], idx]  # (B, win_frames, C)
            logits = model.apply(variables, None, train=False,
                                 conv_feats=windows)
            return logits[:, 1]

        # feats/swave are donated: the rings are rewritten in place every
        # extend instead of allocating fresh ring buffers per call
        self._extend = jax.jit(extend, donate_argnums=(1, 2))
        self._score = jax.jit(score)

        if self._escalate:
            esc_model, esc_params, esc_stats = escalate
            self._esc_params = esc_params
            self._esc_stats = esc_stats
            dur_arange = jnp.arange(self.duration, dtype=jnp.int32)

            def score_esc(p, stats, swave, slots, start_frames):
                variables = {"params": p}
                if stats:
                    variables["batch_stats"] = stats
                sidx = (start_frames[:, None] * stride_ + dur_arange) \
                    % ring_samples_
                waves = swave[slots[:, None], sidx]  # (B, duration)
                if dequant:
                    waves = waves.astype(jnp.float32) * (1.0 / 32768.0)
                logits = esc_model.apply(variables, waves, train=False)
                return logits[:, 1]

            self._score_esc = jax.jit(score_esc)

        self._slots: Dict[int, _StreamState] = {}
        self._free = collections.deque(range(max_streams))

    # ------------------------------------------------------------- lifecycle

    def open_stream(self, stream_id=None) -> int:
        """Claim a slot for a new stream; returns the handle."""
        if not self._free:
            raise RuntimeError(
                f"all {self.max_streams} stream slots are busy")
        slot = self._free.popleft()
        self._slots[slot] = _StreamState(
            stream_id if stream_id is not None else slot, self._tdtype)
        return slot

    def close_stream(self, handle: int, flush: bool = False) -> None:
        """Release a slot. ``flush=True`` zero-pads the tail so windows
        whose samples partially arrived still get scored on subsequent
        :meth:`poll` calls — the slot frees once its work drains."""
        st = self._slots.get(handle)
        if st is None:
            raise KeyError(f"no open stream at slot {handle}")
        if not flush:
            del self._slots[handle]
            self._free.append(handle)
            return
        # pad so every sample pushed so far is covered by some window AND
        # the needed frames land on a segment boundary (a partial final
        # segment would never be extracted), then let poll() drain
        st.coalesce()
        total = st.next_seg * self.seg_hop + len(st.buf)
        last_win = max(0, -(-max(0, total - self.duration) // self.hop))
        st.final_win = last_win + 1
        frames_needed = last_win * self.hop_frames + self.win_frames
        segs_needed = -(-frames_needed // self.seg_frames)
        need = (segs_needed - 1) * self.seg_hop + self.seg_samples
        if need > total:
            st.buf = np.concatenate(
                [st.buf, np.zeros(need - total, self._tdtype)])

    @property
    def active_streams(self) -> int:
        return len(self._slots)

    # ------------------------------------------------------------------ i/o

    def push(self, handle: int, samples: np.ndarray) -> None:
        """Append samples to a stream. Cheap (host memory only); device
        work happens in :meth:`poll`."""
        st = self._slots.get(handle)
        if st is None:
            raise KeyError(f"no open stream at slot {handle}")
        if st.final_win is not None:
            raise RuntimeError("stream is closing (close_stream flush=True)")
        samples = np.asarray(samples).reshape(-1)
        if samples.dtype != self._tdtype:
            if self._tdtype is np.int16:  # float wave -> 16-bit PCM
                samples = np.clip(np.rint(samples * 32768.0),
                                  -32768, 32767).astype(np.int16)
            else:
                samples = samples.astype(np.float32)
        # O(1) per push: chunks coalesce once per poll, not per call
        st.chunks.append(samples)
        st.chunks_len += len(samples)

    def _due_segments(self, limit=None):
        """(slot, seg_index, segment_samples) for extractable segments,
        oldest-first per stream, honoring ring backpressure; stops once
        ``limit`` segments are collected (poll never needs more than one
        extend batch, so enumerating a deep backlog would be waste)."""
        out = []
        for slot, st in self._slots.items():
            st.coalesce()
            k = st.next_seg
            # buf[0] is absolute sample k*seg_hop; segment k spans
            # [k*seg_hop, k*seg_hop + seg_samples)
            off = 0
            while len(st.buf) - off >= self.seg_samples:
                # backpressure: frames [k*sf, (k+1)*sf) may not overwrite
                # frames the oldest pending window still needs (escalation
                # margin covers the sample-ring's sub-frame tail overrun)
                oldest_needed = st.next_win * self.hop_frames
                if (k + 1) * self.seg_frames - oldest_needed \
                        > self.ring_frames - self._ring_margin:
                    break
                out.append((slot, k,
                            st.buf[off:off + self.seg_samples]))
                if limit is not None and len(out) >= limit:
                    return out
                off += self.seg_hop
                k += 1
        return out

    def _consume(self, taken):
        """Advance per-stream state for the segments actually dispatched."""
        by_slot = collections.Counter(slot for slot, _, _ in taken)
        for slot, n in by_slot.items():
            st = self._slots[slot]
            st.next_seg += n
            st.buf = st.buf[n * self.seg_hop:]

    def _due_windows(self):
        out = []
        for slot, st in self._slots.items():
            frames_done = st.next_seg * self.seg_frames
            w = st.next_win
            while (w * self.hop_frames + self.win_frames <= frames_done
                   and (st.final_win is None or w < st.final_win)):
                out.append((slot, w))
                w += 1
        return out

    def poll(self) -> List[WindowScore]:
        """Run at most one ``extend`` and one ``score`` dispatch; returns
        the completed window scores. Call repeatedly (or :meth:`drain`)
        to work through a backlog larger than the batch sizes."""
        results: List[WindowScore] = []
        self._last_poll_work = False
        segs = self._due_segments(limit=self.extend_batch)
        if segs:
            self._last_poll_work = True
            seg_mat = np.zeros((self.extend_batch, self.seg_samples),
                               self._tdtype)
            slots = np.full((self.extend_batch,), self._scratch, np.int32)
            pos = np.zeros((self.extend_batch,), np.int32)
            for i, (slot, seg_idx, samples) in enumerate(segs):
                seg_mat[i] = samples
                slots[i] = slot
                pos[i] = (seg_idx * self.seg_frames) % self.ring_frames
            self._feats, self._swave = self._extend(
                self._conv_params, self._feats, self._swave,
                jnp.asarray(seg_mat), jnp.asarray(slots), jnp.asarray(pos))
            self._consume(segs)

        wins = self._due_windows()[: self.score_batch]
        if wins:
            self._last_poll_work = True
            slots = np.full((self.score_batch,), self._scratch, np.int32)
            starts = np.zeros((self.score_batch,), np.int32)
            for i, (slot, w) in enumerate(wins):
                slots[i] = slot
                starts[i] = (w * self.hop_frames) % self.ring_frames
            scores = np.array(self._score(
                self.params, self.batch_stats, self._feats,
                jnp.asarray(slots), jnp.asarray(starts)))
            escalated = np.zeros(len(wins), bool)
            if self._escalate:
                # same-poll escalation: the ring rows are still protected
                # by backpressure (no extend ran since the gather above)
                due = [i for i in range(len(wins))
                       if abs(float(scores[i]) - self.escalate_center)
                       <= self.escalate_band]
                for c0 in range(0, len(due), self.esc_batch):
                    chunk = due[c0: c0 + self.esc_batch]
                    eslots = np.full((self.esc_batch,), self._scratch,
                                     np.int32)
                    estarts = np.zeros((self.esc_batch,), np.int32)
                    for j, i in enumerate(chunk):
                        eslots[j] = slots[i]
                        estarts[j] = starts[i]
                    esc_scores = np.asarray(self._score_esc(
                        self._esc_params, self._esc_stats, self._swave,
                        jnp.asarray(eslots), jnp.asarray(estarts)))
                    for j, i in enumerate(chunk):
                        scores[i] = esc_scores[j]
                        escalated[i] = True
            for i, (slot, w) in enumerate(wins):
                st = self._slots[slot]
                st.next_win = w + 1
                results.append(WindowScore(st.stream_id, w * self.hop,
                                           float(scores[i]),
                                           bool(escalated[i])))
        # release closing streams whose final window has been scored
        for slot in [s for s, st in self._slots.items()
                     if st.final_win is not None
                     and st.next_win >= st.final_win]:
            del self._slots[slot]
            self._free.append(slot)
        return results

    def _has_pending(self) -> bool:
        """Cheap per-stream counter check: any extractable segment or
        scorable window left? (No backlog enumeration — O(streams).)"""
        for st in self._slots.values():
            if st.pending_samples >= self.seg_samples:
                return True
            frames_done = st.next_seg * self.seg_frames
            w = st.next_win
            if (w * self.hop_frames + self.win_frames <= frames_done
                    and (st.final_win is None or w < st.final_win)):
                return True
        return False

    def drain(self, max_polls: int = 10_000) -> List[WindowScore]:
        """Poll until no stream has extractable work; returns all scores."""
        out: List[WindowScore] = []
        for _ in range(max_polls):
            out.extend(self.poll())
            if not self._last_poll_work:
                if not self._has_pending():
                    return out
                raise RuntimeError(
                    "drain stalled with work pending (ring backpressure "
                    "deadlock? raise ring_frames)")
        raise RuntimeError("drain did not converge")

    def warmup(self) -> None:
        """Compile both programs once (scratch-only batches) so the first
        real poll is not a compile."""
        self._feats, self._swave = self._extend(
            self._conv_params, self._feats, self._swave,
            jnp.zeros((self.extend_batch, self.seg_samples),
                      jnp.int16 if self._tdtype is np.int16
                      else jnp.float32),
            jnp.full((self.extend_batch,), self._scratch, jnp.int32),
            jnp.zeros((self.extend_batch,), jnp.int32))
        jax.block_until_ready(np.asarray(self._score(
            self.params, self.batch_stats, self._feats,
            jnp.full((self.score_batch,), self._scratch, jnp.int32),
            jnp.zeros((self.score_batch,), jnp.int32))))
        if self._escalate:
            jax.block_until_ready(np.asarray(self._score_esc(
                self._esc_params, self._esc_stats, self._swave,
                jnp.full((self.esc_batch,), self._scratch, jnp.int32),
                jnp.zeros((self.esc_batch,), jnp.int32))))
