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
import os
import sys
from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["MultiStreamScorer", "WindowScore",
           "mulaw_encode", "mulaw_decode"]

_MU = 255.0  # mu-law companding constant (G.711-style continuous form)


def mulaw_encode(x: np.ndarray) -> np.ndarray:
    """float wave in [-1, 1] -> companded int8 in [-127, 127] (host side).

    Continuous mu-law (y = sign(x)·log1p(mu|x|)/log1p(mu)), not the G.711
    segmented table — same ~38 dB speech SNR, two lines of math on both
    ends. Quantizes AFTER companding so small samples keep ~1.7e-4
    resolution while full-scale costs ~4e-2 (speech energy lives near 0).
    """
    x = np.clip(np.asarray(x, np.float32), -1.0, 1.0)
    y = np.sign(x) * np.log1p(_MU * np.abs(x)) / np.log1p(_MU)
    return np.clip(np.rint(y * 127.0), -127, 127).astype(np.int8)


def mulaw_decode(q: jnp.ndarray) -> jnp.ndarray:
    """Companded int8 -> float32 wave (device side, inside jit).

    Clamps to the encoder's [-127, 127] code range first: a raw int8
    buffer pushed by a client may contain -128 (e.g. true G.711 bytes,
    which use a different sign-magnitude layout and must be transcoded
    host-side anyway), which would otherwise decode to ~-1.045, outside
    the [-1, 1] amplitude contract of every other transport."""
    y = jnp.clip(q.astype(jnp.float32), -127.0, 127.0) * (1.0 / 127.0)
    return jnp.sign(y) * jnp.expm1(jnp.abs(y) * np.log1p(_MU)) \
        * (1.0 / _MU)


def hbm_limit_file_path() -> str:
    """Location of the calibrated-HBM sidecar (see ``probe_hbm_bytes``):
    ``$RTDSD_HBM_LIMIT_FILE`` or ``~/.cache/rtdsd_tpu/hbm_limit.json``."""
    return os.environ.get("RTDSD_HBM_LIMIT_FILE") or os.path.join(
        os.path.expanduser("~"), ".cache", "rtdsd_tpu", "hbm_limit.json")


def _device_hbm_bytes():
    """The default device's usable memory in bytes, from (in order):

    1. the backend's own ``memory_stats()['bytes_limit']`` (TPU local);
    2. ``$RTDSD_HBM_GB`` (operator override, GiB);
    3. the calibrated sidecar written by ``probe_hbm_bytes`` /
       ``tools/serving_bench.py --calibrate_hbm`` — the relay-attached
       case, where the device reports no stats and the HBM-aware extend
       default would otherwise stay inert (VERDICT r4 item 3);
    4. None -> guard disabled (CPU backends).
    """
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        limit = int(stats.get("bytes_limit", 0)) or None
    except Exception:
        limit = None
    if limit:
        return limit
    env_gb = os.environ.get("RTDSD_HBM_GB")
    if env_gb:
        try:
            return int(float(env_gb) * 2 ** 30)
        except ValueError:
            pass
    try:
        import json

        with open(hbm_limit_file_path()) as fh:
            rec = json.load(fh)
        kind = jax.local_devices()[0].device_kind
        if rec.get("device_kind") in (None, kind):
            return int(rec["bytes"]) or None
    except Exception:
        pass
    return None


def probe_hbm_bytes(max_gb: float = 64.0, block_gb: float = 1.0,
                    alloc=None, record: bool = False) -> int:
    """Empirically measure usable device memory by bounded trial
    allocation — for deployments where the device reports no
    ``bytes_limit`` (e.g. a remote relay). Holds an increasing count of
    fixed ``block_gb`` buffers until one fails (or ``max_gb`` is
    reached); usable = blocks held × block size, 1 GiB resolution.

    Two relay-shaped constraints (both measured, r5) dictate this form:
    every distinct allocation SIZE is a fresh remote compile (seconds to
    minutes each — a binary search of varying sizes times out), and the
    first failed allocation poisons the worker for the rest of the
    process (a 12 GiB trial that succeeded before a 16 GiB failure fails
    with RESOURCE_EXHAUSTED after it), so all successful trials must
    precede the single failure. Fixed-size blocks compile ONCE and
    ascend monotonically. Run it as a one-shot whose process exits after
    recording (``tools/serving_bench.py --calibrate_hbm`` does).

    ``alloc()`` (one block, no args) is injectable for tests; the
    default allocates a device uint8 buffer and forces materialization
    with a one-element readback (``block_until_ready`` does not block
    through a relay, CLAUDE.md). ``record=True`` writes the result to
    :func:`hbm_limit_file_path` so ``_device_hbm_bytes`` (and with it
    the HBM-aware extend default and the pre-flight guard) picks it up
    in every later process.
    """
    gib = 2 ** 30
    block = int(block_gb * gib)
    if alloc is None:
        def alloc():
            x = jnp.zeros((block,), jnp.uint8)
            np.asarray(x[-1])  # force through the relay
            return x

    held = []
    try:
        while len(held) * block < int(max_gb * gib):
            held.append(alloc())
    except Exception:
        pass
    lo = len(held) * block
    del held
    if lo == 0:
        raise RuntimeError(
            f"HBM probe: even a {block_gb:g} GiB allocation failed — "
            "device busy or broken, not calibrating")
    if record:
        import json

        path = hbm_limit_file_path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        try:
            kind = jax.local_devices()[0].device_kind
        except Exception:
            kind = None
        with open(path, "w") as fh:
            json.dump({"bytes": lo, "device_kind": kind}, fh)
        print(f"[hbm probe] recorded {lo / gib:.2f} GiB usable "
              f"({kind}) -> {path}", file=sys.stderr)
    return lo


def _shape_ladder(full: int, rungs: int, prefix: str, n: int):
    """``rungs`` successive halvings of a dispatch shape, rounded down to
    the mesh-axis multiple ``n``; rungs that hit zero rows are dropped.
    Returns [(rows, counter_name), ...] in descending row order — a
    dispatch picks the SMALLEST rung its live rows fit.

    Counter names are positional in the ladder (``half``, ``quarter``,
    ...), NOT exact fractions: the mesh rounding compounds across rungs
    (``(b // 2 // n) * n`` of the previous rounded value), so e.g.
    ``full=24, n=8`` yields one rung of 8 rows still named
    ``score_half``. Capacity accounting must read actual rows from
    ``MultiStreamScorer.rung_rows[counter_name]``, not parse the name."""
    names = ("half", "quarter", "eighth")
    out = []
    b = full
    for i in range(max(0, int(rungs))):
        b = (b // 2 // n) * n
        if b <= 0:
            break
        suffix = names[i] if i < len(names) else f"1_{2 ** (i + 1)}"
        out.append((b, f"{prefix}_{suffix}"))
    return out


def dispatch_detail_keys(counts) -> list:
    """Stable display order for dispatch/cost counter keys: extend family
    first, then score, then escalate; base shape before its sub-shape
    rungs (insertion order = descending rows), ``extend_const`` last in
    its family. Built from the LIVE counter keys so arbitrarily deep
    rungs (``*_1_16``, ...) are never dropped from a breakdown — the
    advisor-flagged failure mode of hard-coding names up to ``_eighth``
    (cli/serve.py, tools/serving_bench.py share this)."""
    fams = ("extend", "score", "escalate")
    order = list(counts)
    out = []
    for f in fams:
        ks = [k for k in order if k == f or k.startswith(f + "_")]
        ks.sort(key=lambda k: (k != f, k == "extend_const", order.index(k)))
        out.extend(ks)
    out.extend(k for k in order
               if not any(k == f or k.startswith(f + "_") for f in fams))
    return out


class WindowScore(NamedTuple):
    stream_id: object
    start_sample: int  # window start in absolute stream samples
    score: float  # bonafide CM score (logit), higher = more bonafide
    escalated: bool = False  # scored by the escalation model (cascade)
    gated: bool = False  # energy-gated silence: score is gate_score,
    #                      no model ran (see gate_rms_dbfs)


class _StreamState:
    __slots__ = ("stream_id", "buf", "chunks", "chunks_len", "next_seg",
                 "next_win", "final_win", "tail_frame", "head", "head_len",
                 "head_cap", "engsq")

    def __init__(self, stream_id, dtype=np.float32, head_cap=0):
        self.stream_id = stream_id
        self.buf = np.zeros((0,), dtype)  # samples from next_seg's start
        self.chunks = []  # pushed-but-uncoalesced chunks (O(1) push)
        self.chunks_len = 0
        self.next_seg = 0  # next conv segment index to extract
        self.next_win = 0  # next window index to score
        self.final_win = None  # set by close(flush=True): total window count
        self.tail_frame = None  # start frame of a tail-aligned final window
        # first `head_cap` samples retained so a short stream (< one
        # window) can be repeat-tiled at flush like the offline scorers
        self.head = []
        self.head_len = 0
        self.head_cap = head_cap
        # per-segment mean-square energy (seg_idx -> float), kept only
        # while the energy gate may still need it (gate_rms_dbfs)
        self.engsq = {}

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

    Scoring latency: features are extracted in fixed conv segments whose
    sample span overlaps the next segment by the conv receptive-field
    tail (``seg_samples - seg_hop``, e.g. 80 samples = 5 ms for XLSR).
    A window is scored once the segment containing its last conv frame
    is extractable, i.e. up to that tail's worth of samples AFTER the
    window's nominal end — with fine-grained pushes (telephony frames)
    that is milliseconds, but a producer that pushes exactly one hop at
    a time sees each window's score one push later (the tail of hop k
    rides in with hop k+1). ``close_stream(flush=True)`` pads and scores
    whatever remains.
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
                 esc_rate: Optional[float] = None,
                 esc_gather: str = "slice",
                 extend_fastpath: bool = True,
                 extend_rungs: int = 2,
                 score_rungs: int = 0,
                 esc_rungs: int = 0,
                 auto_provision: bool = True,
                 provision_after: int = 48,
                 transport_dtype: str = "float32",
                 hbm_limit: Optional[int] = None,
                 auto_batch: bool = False,
                 gate_rms_dbfs: Optional[float] = None,
                 gate_score: float = 0.0,
                 mesh=None):
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
        if hop > duration:
            # the ring sizing, backpressure, and in-batch scatter-uniqueness
            # invariants all assume windows tile contiguously or overlap;
            # sparse sampling (hop > window) would let one extend batch span
            # more than ring_frames and scatter duplicate indices
            raise ValueError(
                f"hop ({hop}) must not exceed the window duration "
                f"({duration}); subsample streams host-side instead")
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
        # single implementation of the alignment arithmetic (close_stream's
        # flush padding uses the n-segment pad_to)
        self._seg_geometry = lambda n: conv_segment_geometry(
            cfg, self.seg_frames, n)
        self._escalate = escalate is not None
        # Escalation keeps raw samples in a frame-row ring; each segment
        # writes its seg_frames full rows plus an rf-stride sample tail
        # (the next segment's head — the samples a window due with ZERO
        # spare segment frames still needs for its last conv frame), so
        # the write overruns the frame-aligned region by tail_rows rows
        # and the escalating engine keeps that much extra ring margin.
        self._tail_len = self.seg_samples - self.seg_frames * stride
        self._tail_rows = -(-self._tail_len // stride) if self._tail_len \
            else 0
        self._ring_margin = self._tail_rows if self._escalate else 0
        # Ring must hold a full window plus the segments that can land
        # while its windows are still pending; 2 extra segments give the
        # scheduler slack before backpressure defers a stream's extends.
        min_ring = self.win_frames + 2 * self.seg_frames + self._ring_margin
        self.ring_frames = ring_frames or -(-min_ring // 8) * 8
        if self.ring_frames < min_ring:
            raise ValueError(
                f"ring_frames {self.ring_frames} < minimum {min_ring} "
                f"(win_frames + 2*seg_frames + escalation margin)")
        # ----- optional multi-chip SPMD serving: with a 1-axis mesh the
        # ring buffers shard over the SLOT axis and the batched programs
        # over their batch axis; parameters replicate. XLA inserts the
        # cross-chip gathers for windows whose slot lives on another chip
        # (jax.sharding — no per-chip engine processes). Single-chip path
        # is byte-identical when mesh is None.
        self._mesh = mesh
        self._mesh_n = 1
        self._ring_sharding = self._batch_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            if len(mesh.axis_names) != 1:
                # rings/batches shard over ONE axis; extra axes would only
                # replicate them, and the HBM guard's per-chip division
                # would under-estimate by the replicated axes' factor
                raise ValueError(
                    f"serving mesh must have exactly one axis, got "
                    f"{mesh.axis_names}")
            axis = mesh.axis_names[0]
            self._mesh_n = int(mesh.shape[axis])
            self._ring_sharding = NamedSharding(mesh, P(axis))
            self._batch_sharding = NamedSharding(mesh, P(axis))
            self._replicated = NamedSharding(mesh, P())
            params = jax.device_put(params, self._replicated)
            if batch_stats:
                batch_stats = jax.device_put(batch_stats, self._replicated)
        n_ = self._mesh_n
        self.max_streams = max_streams
        # batch shapes and the slot axis must tile evenly over the mesh.
        # A capped score_batch is the documented HBM escape hatch for
        # large S; the extend batch provisionally follows the same cap
        # unless set explicitly — an uncapped extend's conv activations
        # are ~6.6 MB/row f32 at this geometry, the largest single term
        # in the HBM estimate at large S (PERFORMANCE.md). The pre-flight
        # block below restores extend_batch = max_streams whenever the
        # estimate says the full-width extend fits anyway.
        self.extend_batch = -(-(extend_batch or score_batch
                                or max_streams) // n_) * n_
        self.score_batch = -(-(score_batch or max_streams) // n_) * n_
        # int16 transport halves (and on high-latency relay links, far
        # more than halves) the per-tick host->device sample upload; it
        # is lossless for 16-bit-sourced audio (WAV/FLAC), and the
        # dequant (x/32768) runs on device inside the extend program.
        # mulaw8 halves the bytes AGAIN (lossy: ~38 dB speech SNR,
        # telephony-grade companding) — for ingest-bound deployments.
        if transport_dtype not in ("float32", "int16", "mulaw8"):
            raise ValueError(f"transport_dtype must be float32, int16 or "
                             f"mulaw8, got {transport_dtype!r}")
        self._mulaw = transport_dtype == "mulaw8"
        self._tdtype = {"float32": np.float32, "int16": np.int16,
                        "mulaw8": np.int8}[transport_dtype]

        # ---- energy gate: windows whose RMS (dBFS re full scale 1.0)
        # sits below the threshold emit ``gate_score`` WITHOUT a model
        # dispatch. Scoring is ~90% of serving device cost
        # (PERFORMANCE.md), so on silence-heavy audio (telephony) this
        # is nearly a full capacity multiplier on the silent fraction.
        # Per-segment mean squares are tracked host-side at consume time
        # (one vectorized pass over samples already in hand); the conv
        # extend still runs for every segment so ring state stays exact
        # for neighboring loud windows.
        if gate_rms_dbfs is not None and gate_rms_dbfs > 0:
            raise ValueError(
                f"gate_rms_dbfs is dBFS relative to full scale 1.0 and "
                f"must be <= 0 (typical speech gate: -45 .. -60), got "
                f"{gate_rms_dbfs}")
        self.gate_msq = (None if gate_rms_dbfs is None
                         else 10.0 ** (gate_rms_dbfs / 10.0))
        self.gate_score = float(gate_score)
        self.gated_windows = 0  # observability counter
        self.zero_segments = 0  # segments served by the const fastpath
        self.model_swaps = 0  # hot checkpoint swaps (see swap_model)

        self.params = params
        self.batch_stats = batch_stats
        self._channels = cfg.conv_layers[-1][0]
        # escalation chunk sizing: explicit esc_batch wins; else size from
        # the measured dev-set escalation rate when a cascade calibration
        # provides one (the PERFORMANCE.md operational rule — esc cost is
        # ~linear per row with no fixed floor, so ~1.25 x rate x
        # score_batch covers per-tick in-band arrivals with headroom,
        # and a half-padded fixed-shape chunk pays real device time);
        # else the historical score_batch/4 (a 20% rate with the same
        # 1.25x headroom).
        if esc_rate is not None and not 0.0 <= esc_rate <= 1.0:
            raise ValueError(
                f"esc_rate is the expected in-band (escalated) fraction "
                f"of scored windows and must be in [0, 1], got {esc_rate}")
        self._esc_rate = esc_rate

        def esc_size(sb: int) -> int:
            if esc_batch is not None:
                return -(-esc_batch // n_) * n_
            frac = 1.25 * esc_rate if esc_rate is not None else 0.25
            # never wider than the score batch that feeds it (a tick can
            # not put more windows in band than it scored)
            want = min(sb, max(1, int(np.ceil(frac * sb))))
            return -(-want // n_) * n_

        self.esc_batch = esc_size(score_batch or max_streams)

        # ---- pre-flight HBM estimate (BEFORE any device allocation):
        # a misconfigured engine (too many streams / batch too large) must
        # raise here with numbers, not fault the TPU worker mid-serve
        self.hbm_estimate = self._estimate_hbm(model, cfg, params,
                                               escalate)
        limit = hbm_limit if hbm_limit is not None else _device_hbm_bytes()
        auto_shrank = False
        if limit and auto_batch and self.hbm_estimate > limit:
            # shrink the dispatch batches (halving, mesh-tiled) until the
            # estimate fits — each tick then drains the due backlog with
            # ceil(due/batch) dispatches instead of one. Rings and params
            # are fixed terms; if they alone exceed the limit, the raise
            # below still fires with the floor batches.
            auto_req = self.hbm_estimate
            while self.hbm_estimate > limit and self.score_batch > n_:
                sb = max(n_, -(-(self.score_batch // 2) // n_) * n_)
                self.score_batch = sb
                self.extend_batch = min(self.extend_batch, sb)
                # esc shrinks with the capped score batch (rate-aware);
                # an explicit esc_batch is still capped to the shrunken
                # rate size — keeping it full-width would defeat the fit
                frac = (1.25 * esc_rate if esc_rate is not None else 0.25)
                self.esc_batch = min(
                    self.esc_batch,
                    -(-max(1, int(np.ceil(frac * sb))) // n_) * n_)
                self.hbm_estimate = self._estimate_hbm(model, cfg, params,
                                                       escalate)
            auto_shrank = self.hbm_estimate <= limit
        # HBM-aware extend default: a capped score_batch (the one-knob
        # escape hatch, or an auto_batch shrink) also caps the extend
        # batch by default — but that cap staggers window availability
        # into half-full score dispatch pairs (measured 2x device-ms/tick
        # at S=1024 gated cascade, PERFORMANCE.md). When extend_batch was
        # NOT set explicitly and the pre-flight estimate says the
        # full-width extend still fits the device, keep
        # extend_batch = max_streams; fall back to the cap when it does
        # not fit or the device HBM is unknown.
        full_extend = -(-max_streams // n_) * n_
        if extend_batch is None and limit \
                and self.extend_batch < full_extend:
            capped, capped_est = self.extend_batch, self.hbm_estimate
            self.extend_batch = full_extend
            self.hbm_estimate = self._estimate_hbm(model, cfg, params,
                                                   escalate)
            if self.hbm_estimate > limit:
                self.extend_batch, self.hbm_estimate = capped, capped_est
        elif extend_batch is None and not limit \
                and self.extend_batch < full_extend:
            # the capped extend staggers window availability into
            # half-full score dispatches (measured ~2x device-ms/tick on
            # gated workloads, PERFORMANCE.md) — warn loudly when the
            # fallback engages only because the device reports no memory
            # limit (e.g. through the axon relay)
            print(f"[serving] score_batch cap also capped extend_batch "
                  f"at {self.extend_batch} because the device reports no "
                  f"HBM limit; if {full_extend} fits your device, pass "
                  f"extend_batch={full_extend} (or hbm_limit=) — a "
                  f"capped extend staggers windows into half-full score "
                  f"dispatches (~2x tick cost on gated workloads)",
                  file=sys.stderr)
        if auto_shrank:
            print(f"[serving] auto_batch: ~{auto_req / 2**30:.2f} GiB "
                  f"estimate exceeded the {limit / 2**30:.2f} GiB "
                  f"limit; shrank batches to extend={self.extend_batch}"
                  f" score={self.score_batch} esc={self.esc_batch} "
                  f"(~{self.hbm_estimate / 2**30:.2f} GiB) — ticks "
                  f"drain the backlog with multiple dispatches",
                  file=sys.stderr)
        if limit and self.hbm_estimate > limit:
            err = ValueError(
                f"serving configuration needs ~{self.hbm_estimate / 2**30:.2f}"
                f" GiB HBM but the device reports {limit / 2**30:.2f} GiB "
                f"(max_streams={max_streams}, ring_frames={self.ring_frames},"
                f" extend_batch={self.extend_batch}, "
                f"score_batch={self.score_batch}, esc_batch={self.esc_batch})"
                f" — lower max_streams or the batch sizes, pass "
                f"auto_batch=True to shrink the batches to fit, or pass "
                f"hbm_limit=0 to override the guard")
            # structured access for tools (message wording is not an API)
            err.hbm_estimate = self.hbm_estimate
            err.hbm_limit = limit
            raise err

        # +1 slot: scratch for batch-padding rows (writes and reads of the
        # pad rows land there; occupancy never changes compiled shapes).
        # Under a mesh the slot axis pads further so it tiles evenly.
        self._scratch = max_streams
        self._n_slots = -(-(max_streams + 1) // n_) * n_
        self._feats = jnp.zeros(
            (self._n_slots, self.ring_frames, self._channels), model.dtype)
        if self._ring_sharding is not None:
            self._feats = jax.device_put(self._feats, self._ring_sharding)

        from rtdsd_tpu.models.wav2vec2 import ConvFeatureExtractor

        conv = ConvFeatureExtractor(cfg, model.dtype)
        # params stay EXPLICIT jit arguments (CLAUDE.md: closing jit over a
        # param tree bakes it into the HLO and constant-folds for minutes)
        self._conv_params = params["ssl_model"]["feature_extractor"]
        ring_frames_ = self.ring_frames
        seg_arange = jnp.arange(self.seg_frames, dtype=jnp.int32)
        win_arange = jnp.arange(self.win_frames, dtype=jnp.int32)

        mulaw = self._mulaw
        dequant = self._tdtype is not np.float32  # device-side decode needed

        def _decode(x):
            """Transport samples -> float wave, inside jit (on device)."""
            if mulaw:
                return mulaw_decode(x)
            if dequant:
                return x.astype(jnp.float32) * (1.0 / 32768.0)
            return x
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
        self.ring_samples = self.ring_frames * stride
        stride_ = stride
        # The sample ring is laid out in FRAME ROWS of ``stride`` samples
        # — (slots, ring_frames, stride) — so scatters and gathers move
        # contiguous rows instead of single elements (a flat per-sample
        # scatter of extend_batch x seg_samples int16s measured ~30 ms at
        # S=512, ~2x the whole conv extend; row-granular it fuses into a
        # cheap dynamic-update loop).
        # A segment is seg_frames full rows plus an rf-stride sample tail
        # (< 1 row for XLSR). The tail rows are written FIRST, padded with
        # zeros, and full rows second: when segments k and k+1 land in one
        # batch, k's zero-padded tail row and k+1's first full row target
        # the same ring row, and the ordered writes make the real data
        # win deterministically. An unoverwritten tail row's padding is
        # never read: a window only touches that row as its FINAL row,
        # and the escalation conv's VALID padding uses just its first
        # rf-stride samples (the backpressure margin set with the ring
        # geometry above keeps live windows clear of the tail-row
        # overrun).
        tail_rows_ = self._tail_rows
        tail_pad = self._tail_rows * stride - self._tail_len
        # allocated even without escalation (donated pass-through keeps
        # the extend signature stable; ~65 KB/stream, negligible)
        self._swave = jnp.zeros(
            (self._n_slots, self.ring_frames, stride),
            {np.float32: jnp.float32, np.int16: jnp.int16,
             np.int8: jnp.int8}[self._tdtype])
        if self._ring_sharding is not None:
            self._swave = jax.device_put(self._swave, self._ring_sharding)
        escalate_on = self._escalate
        if esc_gather not in ("slice", "flat"):
            raise ValueError(f"esc_gather must be 'slice' or 'flat', got "
                             f"{esc_gather!r}")
        self.esc_gather = esc_gather
        seg_frames_ = self.seg_frames

        def _zero_scatter(const_rows, feats, swave, zslots, zpos):
            """Write conv(0) feature rows + zero sample rows for the
            zero-segment batch (scratch-padded; ~free when all-scratch)."""
            zidx = (zpos[:, None] + seg_arange) % ring_frames_
            feats = feats.at[zslots[:, None], zidx].set(
                jnp.broadcast_to(const_rows[None].astype(feats.dtype),
                                 (zslots.shape[0],) + const_rows.shape))
            if escalate_on:
                if tail_rows_:
                    ztidx = (zpos[:, None] + seg_frames_
                             + jnp.arange(tail_rows_, dtype=jnp.int32)) \
                        % ring_frames_
                    swave = swave.at[zslots[:, None], ztidx].set(
                        jnp.zeros((zslots.shape[0], tail_rows_, stride_),
                                  swave.dtype))
                swave = swave.at[zslots[:, None], zidx].set(
                    jnp.zeros((zslots.shape[0], seg_frames_, stride_),
                              swave.dtype))
            return feats, swave

        def extend(cp, const_rows, feats, swave, segs, slots, frame_pos,
                   zslots, zpos):
            # r4: the zero-segment const scatter rides INSIDE the live
            # extend dispatch (XLA overlaps it under the conv; saves the
            # separate dispatch). Writes happen const-FIRST so a live
            # segment's first sample-ring row overwrites the preceding
            # zero segment's tail row — the same real-data-wins order as
            # the single-batch semantics.
            feats, swave = _zero_scatter(const_rows, feats, swave,
                                         zslots, zpos)
            waves = _decode(segs)
            new = conv.apply({"params": cp}, waves)
            idx = (frame_pos[:, None] + seg_arange) % ring_frames_
            feats = feats.at[slots[:, None], idx].set(
                new.astype(feats.dtype))
            if escalate_on:
                if tail_rows_:
                    tail = segs[:, seg_frames_ * stride_:]
                    tail = jnp.pad(tail, ((0, 0), (0, tail_pad)))
                    tidx = (frame_pos[:, None] + seg_frames_
                            + jnp.arange(tail_rows_, dtype=jnp.int32)) \
                        % ring_frames_
                    swave = swave.at[slots[:, None], tidx].set(
                        tail.reshape(-1, tail_rows_, stride_))
                rows = segs[:, :seg_frames_ * stride_].reshape(
                    -1, seg_frames_, stride_)
                swave = swave.at[slots[:, None], idx].set(rows)
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
        # extend instead of allocating fresh ring buffers per call.
        # The raw closures are kept for the serving-artifact export
        # (cli/export.py::export_serving serializes them via jax.export;
        # donation is a perf-only property the artifact path drops).
        self._extend_fn = extend
        self._score_fn = score
        self._extend = jax.jit(extend, donate_argnums=(2, 3))
        self._score = jax.jit(score)

        # ----- r4 zero-segment fastpath: an EXACT-zero segment (telephony
        # DTX dead air; 0 encodes to 0 in every transport incl. mulaw) has
        # a constant conv output — VALID convs over an all-zero segment
        # produce identical frames — so such segments skip the conv
        # entirely: a scatter-only program writes the precomputed
        # conv(0-segment) feature rows (+ zero sample-ring rows). And when
        # the remaining LIVE segments fit half the extend batch, the
        # (shape-polymorphic) extend jit dispatches at the half shape —
        # dispatch cost is ~linear in rows (PERFORMANCE.md esc-floor
        # decomposition). Both paths are bit-exact by construction
        # (tests/test_serving.py::test_zero_segment_fastpath_exact).
        self._fastpath = bool(extend_fastpath)
        # exported (fixed-shape, AOT) programs can't take sub-shapes;
        # cli/export.py::load_serving clears this, which disables ALL
        # THREE sub-shape dispatch families — the extend half/quarter
        # fastpath AND the score/escalation rung ladders below
        self._subshape_ok = True
        # r4 extend ladder: `extend_rungs` successive halvings of the live
        # extend shape. The default quarter rung is measured worth
        # 25.6 -> 21.4 device-ms/tick at S=512 gated 75%-silence (+20%
        # capacity, PERFORMANCE.md); each rung is one more warmup compile
        # of the same shape-polymorphic extend jit and costs nothing per
        # tick when it doesn't engage (live rows pick the smallest fit).
        self._extend_rungs = _shape_ladder(self.extend_batch,
                                           extend_rungs, "extend", n_)
        # score/escalation ladders (opt-in): with the energy gate the due
        # LOUD window count is workload-dependent, and a half-empty
        # fixed-shape score dispatch costs the same as a full one
        # (PERFORMANCE.md operational rule 1). Each configured rung is one
        # more warmup compile of the (expensive) score/esc program, so
        # these default OFF; turn on for bursty / diurnal workloads where
        # the loud concurrency routinely undershoots the provisioned
        # score_batch.
        self._score_rungs = _shape_ladder(self.score_batch, score_rungs,
                                          "score", n_)
        self._esc_rungs = _shape_ladder(self.esc_batch, esc_rungs,
                                        "escalate", n_)
        # ---- adaptive provisioning (r5, VERDICT r4 item 2): the engine
        # watches its own live-row telemetry and DEEPENS the rung ladders
        # to match observed demand, so the measured hand-tuned best
        # points (score_rungs/esc_rungs on under-filled workloads,
        # PERFORMANCE.md "shape ladders") no longer need an operator.
        # Mechanics: EMAs of live rows per dispatch family update on
        # every poll that dispatches that family; after ``provision_after``
        # polls of evidence (hysteresis — short bursts and test runs never
        # trigger), each family whose EMA sits below half its smallest
        # compiled shape gains rungs until one fits the EMA, within a
        # total compile budget (each new rung = one compile at first
        # engagement). Smallest-fitting-rung dispatch (existing mechanics)
        # then does the per-poll adaptation — cost is ~linear per row
        # (esc-floor probe), so matching the residual chunk IS the
        # measured win. Sub-shape score/esc dispatches retile XLA fusion
        # (~1e-6 score drift, same class as the opt-in rungs); pass
        # auto_provision=False for fixed-shape bit-stability.
        self._auto_provision = bool(auto_provision)
        self._provision_after = max(int(provision_after), 1)
        self._ap_polls = 0
        self._ap_budget = 6  # max auto-added rungs (compile cap)
        self._ap_ema = {"score": None, "escalate": None, "extend": None}
        self._const_rows = None  # conv(zero segment) rows, derived lazily
        # placeholder for calls before derivation (the zero-batch rows
        # those calls write are all scratch, so the values never matter;
        # swapping in the derived rows later changes values, not shapes)
        self._const_zero = jnp.zeros((self.seg_frames, self._channels),
                                     model.dtype)

        # standalone const scatter for ticks with ONLY zero segments (a
        # folded dispatch would pay the conv on an all-padding batch)
        self._extend_const = jax.jit(_zero_scatter, donate_argnums=(1, 2))

        if self._escalate:
            esc_model, esc_params, esc_stats = escalate
            if mesh is not None:
                esc_params = jax.device_put(esc_params, self._replicated)
                if esc_stats:
                    esc_stats = jax.device_put(esc_stats, self._replicated)
            self._esc_params = esc_params
            self._esc_stats = esc_stats
            dur_arange = jnp.arange(self.duration, dtype=jnp.int32)
            ring_samples_ = self.ring_samples

            duration_ = self.duration

            def score_esc(p, stats, swave, slots, start_frames):
                variables = {"params": p}
                if stats:
                    variables["batch_stats"] = stats
                flat = swave.reshape(swave.shape[0], ring_samples_)
                if esc_gather == "slice":
                    # r4: row-gather the B slot rows (contiguous), then a
                    # vmapped dynamic_slice on the doubled row handles the
                    # ring wrap — lowers to B contiguous slices instead of
                    # B x duration per-ELEMENT gather: measured 25.0 ->
                    # 4.0 ms at B=128 (tools/ gather shootout,
                    # PERFORMANCE.md), bit-exact
                    rows = flat[slots]  # (B, ring_samples)
                    dbl = jnp.concatenate([rows, rows], axis=1)
                    waves = jax.vmap(
                        lambda r, s: jax.lax.dynamic_slice(
                            r, (s * stride_,), (duration_,)))(
                        dbl, start_frames)
                    waves = _decode(waves)
                else:
                    # "flat": per-sample gather on the contiguous reshape —
                    # the historically proven fallback (a (B, rows, 320)
                    # row-granular gather reproducibly faulted the TPU
                    # worker at S=1024 in r3; this flat form and the
                    # "slice" form above are both verified at that scale,
                    # PERFORMANCE.md)
                    sidx = (start_frames[:, None] * stride_ + dur_arange) \
                        % ring_samples_
                    waves = _decode(flat[slots[:, None], sidx])
                logits = esc_model.apply(variables, waves, train=False)
                return logits[:, 1]

            self._score_esc_fn = score_esc
            self._score_esc = jax.jit(score_esc)

        self._slots: Dict[int, _StreamState] = {}
        self._free = collections.deque(range(max_streams))
        self._rr = 0  # round-robin offset; advances once per poll
        # batch placement: shard batch rows over the mesh axis (each chip
        # processes its share); single-chip = plain transfer
        if self._batch_sharding is not None:
            self._put = lambda a: jax.device_put(np.asarray(a),
                                                 self._batch_sharding)
        else:
            self._put = jnp.asarray
        # cumulative device-dispatch counts (capacity accounting: pairs
        # with :meth:`device_costs` to split compute from relay/host time)
        self.dispatch_counts = {"extend": 0, "extend_const": 0,
                                "score": 0, "escalate": 0}
        # actual dispatch rows per counter — rung NAMES are positional
        # (see _shape_ladder: mesh rounding can make a "half" rung much
        # smaller than full/2); read rows from here, not from the name
        self.rung_rows = {"extend": self.extend_batch,
                          "extend_const": self.extend_batch,
                          "score": self.score_batch,
                          "escalate": self.esc_batch}
        for _rb, _nm in (self._extend_rungs + self._score_rungs
                         + self._esc_rungs):
            self.dispatch_counts.setdefault(_nm, 0)
            self.rung_rows[_nm] = _rb
        self.dispatch_counts.setdefault("extend_half", 0)
        self.dispatch_counts.setdefault("extend_quarter", 0)

    # ---------------------------------------------------------- memory guard

    def _estimate_hbm(self, model, cfg, params, escalate) -> int:
        """Coarse device-memory estimate (bytes) for this configuration.

        Counts what dominates at scale — parameter trees, the two rings,
        the extend-batch conv activations, and the score/escalation
        forward activations (2x margin on activations for XLA temps).
        It is deliberately conservative-but-approximate: its job is to
        turn an order-of-magnitude misconfiguration (e.g. the S=1024
        cascade that faulted a 16 GiB v5e worker, PERFORMANCE.md) into a
        ValueError with numbers, not to model the allocator exactly.
        """
        leaf_bytes = lambda tree: sum(
            l.size * np.dtype(l.dtype).itemsize
            for l in jax.tree_util.tree_leaves(tree))
        itemsize = np.dtype(model.dtype).itemsize
        total = leaf_bytes(params)
        if self.batch_stats:
            total += leaf_bytes(self.batch_stats)

        # rings (feature ring in model dtype; sample ring in transport
        # dtype); under a mesh the slot axis shards, so each chip holds 1/n
        total += (self.max_streams + 1) * self.ring_frames \
            * self._channels * itemsize // self._mesh_n
        total += (self.max_streams + 1) * self.ring_frames * self.stride \
            * np.dtype(self._tdtype).itemsize // self._mesh_n

        # extend: conv activations per segment (sum over layer outputs)
        t, conv_act = self.seg_samples, self.seg_samples
        for (c, k, s) in cfg.conv_layers:
            t = (t - k) // s + 1
            conv_act += t * c
        act = self.extend_batch * conv_act * 4  # conv runs f32-ish

        # score: window gather + transformer working set (per live layer:
        # qkv/ffn activations + attention logits; scan keeps ~2 alive)
        embed = cfg.encoder_embed_dim
        ffn = cfg.encoder_ffn_dim
        wf = self.win_frames
        act += self.score_batch * wf * self._channels * itemsize
        act += 2 * self.score_batch * (
            wf * embed * 4 + cfg.encoder_heads * wf * wf + wf * ffn) \
            * itemsize

        if escalate is not None:
            esc_model, esc_params, esc_stats = escalate
            total += leaf_bytes(esc_params)
            if esc_stats:
                total += leaf_bytes(esc_stats)
            # flagship re-scores raw windows: conv over a full window +
            # its own transformer; approximate with this cfg's dims
            # scaled to the window length (the escalation model's config
            # isn't available here)
            scale = self.duration / max(self.seg_samples, 1)
            act += self.esc_batch * conv_act * scale * 4
            act += 2 * self.esc_batch * (
                wf * embed * 4 + cfg.encoder_heads * wf * wf + wf * ffn) \
                * itemsize

        # batch axes shard over the mesh too (params stay replicated)
        return int(total + 2 * act / self._mesh_n)

    # ------------------------------------------------------------- lifecycle

    def open_stream(self, stream_id=None) -> int:
        """Claim a slot for a new stream; returns the handle."""
        if not self._free:
            raise RuntimeError(
                f"all {self.max_streams} stream slots are busy")
        slot = self._free.popleft()
        self._slots[slot] = _StreamState(
            stream_id if stream_id is not None else slot, self._tdtype,
            head_cap=self.duration)
        return slot

    def close_stream(self, handle: int, flush: bool = False) -> None:
        """Release a slot. ``flush=True`` finishes scoring with the offline
        scorers' window semantics (engine/streaming.py frame_starts):

        - no samples pushed: the slot frees immediately, no window;
        - fewer than one window of samples: the stream is repeat-TILED
          into exactly one window (like the dataset duration-fit);
        - otherwise: hop-grid windows plus, when the grid doesn't reach
          the end, a final tail-aligned window at ``total - duration``
          snapped down to the conv frame grid (sub-frame remainder
          zero-padded — identical to the offline scorer's segment pad).

        The slot frees once its remaining windows drain via :meth:`poll`.
        """
        st = self._slots.get(handle)
        if st is None:
            raise KeyError(f"no open stream at slot {handle}")
        if st.final_win is not None and flush:
            # flush already in progress — idempotent (re-running the tail
            # setup below would rebuild the buffer from the head retention
            # and corrupt the documented tiling/tail semantics)
            return
        st.coalesce()
        total = st.next_seg * self.seg_hop + len(st.buf)
        if not flush or total == 0:
            # nothing pushed: a fabricated all-zero window would pollute
            # per-stream aggregates — just free the slot
            del self._slots[handle]
            self._free.append(handle)
            return
        if total <= self.duration:
            if st.next_win >= 1:
                # exactly one window of samples and it was already scored
                # (total == duration): nothing left to flush
                del self._slots[handle]
                self._free.append(handle)
                return
            # short stream: repeat-tile into ONE window (offline parity:
            # streaming.frame_windows / dataset adjust_duration). The ring
            # rows are simply re-extracted from the tiled wave.
            wave = np.concatenate(st.head)[:total]
            reps = -(-self.duration // total)
            st.buf = np.ascontiguousarray(
                np.tile(wave, reps)[: self.duration])
            st.next_seg = 0
            st.final_win = 1
            st.tail_frame = None
            last_win = 0
        else:
            last_win = (total - self.duration) // self.hop
            st.final_win = last_win + 1
            s_tail = (total - self.duration) - ((total - self.duration)
                                                % self.stride)
            if s_tail > last_win * self.hop:
                # the hop grid doesn't reach the end: one extra window
                # tail-aligned on real audio (frame_starts semantics)
                st.tail_frame = s_tail // self.stride
                st.final_win += 1
        # pad so the needed frames land on a segment boundary (a partial
        # final segment would never be extracted), then let poll() drain
        if st.tail_frame is not None:
            frames_needed = st.tail_frame + self.win_frames
        else:
            frames_needed = last_win * self.hop_frames + self.win_frames
        segs_needed = -(-frames_needed // self.seg_frames)
        need = self._seg_geometry(segs_needed)[2]
        have = st.next_seg * self.seg_hop + len(st.buf)
        if need > have:
            st.buf = np.concatenate(
                [st.buf, np.zeros(need - have, self._tdtype)])

    @property
    def active_streams(self) -> int:
        return len(self._slots)

    def pending_samples(self, handle: int) -> int:
        """Samples pushed but not yet extracted into conv segments —
        the host-side ingest backlog. Stays ~one hop when polling keeps
        up; grows without bound if a producer outruns the engine (the
        network daemon uses this to shed overrunning streams)."""
        st = self._slots.get(handle)
        return int(st.pending_samples) if st is not None else 0

    def is_open(self, handle: int) -> bool:
        """True while ``handle`` owns a slot (including a closing stream
        whose final windows are still draining). Slot numbers are reused
        after release, so callers tracking lifetimes must check this
        before opening new streams (see engine/netserve.py)."""
        return handle in self._slots

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
            if self._mulaw:
                if samples.dtype == np.int16:  # raw PCM -> float first
                    samples = samples.astype(np.float32) * (1.0 / 32768.0)
                samples = mulaw_encode(samples)
            elif self._tdtype is np.int16:  # float wave -> 16-bit PCM
                samples = np.clip(np.rint(samples * 32768.0),
                                  -32768, 32767).astype(np.int16)
            elif samples.dtype == np.int16:
                # raw PCM under the float32 transport: dequantize HERE
                # (under int16 transport the device extend does x/32768;
                # a bare astype would feed the model +-32768-scale waves)
                samples = samples.astype(np.float32) * (1.0 / 32768.0)
            else:
                samples = samples.astype(np.float32)
        # O(1) per push: chunks coalesce once per poll, not per call
        st.chunks.append(samples)
        st.chunks_len += len(samples)
        if st.head_len < st.head_cap:
            # retain the first window of samples for flush-time tiling
            st.head.append(samples)
            st.head_len += len(samples)

    def _win_start_frame(self, st, w):
        """Ring start frame of window ``w`` — hop grid, except a
        flush-time tail-aligned final window (close_stream)."""
        if st.tail_frame is not None and w == st.final_win - 1:
            return st.tail_frame
        return w * self.hop_frames

    def _iter_slots(self):
        """Slots in round-robin rotated order (rotation advances once per
        poll): under sustained overload every stream gets batch capacity
        in turn instead of high-index slots starving."""
        items = list(self._slots.items())
        if len(items) > 1:
            off = self._rr % len(items)
            items = items[off:] + items[:off]
        return items

    def _due_segments(self, limit=None):
        """(slot, seg_index, segment_samples) for extractable segments,
        oldest-first per stream, honoring ring backpressure; stops once
        ``limit`` segments are collected (poll never needs more than one
        extend batch, so enumerating a deep backlog would be waste)."""
        out = []
        for slot, st in self._iter_slots():
            st.coalesce()
            k = st.next_seg
            # buf[0] is absolute sample k*seg_hop; segment k spans
            # [k*seg_hop, k*seg_hop + seg_samples)
            off = 0
            while len(st.buf) - off >= self.seg_samples:
                # backpressure: frames [k*sf, (k+1)*sf) may not overwrite
                # frames the oldest pending window still needs (escalation
                # margin covers the sample-ring's sub-frame tail overrun)
                oldest_needed = self._win_start_frame(st, st.next_win)
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
        if self.gate_msq is not None:
            # segment k's NEW samples are its first seg_hop (the rest is
            # receptive-field overlap with segment k+1) — their mean
            # square stands in for frames [k*seg_frames, (k+1)*seg_frames)
            for slot, k, samples in taken:
                self._slots[slot].engsq[k] = self._mean_square(
                    samples[:self.seg_hop])
        by_slot = collections.Counter(slot for slot, _, _ in taken)
        for slot, n in by_slot.items():
            st = self._slots[slot]
            st.next_seg += n
            st.buf = st.buf[n * self.seg_hop:]

    def _mean_square(self, samples) -> float:
        """Mean square of transport-encoded samples on the float [-1, 1]
        amplitude scale (matches the device-side dequant exactly for
        float32/int16; continuous mu-law decode for mulaw8)."""
        if len(samples) == 0:
            return 0.0
        if self._tdtype is np.int16:
            x = samples.astype(np.float32) * (1.0 / 32768.0)
        elif self._mulaw:
            y = np.clip(samples.astype(np.float32), -127.0, 127.0) \
                * (1.0 / 127.0)
            x = np.sign(y) * np.expm1(np.abs(y) * np.log1p(_MU)) \
                * (1.0 / _MU)
        else:
            x = samples
        return float(np.mean(np.square(x, dtype=np.float32)))

    def _due_windows(self, limit=None):
        """Scoreable (slot, window, start_frame) triples in round-robin
        order; stops at ``limit`` (poll uses one score batch per call —
        enumerating a deep backlog each poll would be waste, same
        reasoning as :meth:`_due_segments`)."""
        out = []
        for slot, st in self._iter_slots():
            frames_done = st.next_seg * self.seg_frames
            w = st.next_win
            while st.final_win is None or w < st.final_win:
                start = self._win_start_frame(st, w)
                if start + self.win_frames > frames_done:
                    break
                out.append((slot, w, start))
                if limit is not None and len(out) >= limit:
                    return out
                w += 1
        return out

    def _window_msq(self, st, start: int) -> Optional[float]:
        """Mean-square energy of the window starting at frame ``start``
        from per-segment sums; None when a covering segment's energy is
        unknown (then score it — never silently gate on missing data)."""
        sf = self.seg_frames
        k0 = start // sf
        k1 = -(-(start + self.win_frames) // sf)
        total = 0.0
        for k in range(k0, k1):
            e = st.engsq.get(k)
            if e is None:
                return None
            total += e
        return total / max(1, k1 - k0)

    def _due_windows_gated(self, limit):
        """Gate-aware :meth:`_due_windows`: returns (to_score, gated)
        where gated windows resolve without device work and don't spend
        batch slots. Per-stream window order is preserved — a stream
        stops contributing at its first loud window that doesn't fit the
        batch, so next_win always advances contiguously."""
        to_score, gated = [], []
        gate_cap = 4 * self.score_batch  # bound per-poll host work
        for slot, st in self._iter_slots():
            frames_done = st.next_seg * self.seg_frames
            w = st.next_win
            while st.final_win is None or w < st.final_win:
                start = self._win_start_frame(st, w)
                if start + self.win_frames > frames_done:
                    break
                msq = self._window_msq(st, start)
                if msq is not None and msq < self.gate_msq:
                    if len(gated) >= gate_cap:
                        return to_score, gated
                    gated.append((slot, w, start))
                else:
                    if len(to_score) >= limit:
                        break  # this stream stops; others may still gate
                    to_score.append((slot, w, start))
                w += 1
        return to_score, gated

    def _prune_engsq(self, slot) -> None:
        """Drop per-segment energies older than anything next_win (or a
        not-yet-extracted segment's window) can still need."""
        st = self._slots.get(slot)
        if st is None:
            return
        if st.final_win is not None and st.next_win >= st.final_win:
            st.engsq.clear()
            return
        oldest = self._win_start_frame(st, st.next_win) // self.seg_frames
        for k in [k for k in st.engsq if k < oldest]:
            del st.engsq[k]

    def _scratch_batch(self, n):
        """(slots, pos) scratch-padding arrays of length ``n``."""
        return (self._put(np.full((n,), self._scratch, np.int32)),
                self._put(np.zeros((n,), np.int32)))

    def _ensure_const_rows(self) -> None:
        """Derive the conv(zero-segment) feature rows once per weight set:
        run the already-compiled extend on an all-zero scratch batch and
        capture the scratch slot's rows (no extra model compile)."""
        if self._const_rows is not None:
            return
        seg0 = self._put(np.zeros((self.extend_batch, self.seg_samples),
                                  self._tdtype))
        slots, pos = self._scratch_batch(self.extend_batch)
        zslots, zpos = self._scratch_batch(self.extend_batch)
        self._feats, self._swave = self._extend(
            self._conv_params, self._const_zero, self._feats, self._swave,
            seg0, slots, pos, zslots, zpos)
        self._const_rows = jnp.array(
            self._feats[self._scratch, :self.seg_frames])

    # ------------------------------------------------ adaptive provisioning

    def _ap_obs(self, fam: str, rows: int) -> None:
        """Update the live-row EMA for a dispatch family (polls where the
        family did not dispatch contribute nothing — an idle engine must
        not drift the EMA to zero and deepen ladders for free)."""
        prev = self._ap_ema[fam]
        self._ap_ema[fam] = rows if prev is None \
            else prev + (rows - prev) * (1.0 / 16.0)

    def _maybe_auto_provision(self) -> None:
        """Deepen rung ladders to match observed demand (see the
        constructor note). Runs the check every ``provision_after`` polls;
        each added rung spends one unit of the compile budget."""
        if (not self._auto_provision or not self._subshape_ok
                or self._ap_budget <= 0
                or self._ap_polls < self._provision_after):
            return
        self._ap_polls = 0
        n_ = self._mesh_n
        added = []
        for fam, full, attr in (("score", self.score_batch, "_score_rungs"),
                                ("extend", self.extend_batch,
                                 "_extend_rungs"),
                                ("escalate", self.esc_batch, "_esc_rungs")):
            ema = self._ap_ema[fam]
            if ema is None or (fam == "extend" and not self._fastpath):
                continue  # extend sub-shapes only dispatch with fastpath
            rungs = getattr(self, attr)
            depth = len(rungs)
            while self._ap_budget > 0 and depth < 4:
                smallest = rungs[-1][0] if rungs else full
                # deepen while the NEXT rung (smallest/2) would still fit
                # the typical demand — a steady demand of exactly half
                # the current shape is the canonical win (a 50%-silence
                # provisioning serving 75% silence dispatches exactly
                # score_batch/2 rows per poll)
                if ema > smallest / 2:
                    break  # a compiled shape already fits the demand
                deeper = _shape_ladder(full, depth + 1, fam, n_)
                if len(deeper) <= len(rungs):
                    break  # mesh-multiple floor reached
                depth += 1
                self._ap_budget -= 1
                added.append(deeper[-1][1])
                rungs = deeper
            if len(rungs) > len(getattr(self, attr)):
                setattr(self, attr, rungs)
                for rb, nm in rungs:
                    self.dispatch_counts.setdefault(nm, 0)
                    self.rung_rows[nm] = rb
        if added:
            print(f"[serving] auto-provision: added dispatch rungs "
                  f"{added} from observed load (EMAs "
                  f"{ {k: round(v, 1) for k, v in self._ap_ema.items() if v is not None} }); "
                  f"pass auto_provision=False for fixed shapes",
                  file=sys.stderr)

    def provisioning(self) -> Dict[str, object]:
        """Current dispatch-shape provisioning (observability for the
        daemon stats line and operators): rung row-ladders per family,
        remaining auto-deepening budget, and the live-row EMAs driving
        adaptation."""
        return {
            "score": [self.score_batch] + [r for r, _ in self._score_rungs],
            "extend": [self.extend_batch]
            + [r for r, _ in self._extend_rungs],
            "escalate": ([self.esc_batch]
                         + [r for r, _ in self._esc_rungs]
                         if self._escalate else []),
            "auto": self._auto_provision and self._subshape_ok,
            "auto_budget_left": self._ap_budget,
            "ema": {k: round(v, 1) for k, v in self._ap_ema.items()
                    if v is not None},
        }

    def poll(self) -> List[WindowScore]:
        """Run at most one ``extend`` (+ one zero-segment const scatter)
        and one ``score`` dispatch; returns the completed window scores.
        Call repeatedly (or :meth:`drain`) to work through a backlog
        larger than the batch sizes."""
        results: List[WindowScore] = []
        self._last_poll_work = False
        self._ap_polls += 1
        self._maybe_auto_provision()
        self._rr += 1  # rotate fairness offset (see _iter_slots)
        segs = self._due_segments(limit=self.extend_batch)
        if segs:
            self._last_poll_work = True
            if self._fastpath:
                live = [s for s in segs if s[2].any()]
                zero_segs = [s for s in segs if not s[2].any()]
            else:
                live, zero_segs = segs, []
            zslots_np = np.full((self.extend_batch,), self._scratch,
                                np.int32)
            zpos_np = np.zeros((self.extend_batch,), np.int32)
            if zero_segs:
                self._ensure_const_rows()
                self.zero_segments += len(zero_segs)
                for i, (slot, seg_idx, _s) in enumerate(zero_segs):
                    zslots_np[i] = slot
                    zpos_np[i] = (seg_idx * self.seg_frames) \
                        % self.ring_frames
            if live:
                self._ap_obs("extend", len(live))
                # the zero-segment const scatter rides inside this
                # dispatch (program writes const rows FIRST — the
                # real-data-wins order of the single-batch semantics)
                nb, key = self.extend_batch, "extend"
                if self._fastpath and self._subshape_ok:
                    # ladder rungs are descending; take the smallest that
                    # still fits the live rows
                    for rb, rname in self._extend_rungs:
                        if len(live) <= rb:
                            nb, key = rb, rname
                        else:
                            break
                seg_mat = np.zeros((nb, self.seg_samples), self._tdtype)
                slots = np.full((nb,), self._scratch, np.int32)
                pos = np.zeros((nb,), np.int32)
                for i, (slot, seg_idx, samples) in enumerate(live):
                    seg_mat[i] = samples
                    slots[i] = slot
                    pos[i] = (seg_idx * self.seg_frames) % self.ring_frames
                self._feats, self._swave = self._extend(
                    self._conv_params,
                    (self._const_rows if self._const_rows is not None
                     else self._const_zero),
                    self._feats, self._swave,
                    self._put(seg_mat), self._put(slots), self._put(pos),
                    self._put(zslots_np), self._put(zpos_np))
                self.dispatch_counts[key] += 1
            elif zero_segs:
                # all-silent tick: scatter-only program (a folded dispatch
                # would pay the conv on an all-padding batch)
                self._feats, self._swave = self._extend_const(
                    self._const_rows, self._feats, self._swave,
                    self._put(zslots_np), self._put(zpos_np))
                self.dispatch_counts["extend_const"] += 1
            self._consume(segs)

        gated = []
        if self.gate_msq is None:
            wins = self._due_windows(limit=self.score_batch)
        else:
            wins, gated = self._due_windows_gated(self.score_batch)
            if gated:
                self._last_poll_work = True
                self.gated_windows += len(gated)
                for slot, w, start in gated:
                    st = self._slots[slot]
                    st.next_win = max(st.next_win, w + 1)
                    results.append(WindowScore(st.stream_id,
                                               start * self.stride,
                                               self.gate_score,
                                               False, True))
        if wins:
            self._last_poll_work = True
            self._ap_obs("score", len(wins))
            nbs, skey = self.score_batch, "score"
            if self._subshape_ok:
                for rb, rname in self._score_rungs:
                    if len(wins) <= rb:
                        nbs, skey = rb, rname
                    else:
                        break
            slots = np.full((nbs,), self._scratch, np.int32)
            starts = np.zeros((nbs,), np.int32)
            for i, (slot, w, start) in enumerate(wins):
                slots[i] = slot
                starts[i] = start % self.ring_frames
            scores = np.array(self._score(
                self.params, self.batch_stats, self._feats,
                self._put(slots), self._put(starts)))
            self.dispatch_counts[skey] += 1
            escalated = np.zeros(len(wins), bool)
            if self._escalate:
                # same-poll escalation: the ring rows are still protected
                # by backpressure (no extend ran since the gather above)
                due = [i for i in range(len(wins))
                       if abs(float(scores[i]) - self.escalate_center)
                       <= self.escalate_band]
                if due:
                    # the residual (last) chunk is what padding wastes on;
                    # its typical size is what the esc ladder should reach
                    self._ap_obs("escalate",
                                 (len(due) - 1) % self.esc_batch + 1)
                for c0 in range(0, len(due), self.esc_batch):
                    chunk = due[c0: c0 + self.esc_batch]
                    # esc cost is ~linear per row with no fixed floor
                    # (PERFORMANCE.md esc-floor probe), so padding the
                    # final part-full chunk pays real time — drop to the
                    # smallest configured rung that fits it
                    nbe, ekey = self.esc_batch, "escalate"
                    if self._subshape_ok:
                        for rb, rname in self._esc_rungs:
                            if len(chunk) <= rb:
                                nbe, ekey = rb, rname
                            else:
                                break
                    eslots = np.full((nbe,), self._scratch, np.int32)
                    estarts = np.zeros((nbe,), np.int32)
                    for j, i in enumerate(chunk):
                        eslots[j] = slots[i]
                        estarts[j] = starts[i]
                    esc_scores = np.asarray(self._score_esc(
                        self._esc_params, self._esc_stats, self._swave,
                        self._put(eslots), self._put(estarts)))
                    self.dispatch_counts[ekey] += 1
                    for j, i in enumerate(chunk):
                        scores[i] = esc_scores[j]
                        escalated[i] = True
            for i, (slot, w, start) in enumerate(wins):
                st = self._slots[slot]
                # max(): a later GATED window of this stream may already
                # have advanced past this scored one within this poll
                st.next_win = max(st.next_win, w + 1)
                results.append(WindowScore(st.stream_id,
                                           start * self.stride,
                                           float(scores[i]),
                                           bool(escalated[i])))
        if gated and wins:
            # gated results were appended before the score dispatch ran,
            # so a stream's gated window w+1 can precede its scored
            # window w in `results`. Internal state is order-safe (the
            # max() above) but daemon clients see per-stream timestamps:
            # reorder each stream's own entries by start_sample, keeping
            # the positions (and cross-stream interleave) unchanged.
            by_stream: Dict[object, List[int]] = {}
            for idx, r in enumerate(results):
                by_stream.setdefault(r.stream_id, []).append(idx)
            for idxs in by_stream.values():
                if len(idxs) > 1:
                    vals = sorted((results[i] for i in idxs),
                                  key=lambda r: r.start_sample)
                    for i, v in zip(idxs, vals):
                        results[i] = v
        if self.gate_msq is not None:
            for slot in ({s for s, _, _ in wins}
                         | {s for s, _, _ in gated}):
                self._prune_engsq(slot)
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
            if ((st.final_win is None or w < st.final_win)
                    and self._win_start_frame(st, w) + self.win_frames
                    <= frames_done):
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

    def swap_model(self, params, batch_stats=None, *, escalate=None):
        """Hot checkpoint swap: replace the weights without recompiling,
        reallocating rings, or dropping streams (zero-downtime model
        update — e.g. a daemon reloading a retrained checkpoint on
        SIGHUP, cli/daemon.py).

        The compiled programs take params as CALL ARGUMENTS (CLAUDE.md:
        never close jit over param trees), so any checkpoint with the
        same architecture — identical param-tree structure, shapes and
        dtypes — swaps in between polls with no recompile. ``escalate``
        is an optional ``(esc_params, esc_stats)`` pair for the cascade
        flagship (only valid when the engine was built with one).

        Transition semantics: segments extended BEFORE the swap keep
        their old-conv features in the ring, so windows straddling the
        swap are scored by the new head on old-conv features; windows
        whose segments all arrive after the swap are pure new-model.
        Escalated windows re-run fully through the new flagship from
        raw samples either way. Not thread-safe against a concurrent
        poll — callers serialize (the daemon swaps under its tick lock).
        """
        self._check_tree("params", self.params, params)
        stats = batch_stats if batch_stats is not None else {}
        # emptiness of batch_stats is baked into the compiled score
        # program (traced python bool), so the structure must match too
        self._check_tree("batch_stats", self.batch_stats, stats)
        if escalate is not None:
            if not self._escalate:
                raise ValueError("swap_model(escalate=...) on an engine "
                                 "built without a cascade")
            esc_params, esc_stats = escalate
            self._check_tree("escalate params", self._esc_params,
                             esc_params)
            self._check_tree("escalate batch_stats", self._esc_stats,
                             esc_stats or {})
            if self._mesh is not None:
                esc_params = jax.device_put(esc_params, self._replicated)
                if esc_stats:
                    esc_stats = jax.device_put(esc_stats, self._replicated)
            self._esc_params = esc_params
            self._esc_stats = esc_stats
        self.params = params
        self.batch_stats = stats
        self._conv_params = params["ssl_model"]["feature_extractor"]
        self._const_rows = None  # conv(0) rows follow the new conv weights
        self.model_swaps += 1

    @staticmethod
    def _check_tree(what, old, new):
        """Same treedef + leaf shapes/dtypes, or a ValueError naming the
        first mismatch (the compiled programs' signatures are fixed)."""
        paths_old = jax.tree_util.tree_flatten_with_path(old)
        paths_new = jax.tree_util.tree_flatten_with_path(new)
        if paths_old[1] != paths_new[1]:
            raise ValueError(
                f"swap_model: {what} tree structure differs from the "
                f"serving model's (different architecture/quantization "
                f"mode?) — rebuild the engine instead")
        for (kp, a), (_, b) in zip(paths_old[0], paths_new[0]):
            sa, sb = jnp.shape(a), jnp.shape(b)
            da, db = jnp.result_type(a), jnp.result_type(b)
            if sa != sb or da != db:
                name = jax.tree_util.keystr(kp)
                raise ValueError(
                    f"swap_model: {what}{name} is {sb}/{db}, the "
                    f"compiled programs expect {sa}/{da} — same "
                    f"architecture checkpoints only")

    def warmup(self) -> None:
        """Compile every program once (scratch-only batches) so the first
        real poll is not a compile."""
        zslots, zpos = self._scratch_batch(self.extend_batch)
        slots, pos = self._scratch_batch(self.extend_batch)
        self._feats, self._swave = self._extend(
            self._conv_params, self._const_zero, self._feats, self._swave,
            self._put(np.zeros((self.extend_batch, self.seg_samples),
                               self._tdtype)),
            slots, pos, zslots, zpos)
        if self._fastpath:
            # the warmup extend above ran the all-zero scratch batch —
            # capture the conv(0) rows while they are fresh
            self._const_rows = jnp.array(
                self._feats[self._scratch, :self.seg_frames])
            self._feats, self._swave = self._extend_const(
                self._const_rows, self._feats, self._swave, zslots, zpos)
            if self._subshape_ok:
                for rb, _rname in self._extend_rungs:
                    hslots, hpos = self._scratch_batch(rb)
                    self._feats, self._swave = self._extend(
                        self._conv_params, self._const_rows, self._feats,
                        self._swave,
                        self._put(np.zeros((rb, self.seg_samples),
                                           self._tdtype)),
                        hslots, hpos, zslots, zpos)
        for sb in [self.score_batch] + [rb for rb, _ in self._score_rungs
                                        if self._subshape_ok]:
            jax.block_until_ready(np.asarray(self._score(
                self.params, self.batch_stats, self._feats,
                self._put(np.full((sb,), self._scratch, np.int32)),
                self._put(np.zeros((sb,), np.int32)))))
        if self._escalate:
            for eb in [self.esc_batch] + [rb for rb, _ in self._esc_rungs
                                          if self._subshape_ok]:
                jax.block_until_ready(np.asarray(self._score_esc(
                    self._esc_params, self._esc_stats, self._swave,
                    self._put(np.full((eb,), self._scratch, np.int32)),
                    self._put(np.zeros((eb,), np.int32)))))

    def device_costs(self, n: int = 10) -> Dict[str, float]:
        """Amortized ON-DEVICE cost (ms) of one dispatch of each compiled
        program at its configured batch size, keyed like
        :attr:`dispatch_counts`. Pipelines ``n`` scratch-row dispatches and
        forces one dependent host readback: per-dispatch relay latency
        (~30 ms on the remote link) amortizes away, so
        ``sum(device_costs[k] * dispatch_counts[k])`` is the chip-time a
        co-located deployment would pay — the number capacity claims should
        be made from, not relay-inflated wall p95. Scratch rows only: live
        stream state is untouched; safe to call mid-serve."""
        import time

        def force(x):
            return float(jnp.asarray(x).reshape(-1)[0].astype(jnp.float32))

        out: Dict[str, float] = {}
        self._ensure_const_rows()
        const = self._const_rows
        seg0 = self._put(np.zeros((self.extend_batch, self.seg_samples),
                                  self._tdtype))
        eslots, epos = self._scratch_batch(self.extend_batch)
        zslots, zpos = self._scratch_batch(self.extend_batch)
        self._feats, self._swave = self._extend(
            self._conv_params, const, self._feats, self._swave, seg0,
            eslots, epos, zslots, zpos)
        force(self._feats[self._scratch, 0])
        t0 = time.perf_counter()
        for _ in range(n):
            self._feats, self._swave = self._extend(
                self._conv_params, const, self._feats, self._swave, seg0,
                eslots, epos, zslots, zpos)
        force(self._feats[self._scratch, 0])
        out["extend"] = (time.perf_counter() - t0) / n * 1000.0

        if self._fastpath:
            self._feats, self._swave = self._extend_const(
                const, self._feats, self._swave, zslots, zpos)
            t0 = time.perf_counter()
            for _ in range(n):
                self._feats, self._swave = self._extend_const(
                    const, self._feats, self._swave, zslots, zpos)
            force(self._feats[self._scratch, 0])
            out["extend_const"] = (time.perf_counter() - t0) / n * 1000.0
            if self._subshape_ok:
                for rb, rname in self._extend_rungs:
                    hseg = self._put(np.zeros(
                        (rb, self.seg_samples), self._tdtype))
                    hslots, hpos = self._scratch_batch(rb)
                    self._feats, self._swave = self._extend(
                        self._conv_params, const, self._feats, self._swave,
                        hseg, hslots, hpos, zslots, zpos)
                    force(self._feats[self._scratch, 0])
                    t0 = time.perf_counter()
                    for _ in range(n):
                        self._feats, self._swave = self._extend(
                            self._conv_params, const, self._feats,
                            self._swave, hseg, hslots, hpos, zslots, zpos)
                    force(self._feats[self._scratch, 0])
                    out[rname] = (time.perf_counter() - t0) / n * 1000.0

        score_shapes = [(self.score_batch, "score")] \
            + (self._score_rungs if self._subshape_ok else [])
        for sb, sname in score_shapes:
            sslots = self._put(np.full((sb,), self._scratch, np.int32))
            sstarts = self._put(np.zeros((sb,), np.int32))
            force(self._score(self.params, self.batch_stats, self._feats,
                              sslots, sstarts))
            t0 = time.perf_counter()
            for _ in range(n):
                r = self._score(self.params, self.batch_stats,
                                self._feats, sslots, sstarts)
            force(r)
            out[sname] = (time.perf_counter() - t0) / n * 1000.0

        if self._escalate:
            esc_shapes = [(self.esc_batch, "escalate")] \
                + (self._esc_rungs if self._subshape_ok else [])
            for eb, ename in esc_shapes:
                cslots = self._put(np.full((eb,), self._scratch,
                                           np.int32))
                cstarts = self._put(np.zeros((eb,), np.int32))
                force(self._score_esc(self._esc_params, self._esc_stats,
                                      self._swave, cslots, cstarts))
                t0 = time.perf_counter()
                for _ in range(n):
                    r = self._score_esc(self._esc_params, self._esc_stats,
                                        self._swave, cslots, cstarts)
                force(r)
                out[ename] = (time.perf_counter() - t0) / n * 1000.0
        return out
