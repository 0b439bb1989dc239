"""Portable model export via ``jax.export`` (serialized StableHLO).

Packages the scoring function — raw bonafide logit, NO pre-emphasis, the
exact semantics of ``cli.main --is_score`` (ref ``produce_evaluation_file``,
``/root/reference/main.py:199-221``) — into a self-contained artifact: a
serialized program plus the checkpoint's weights as a msgpack sidecar
(``<out>.params``). The artifact runs under any jax.export-compatible
runtime (JAX on CPU/TPU, or downstream StableHLO consumers) with no
dependency on this repo's model code: the deployment story for the paper's
resource-limited targets, where the reference would re-install
torch+fairseq on the edge device.

    # flagship (teacher) scorer, symbolic batch, CPU+TPU lowering
    python -m rtdsd_tpu.cli.export --config cfg.yaml --ckpt runs/best \
        --out model.jaxexp

    # distilled student at a fixed batch, int8 MXU matmuls
    python -m rtdsd_tpu.cli.export --config kd.yaml --ckpt runs/last_kd \
        --student --w8a8 --batch 64 --out student.jaxexp

The default symbolic batch dimension (``--batch sym``) lets the serving
side pick its batch at run time. Weights are exported as call-time
*arguments*, not StableHLO constants: baking a 315M-param tree into the
program balloons the artifact past a GB and triggers the CLAUDE.md
jit-over-host-params landmine on the consumer (XLA constant-folds the
whole network at the edge box's first compile).
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def _avals(tree):
    """Shape/dtype skeleton of a param pytree, for export-time tracing."""
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        tree)


def export_scorer(module, variables, *, num_samples: int,
                  batch: Optional[int] = None,
                  platforms: Sequence[str] = ("cpu", "tpu")):
    """Export ``module``'s scoring forward as a ``jax.export.Exported``.

    ``batch=None`` exports a symbolic ("b") leading dimension; an int pins
    it. ``variables`` (params + batch_stats) become the program's FIRST
    argument — ``exported.call(variables, waves)`` — so the serialized
    program stays small and the consumer's compile never constant-folds
    the network (use :class:`ScoringArtifact` to load+call in one step).
    """
    from jax import export as jexport

    def score(variables, waves):
        return module.apply(variables, waves, train=False)[:, 1]

    if batch is None:
        b, = jexport.symbolic_shape("b")
    else:
        b = int(batch)
    arg = jax.ShapeDtypeStruct((b, int(num_samples)), jnp.float32)
    return jexport.export(jax.jit(score), platforms=tuple(platforms))(
        _avals(variables), arg)


def export_streaming(module, variables, cfg, *, duration: int,
                     hop: Optional[int] = None, seg_frames: int = 256,
                     platforms: Sequence[str] = ("cpu", "tpu")):
    """Export the incremental streaming scorer as TWO artifacts.

    Mirrors :class:`engine.streaming.IncrementalStreamingScorer`'s split:
    a conv-segment extractor ``(S, seg_samples) -> (S*seg_frames, C)`` with
    a symbolic segment count, and a window scorer
    ``(feats (F, C), idx (B, win_frames)) -> (B,)`` with symbolic F and B —
    the conv front-end runs ~1x real time once per stream and every
    grid-aligned window is a feature slice. Host glue (segmenting, grid
    snapping) is pure integer arithmetic recorded in the metadata;
    :class:`StreamingArtifact` is the in-repo reference runner. Both
    programs take ``variables`` as their first argument (see
    :func:`export_scorer` for why weights are not baked as constants).

    Returns ``(conv_exported, score_exported, meta_dict)``.
    """
    from jax import export as jexport

    from rtdsd_tpu.models.wav2vec2 import (ConvFeatureExtractor,
                                           conv_segment_geometry)

    if cfg.extractor_mode != "layer_norm":
        raise ValueError("streaming export requires the layer_norm "
                         "extractor (group_norm couples frames across the "
                         "whole window)")
    stride = cfg.total_stride
    if hop is None:
        hop = duration // 2
    if hop < stride:
        raise ValueError(f"hop {hop} is below the conv frame stride "
                         f"{stride}; window starts snap to the frame grid")

    conv = ConvFeatureExtractor(cfg, module.dtype)
    n_ch = cfg.conv_layers[-1][0]
    seg_samples, seg_hop, _ = conv_segment_geometry(cfg, seg_frames, 1)
    var_avals = _avals(variables)

    def conv_fn(variables, segs):
        conv_params = variables["params"]["ssl_model"]["feature_extractor"]
        return conv.apply({"params": conv_params}, segs).reshape(-1, n_ch)

    s, = jexport.symbolic_shape("s")
    conv_exp = jexport.export(jax.jit(conv_fn), platforms=tuple(platforms))(
        var_avals, jax.ShapeDtypeStruct((s, seg_samples), jnp.float32))

    win_frames = cfg.num_frames(duration)
    feats_dtype = jax.eval_shape(
        conv_fn, var_avals,
        jax.ShapeDtypeStruct((1, seg_samples), jnp.float32)).dtype

    def score_fn(variables, feats_flat, idx):
        windows = feats_flat[idx]  # (B, win_frames, C) gather
        logits = module.apply(variables, None, train=False,
                              conv_feats=windows)
        return logits[:, 1]

    f, b = jexport.symbolic_shape("f, b")
    score_exp = jexport.export(jax.jit(score_fn), platforms=tuple(platforms))(
        var_avals, jax.ShapeDtypeStruct((f, n_ch), feats_dtype),
        jax.ShapeDtypeStruct((b, win_frames), jnp.int32))

    meta = {
        "streaming": True,
        "duration": int(duration), "hop": int(hop), "stride": int(stride),
        "receptive_field": int(cfg.conv_receptive_field),
        "win_frames": int(win_frames), "channels": int(n_ch),
        "seg_frames": int(seg_frames), "seg_samples": int(seg_samples),
        "seg_hop": int(seg_hop), "feats_dtype": str(feats_dtype),
        "semantics": ("window score = bonafide logit on conv-grid-aligned "
                      "windows; no pre-emphasis"),
    }
    return conv_exp, score_exp, meta


def export_serving(module, variables, cfg, *, duration: int,
                   hop: Optional[int] = None, max_streams: int = 8,
                   seg_frames: Optional[int] = None,
                   ring_frames: Optional[int] = None,
                   extend_batch: Optional[int] = None,
                   score_batch: Optional[int] = None,
                   transport_dtype: str = "int16",
                   escalate=None, escalate_band: float = 2.0,
                   escalate_center: float = 0.0,
                   esc_batch: Optional[int] = None,
                   esc_rate: Optional[float] = None,
                   platforms: Sequence[str] = ("cpu", "tpu")):
    """Export the multi-stream serving engine's device programs.

    Builds a :class:`~rtdsd_tpu.engine.serving.MultiStreamScorer` at the
    exact target geometry and serializes its fixed-shape programs as
    StableHLO: the batched conv-extend (ring scatter included), the
    batched window score, and — when ``escalate`` is given — the cascade
    escalation re-score. :func:`load_serving` reconstructs a
    byte-compatible engine on a serving host WITHOUT tracing any model
    code: the artifact pins the program numerics, the ring/batch shapes,
    and the transport dtype, completing the "no model definitions on the
    serving host" deployment story for real-time serving (the file-batch
    counterpart is :func:`export_scorer`). Host-side behaviors that
    involve no device program — the energy gate, the escalation band,
    backpressure — stay runtime-configurable.

    Returns ``(extend_exp, score_exp, esc_exp_or_None, meta)``.
    """
    import dataclasses

    from jax import export as jexport

    from rtdsd_tpu.engine.serving import MultiStreamScorer

    params = variables["params"]
    stats = variables.get("batch_stats", {})
    eng = MultiStreamScorer(module, params, stats, cfg,
                            duration=duration, hop=hop,
                            max_streams=max_streams, seg_frames=seg_frames,
                            ring_frames=ring_frames,
                            extend_batch=extend_batch,
                            score_batch=score_batch,
                            escalate=escalate, escalate_band=escalate_band,
                            escalate_center=escalate_center,
                            esc_batch=esc_batch, esc_rate=esc_rate,
                            transport_dtype=transport_dtype,
                            hbm_limit=0)  # guard runs on the SERVING host

    aval = lambda x: jax.ShapeDtypeStruct(jnp.shape(x),
                                          jnp.asarray(x).dtype)
    i32 = lambda n: jax.ShapeDtypeStruct((n,), jnp.int32)
    feats_av, swave_av = aval(eng._feats), aval(eng._swave)
    segs_av = jax.ShapeDtypeStruct((eng.extend_batch, eng.seg_samples),
                                   eng._swave.dtype)
    pf = tuple(platforms)
    ext_exp = jexport.export(jax.jit(eng._extend_fn), platforms=pf)(
        _avals(eng._conv_params), aval(eng._const_zero), feats_av,
        swave_av, segs_av, i32(eng.extend_batch), i32(eng.extend_batch),
        i32(eng.extend_batch), i32(eng.extend_batch))
    score_exp = jexport.export(jax.jit(eng._score_fn), platforms=pf)(
        _avals(eng.params), _avals(eng.batch_stats), feats_av,
        i32(eng.score_batch), i32(eng.score_batch))
    esc_exp = None
    if escalate is not None:
        esc_exp = jexport.export(jax.jit(eng._score_esc_fn), platforms=pf)(
            _avals(eng._esc_params), _avals(eng._esc_stats), swave_av,
            i32(eng.esc_batch), i32(eng.esc_batch))

    meta = {
        "serving": True,
        # format 2 (r4): the extend program carries the folded
        # zero-segment const scatter (cp, const_rows, feats, swave,
        # segs, slots, pos, zslots, zpos)
        "serving_format": 2,
        "w2v_cfg": dataclasses.asdict(cfg),
        "model_dtype": str(jnp.dtype(module.dtype)),
        "duration": int(eng.duration), "hop": int(eng.hop),
        "max_streams": int(eng.max_streams),
        "seg_frames": int(eng.seg_frames),
        "ring_frames": int(eng.ring_frames),
        "extend_batch": int(eng.extend_batch),
        "score_batch": int(eng.score_batch),
        "esc_batch": int(eng.esc_batch),
        "esc_gather": eng.esc_gather,
        "transport_dtype": transport_dtype,
        "escalate": escalate is not None,
        "escalate_band": float(eng.escalate_band),
        "escalate_center": float(eng.escalate_center),
        "hbm_estimate": int(eng.hbm_estimate),
        "semantics": ("window score = bonafide logit on conv-grid-aligned "
                      "windows from live streams; no pre-emphasis"),
    }
    return ext_exp, score_exp, esc_exp, meta


def save_serving(ext_exp, score_exp, esc_exp, prefix: str, meta: dict,
                 variables, esc_variables=None) -> None:
    """Write a serving bundle: ``<prefix>.extend`` + ``<prefix>.score``
    (+ ``<prefix>.escalate``) programs, weight sidecars
    (``<prefix>.params``, ``<prefix>.esc.params``), and one
    ``<prefix>.json`` with the engine geometry."""
    blobs = {}
    progs = [(".extend", ext_exp), (".score", score_exp)]
    if esc_exp is not None:
        progs.append((".escalate", esc_exp))
    for ext, exp in progs:
        blob = exp.serialize()
        with open(prefix + ext, "wb") as f:
            f.write(blob)
        blobs[ext.lstrip(".") + "_bytes"] = len(blob)
    blobs["params_bytes"] = save_params_sidecar(prefix, variables)
    if esc_variables is not None:
        blobs["esc_params_bytes"] = save_params_sidecar(prefix + ".esc",
                                                        esc_variables)
    meta = dict(meta, platforms=list(ext_exp.platforms), **blobs)
    with open(prefix + ".json", "w") as f:
        json.dump(meta, f, indent=2)


def _artifact_model_stub(dtype):
    """Stand-in for the model module in an artifact-backed engine: the
    engine reads only ``.dtype`` outside its (never-traced) jit closures;
    ``.apply`` existing but raising keeps any accidental trace loud."""
    from types import SimpleNamespace

    def _no_apply(*a, **k):
        raise RuntimeError(
            "artifact-backed serving engine has no model code — its "
            "device programs are the serialized StableHLO from "
            "export_serving; re-export to change the model")

    return SimpleNamespace(dtype=dtype, apply=_no_apply)


def load_serving(prefix: str, *, hbm_limit: Optional[int] = None,
                 gate_rms_dbfs: Optional[float] = None,
                 gate_score: float = 0.0,
                 escalate_band: Optional[float] = None,
                 escalate_center: Optional[float] = None,
                 extend_fastpath: bool = True):
    """Reconstruct a :class:`MultiStreamScorer` from an
    :func:`export_serving` bundle — no model code runs on this host.

    The engine is built at the artifact's exact geometry (shapes are
    baked into the serialized programs) and its lazily-jitted closures
    are replaced by the deserialized programs before anything can trace
    them. Host-side knobs (energy gate, escalation band/center, HBM
    guard override) remain configurable. Returns ``(engine, meta)``.
    """
    from rtdsd_tpu.engine.serving import MultiStreamScorer
    from rtdsd_tpu.models.wav2vec2 import Wav2Vec2Config

    with open(prefix + ".json") as f:
        meta = json.load(f)
    if not meta.get("serving"):
        raise ValueError(
            f"{prefix} is not a serving artifact (export with "
            f"cli.export --serving)")
    if meta.get("serving_format", 1) != 2:
        raise ValueError(
            f"{prefix} is a format-{meta.get('serving_format', 1)} "
            f"serving bundle; this engine expects format 2 (the extend "
            f"program carries the folded zero-segment scatter) — "
            f"re-export with this version's cli.export --serving")
    cfgd = dict(meta["w2v_cfg"])
    cfgd["conv_layers"] = tuple(tuple(l) for l in cfgd["conv_layers"])
    cfg = Wav2Vec2Config(**cfgd)
    dtype = jnp.dtype(meta["model_dtype"])

    variables = load_params_sidecar(prefix)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    esc = None
    if meta["escalate"]:
        evars = load_params_sidecar(prefix + ".esc")
        esc = (_artifact_model_stub(dtype), evars["params"],
               evars.get("batch_stats", {}))

    eng = MultiStreamScorer(
        _artifact_model_stub(dtype), params, stats, cfg,
        duration=meta["duration"], hop=meta["hop"],
        max_streams=meta["max_streams"], seg_frames=meta["seg_frames"],
        ring_frames=meta["ring_frames"],
        extend_batch=meta["extend_batch"],
        score_batch=meta["score_batch"], esc_batch=meta["esc_batch"],
        esc_gather=meta.get("esc_gather", "slice"),
        extend_fastpath=extend_fastpath,
        escalate=esc,
        escalate_band=(meta["escalate_band"] if escalate_band is None
                       else escalate_band),
        escalate_center=(meta["escalate_center"] if escalate_center is None
                         else escalate_center),
        transport_dtype=meta["transport_dtype"],
        hbm_limit=hbm_limit,
        gate_rms_dbfs=gate_rms_dbfs, gate_score=gate_score)
    eng._extend = load_exported(prefix + ".extend").call
    eng._score = load_exported(prefix + ".score").call
    if esc is not None:
        eng._score_esc = load_exported(prefix + ".escalate").call
    # exported programs are fixed-shape: no sub-shape dispatch of ANY of
    # the three families — extend half/quarter fastpath, score rungs,
    # escalation rungs (the zero-segment CONST fastpath still works —
    # extend_const is scatter-only jnp, no model code, and the conv(0)
    # rows derive through the exported full-shape extend)
    eng._subshape_ok = False
    eng.artifact_meta = meta
    return eng, meta


class ScoringArtifact:
    """Loader/runner for :func:`export_scorer` artifacts: the serialized
    program plus its ``<path>.params`` weight sidecar.

    ``call(waves)`` scores a ``(B, T)`` float32 batch on the current JAX
    backend — weights are passed as arguments per call, so the backend
    compile is the normal fast path, not a constant-folding marathon."""

    def __init__(self, exported, variables):
        self._exp = exported
        self._vars = variables

    @classmethod
    def load(cls, path: str) -> "ScoringArtifact":
        return cls(load_exported(path), load_params_sidecar(path))

    def call(self, waves):
        return self._exp.call(self._vars, waves)


class StreamingArtifact:
    """Model-free runner for :func:`export_streaming` bundles.

    Uses ONLY the two serialized programs, the weight sidecar, and the
    JSON geometry — no model code or checkpoints — and reproduces
    ``IncrementalStreamingScorer.window_scores`` exactly
    (tests/test_export.py)."""

    def __init__(self, conv_exported, score_exported, meta: dict,
                 variables):
        self._conv = conv_exported
        self._score = score_exported
        self.meta = dict(meta)
        self._vars = variables

    @classmethod
    def load(cls, prefix: str) -> "StreamingArtifact":
        """Load ``<prefix>.conv`` / ``<prefix>.score`` / ``<prefix>.params``
        / ``<prefix>.json`` as written by the ``--streaming`` CLI."""
        with open(prefix + ".json") as fh:
            meta = json.load(fh)
        return cls(load_exported(prefix + ".conv"),
                   load_exported(prefix + ".score"), meta,
                   load_params_sidecar(prefix))

    def _num_frames(self, t: int) -> int:
        m = self.meta
        return (t - m["receptive_field"]) // m["stride"] + 1

    def window_scores(self, wave, return_starts: bool = False):
        """Per-window bonafide logits; with ``return_starts``, also the
        actual window start positions in samples (hop-grid starts snapped
        down to the conv frame grid, plus the tail window — NOT simply
        ``i * hop``)."""
        import numpy as np

        m = self.meta
        wave = np.asarray(wave, np.float32).squeeze()
        t = int(wave.shape[-1])
        if t <= m["duration"]:  # short input: tile like the dataset fit
            reps = -(-m["duration"] // max(t, 1))
            wave = np.tile(wave, reps)[: m["duration"]]
            t = m["duration"]

        # conv features once per audio (symbolic segment count: no bucket)
        total = self._num_frames(t)
        n_segs = -(-total // m["seg_frames"])
        pad_to = (n_segs - 1) * m["seg_hop"] + m["seg_samples"]
        if t < pad_to:
            wave = np.pad(wave, (0, pad_to - t))
        segs = np.stack([wave[i * m["seg_hop"]:
                              i * m["seg_hop"] + m["seg_samples"]]
                         for i in range(n_segs)])
        feats = self._conv.call(self._vars, segs)

        # window starts on the hop grid (plus a tail window), snapped DOWN
        # to the frame grid — engine.streaming frame_starts/_grid_starts
        # semantics, inlined so the runner needs no repo code at all
        raw = list(range(0, t - m["duration"] + 1, m["hop"])) or [0]
        if raw[-1] + m["duration"] < t:
            raw.append(t - m["duration"])
        starts = sorted(dict.fromkeys(s - (s % m["stride"]) for s in raw))
        base = np.arange(m["win_frames"], dtype=np.int32)
        idx = np.stack([s // m["stride"] + base for s in starts])
        scores = np.asarray(self._score.call(self._vars, feats, idx),
                            np.float32)
        if return_starts:
            return scores, np.asarray(starts, np.int64)
        return scores

    def score(self, wave, aggregate: str = "mean") -> float:
        import numpy as np

        ws = self.window_scores(wave)
        agg = {"mean": np.mean, "min": np.min, "max": np.max,
               "median": np.median}[aggregate]
        return float(agg(ws))


def save_params_sidecar(path: str, variables) -> int:
    """Write ``<path>.params`` (flax msgpack of the variables pytree);
    returns the byte count."""
    import flax.serialization as ser
    import numpy as np

    blob = ser.msgpack_serialize(
        jax.tree_util.tree_map(np.asarray, variables))
    with open(path + ".params", "wb") as f:
        f.write(blob)
    return len(blob)


def load_params_sidecar(path: str):
    """Read the ``<path>.params`` weight sidecar back into a pytree."""
    import flax.serialization as ser

    sidecar = path + ".params"
    if not os.path.exists(sidecar):
        raise FileNotFoundError(
            f"{sidecar} not found — artifacts store weights beside the "
            "program (re-export with this version's cli.export)")
    with open(sidecar, "rb") as f:
        return ser.msgpack_restore(f.read())


def save_exported(exported, path: str, meta: dict, variables) -> None:
    """Write the serialized program, the ``<path>.params`` weight sidecar,
    and a ``<path>.json`` metadata sidecar."""
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    params_bytes = save_params_sidecar(path, variables)
    meta = dict(meta, in_avals=[str(a) for a in exported.in_avals],
                out_avals=[str(a) for a in exported.out_avals],
                platforms=list(exported.platforms),
                artifact_bytes=len(blob), params_bytes=params_bytes)
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=2)


def save_streaming(conv_exported, score_exported, prefix: str,
                   meta: dict, variables) -> None:
    """Write a streaming bundle: ``<prefix>.conv`` + ``<prefix>.score``
    programs, the ``<prefix>.params`` weight sidecar, and one
    ``<prefix>.json`` with the host-glue geometry."""
    blobs = {}
    for ext, exp in ((".conv", conv_exported), (".score", score_exported)):
        blob = exp.serialize()
        with open(prefix + ext, "wb") as f:
            f.write(blob)
        blobs[ext.lstrip(".") + "_bytes"] = len(blob)
    blobs["params_bytes"] = save_params_sidecar(prefix, variables)
    meta = dict(meta, platforms=list(conv_exported.platforms), **blobs)
    with open(prefix + ".json", "w") as f:
        json.dump(meta, f, indent=2)


def load_exported(path: str):
    """Deserialize a program written by :func:`save_exported`.

    The returned object's ``.call(variables, ...)`` expects the weight
    pytree first; use :class:`ScoringArtifact` / :class:`StreamingArtifact`
    to load program + weights together.
    """
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(f.read())


def main(argv=None):
    p = argparse.ArgumentParser(
        description="export a scoring model as serialized StableHLO")
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--batch", type=str, default="sym",
                   help='"sym" (symbolic, default) or a fixed batch size')
    p.add_argument("--duration_sec", type=float, default=None,
                   help="clip seconds (default: config test_duration_sec)")
    p.add_argument("--student", action="store_true",
                   help="export kd_kwargs.student_kwargs model "
                        "(sys_config.student_model) instead of the teacher")
    p.add_argument("--w8", action="store_true",
                   help="int8-quantize transformer weights first")
    p.add_argument("--w8a8", action="store_true",
                   help="w8 plus dynamic int8 activations (int8 MXU)")
    p.add_argument("--streaming", action="store_true",
                   help="export the incremental streaming scorer instead: "
                        "<out>.conv + <out>.score + <out>.json "
                        "(StreamingArtifact bundle)")
    p.add_argument("--hop_sec", type=float, default=None,
                   help="streaming hop seconds (default: duration/2)")
    p.add_argument("--seg_frames", type=int, default=256,
                   help="conv frames per extractor segment (streaming)")
    p.add_argument("--serving", action="store_true",
                   help="export the multi-stream serving engine's device "
                        "programs instead: <out>.extend + <out>.score "
                        "(+ <out>.escalate with --cascade_ckpt) + weight "
                        "sidecars + <out>.json; cli.serve/cli.daemon "
                        "--artifact serves from the bundle with no model "
                        "code")
    p.add_argument("--max_streams", type=int, default=8,
                   help="serving: compiled stream-slot count")
    p.add_argument("--transport", type=str, default="int16",
                   choices=("float32", "int16", "mulaw8"),
                   help="serving: sample transport dtype (baked into the "
                        "extend program)")
    p.add_argument("--score_batch", type=int, default=None,
                   help="serving: cap the window-score batch")
    p.add_argument("--extend_batch", type=int, default=None,
                   help="serving: cap the conv-extend batch")
    p.add_argument("--esc_batch", type=int, default=None,
                   help="serving: escalation dispatch batch")
    p.add_argument("--cascade_ckpt", type=str, default=None,
                   help="serving: screener checkpoint — the screener "
                        "becomes the engine's primary model and --ckpt "
                        "the cascade escalation flagship (mirrors "
                        "cli.serve)")
    p.add_argument("--cascade_config", type=str, default=None,
                   help="serving: screener YAML (default: --config)")
    p.add_argument("--cascade_w8a8", action="store_true",
                   help="serving: w8a8-quantize the screener transformer")
    p.add_argument("--cascade_band", type=float, default=None,
                   help="serving: escalation half-band baked into the "
                        "bundle (default 2.0)")
    p.add_argument("--cascade_center", type=float, default=None,
                   help="serving: escalation band center baked into the "
                        "bundle (default 0.0)")
    p.add_argument("--cascade_calibration", type=str, default=None,
                   help="serving: cascade band sidecar from 'cli.evaluate "
                        "--cascade-sweep --cascade-out' — bakes the "
                        "dev-set band/center into the bundle (explicit "
                        "--cascade_band/--cascade_center override it)")
    p.add_argument("--platforms", type=str, default="cpu,tpu",
                   help="comma-separated lowering platforms")
    args = p.parse_args(argv)

    from rtdsd_tpu.cli.common import load_eval_model
    from rtdsd_tpu.config import load_yaml_config

    sys_config, exp_config = load_yaml_config(args.config)
    if args.student:
        kd = exp_config.kd_kwargs or {}
        name, kwargs = sys_config.student_model, kd.get("student_kwargs", {})
    else:
        name, kwargs = None, None
    spec, state, _mesh, _bsharding = load_eval_model(
        sys_config, exp_config, args.ckpt, w8=args.w8, w8a8=args.w8a8,
        name=name, kwargs=kwargs)

    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    dur = (args.duration_sec if args.duration_sec is not None
           else exp_config.test_duration_sec)
    num_samples = int(round(dur * exp_config.sample_rate))
    batch = None if args.batch == "sym" else int(args.batch)
    platforms = tuple(s.strip() for s in args.platforms.split(",") if s)

    quant = "w8a8" if args.w8a8 else ("w8" if args.w8 else "none")
    if args.serving:
        sr = exp_config.sample_rate
        duration = int(round(dur * sr))
        hop = (int(round(args.hop_sec * sr))
               if args.hop_sec is not None else None)
        module, mvars = spec.module, variables
        escalate = None
        esc_variables = None
        model_name = spec.name
        if args.cascade_ckpt:
            # mirror cli.serve: screener is the engine's primary model,
            # --ckpt's model the escalation flagship
            if args.cascade_config:
                screen_sys, screen_exp = load_yaml_config(
                    args.cascade_config)
            else:
                screen_sys, screen_exp = sys_config, exp_config
            spec_s, state_s, _, _ = load_eval_model(
                screen_sys, screen_exp, args.cascade_ckpt,
                w8a8=args.cascade_w8a8)
            escalate = (module, state.params, state.batch_stats)
            esc_variables = variables
            module = spec_s.module
            mvars = {"params": state_s.params}
            if state_s.batch_stats:
                mvars["batch_stats"] = state_s.batch_stats
            model_name = f"{spec_s.name} -> {spec.name} cascade"
        band, center, esc_rate = args.cascade_band, args.cascade_center, \
            None
        if args.cascade_calibration:
            import math

            from rtdsd_tpu.utils.metrics import load_cascade_calibration

            cal = load_cascade_calibration(args.cascade_calibration)
            if band is None:
                band = float(cal["band"])
            if center is None:
                center = float(cal["center"])
            rate = cal.get("escalation_rate")
            if rate is not None and math.isfinite(float(rate)):
                esc_rate = float(rate)  # sizes the baked esc chunk
            print(f"baking cascade band {band} around {center} from "
                  f"{args.cascade_calibration}"
                  + (f" (esc chunk sized for {esc_rate * 100:.1f}% "
                     f"escalation)" if esc_rate is not None else ""))
        ext_exp, score_exp, esc_exp, meta = export_serving(
            module, mvars, module.w2v_cfg, duration=duration, hop=hop,
            max_streams=args.max_streams,
            extend_batch=args.extend_batch, score_batch=args.score_batch,
            esc_batch=args.esc_batch, esc_rate=esc_rate,
            transport_dtype=args.transport,
            escalate=escalate,
            escalate_band=2.0 if band is None else band,
            escalate_center=0.0 if center is None else center,
            platforms=platforms)
        meta.update(model=model_name, ckpt=os.path.abspath(args.ckpt),
                    sample_rate=sr, quant=quant)
        save_serving(ext_exp, score_exp, esc_exp, args.out, meta, mvars,
                     esc_variables=esc_variables)
        parts = ["extend", "score"] + (["escalate"] if esc_exp else [])
        print(f"exported {model_name} serving -> {args.out}."
              f"{{{','.join(parts)},params,json}} (max_streams="
              f"{meta['max_streams']} extend={meta['extend_batch']} "
              f"score={meta['score_batch']} transport="
              f"{meta['transport_dtype']}, platforms={platforms})")
        return
    if args.streaming:
        hop = (int(round(args.hop_sec * exp_config.sample_rate))
               if args.hop_sec is not None else None)
        conv_exp, score_exp, meta = export_streaming(
            spec.module, variables, spec.module.w2v_cfg,
            duration=num_samples,
            hop=hop, seg_frames=args.seg_frames, platforms=platforms)
        meta.update(model=spec.name, ckpt=os.path.abspath(args.ckpt),
                    duration_sec=dur, sample_rate=exp_config.sample_rate,
                    quant=quant)
        save_streaming(conv_exp, score_exp, args.out, meta, variables)
        sizes = tuple(os.path.getsize(args.out + ext)
                      for ext in (".conv", ".score", ".params"))
        print(f"exported {spec.name} streaming -> {args.out}.{{conv,score,"
              f"params,json}} ({sizes[0]}+{sizes[1]}+{sizes[2]} bytes, "
              f"platforms={platforms}, "
              f"win={num_samples} hop={meta['hop']})")
        return

    exported = export_scorer(spec.module, variables,
                             num_samples=num_samples, batch=batch,
                             platforms=platforms)
    save_exported(exported, args.out, {
        "model": spec.name,
        "ckpt": os.path.abspath(args.ckpt),
        "duration_sec": dur,
        "sample_rate": exp_config.sample_rate,
        "batch": "symbolic" if batch is None else batch,
        "quant": quant,
        "semantics": "score = bonafide logit, no pre-emphasis",
    }, variables)
    print(f"exported {spec.name} -> {args.out} "
          f"({os.path.getsize(args.out)} bytes, platforms={platforms}, "
          f"batch={'sym' if batch is None else batch}, T={num_samples})")


if __name__ == "__main__":
    main()
