"""Portable export (cli/export.py): jax.export round-trip numerics.

The artifact must reproduce the in-process scoring forward (bonafide
logit, no pre-emphasis — cli.main --is_score semantics) after a full
serialize -> bytes-on-disk -> deserialize cycle, with both a symbolic and
a fixed batch dimension. The CLI surface itself is smoked in
test_cli_smoke.py::test_cli_export_smoke.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtdsd_tpu.cli.export import (ScoringArtifact, export_scorer,
                                  save_exported)
from rtdsd_tpu.models.registry import get_model
from rtdsd_tpu.utils.init_host import init_variables_host

T = 8000  # 0.5 s


@pytest.fixture(scope="module")
def tiny():
    spec = get_model(
        "My_XLSR_AASIST", num_layers=2, dtype=jnp.float32,
        w2v={"encoder_embed_dim": 32, "encoder_ffn_dim": 64,
             "encoder_heads": 4, "conv_pos": 16, "conv_pos_groups": 4,
             "conv_layers": ((32, 10, 5), (32, 3, 2), (32, 2, 2),
                             (32, 2, 2))})
    variables = init_variables_host(spec.module, jnp.zeros((2, T)),
                                    train=False)
    def direct(w):
        return spec.module.apply(variables, w, train=False)[:, 1]
    return spec, variables, direct


def test_export_symbolic_batch_roundtrip(tiny, tmp_path):
    spec, variables, direct = tiny
    exported = export_scorer(spec.module, variables, num_samples=T,
                             batch=None, platforms=("cpu",))
    path = str(tmp_path / "model.jaxexp")
    save_exported(exported, path, {"model": spec.name}, variables)
    re = ScoringArtifact.load(path)

    for b, seed in [(3, 0), (5, 1)]:  # symbolic dim: two distinct batches
        w = np.random.default_rng(seed).standard_normal((b, T)) \
            .astype(np.float32)
        got = np.asarray(re.call(w))
        want = np.asarray(direct(jnp.asarray(w)))
        assert got.shape == (b,)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    meta = json.loads(open(path + ".json").read())
    assert meta["platforms"] == ["cpu"]
    assert meta["artifact_bytes"] > 0
    # weights live in the sidecar, NOT as StableHLO constants: the program
    # must be far smaller than the params it scores with
    assert meta["params_bytes"] > 0
    assert meta["artifact_bytes"] < meta["params_bytes"]


def test_export_fixed_batch_rejects_other_batch(tiny, tmp_path):
    spec, variables, direct = tiny
    exported = export_scorer(spec.module, variables, num_samples=T,
                             batch=4, platforms=("cpu",))
    path = str(tmp_path / "fixed.jaxexp")
    save_exported(exported, path, {"model": spec.name}, variables)
    re = ScoringArtifact.load(path)

    w = np.random.default_rng(2).standard_normal((4, T)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(re.call(w)),
                               np.asarray(direct(jnp.asarray(w))),
                               rtol=1e-4, atol=1e-5)
    with pytest.raises(Exception):  # shape-checked at the artifact boundary
        re.call(w[:2])


def test_export_streaming_matches_incremental_scorer(tiny, tmp_path):
    """The two-program streaming bundle, after a full serialize/deserialize
    cycle, reproduces IncrementalStreamingScorer.window_scores through the
    model-free StreamingArtifact runner — including the tail window and the
    frame-grid snap — on long, short (tiled), and exact-length audio."""
    from rtdsd_tpu.cli.export import (StreamingArtifact, export_streaming,
                                      save_streaming)
    from rtdsd_tpu.engine.streaming import IncrementalStreamingScorer

    spec, variables, _ = tiny
    hop = 2000
    conv_exp, score_exp, meta = export_streaming(
        spec.module, variables, spec.module.w2v_cfg, duration=T, hop=hop,
        seg_frames=32, platforms=("cpu",))
    prefix = str(tmp_path / "stream")
    save_streaming(conv_exp, score_exp, prefix, meta, variables)
    art = StreamingArtifact.load(prefix)

    scorer = IncrementalStreamingScorer(
        spec.module, variables["params"], variables.get("batch_stats"),
        spec.module.w2v_cfg, duration=T, hop=hop, seg_frames=32)

    rng = np.random.default_rng(7)
    for t in (23500, 3000, T):  # long (tail window), short (tiled), exact
        w = rng.standard_normal(t).astype(np.float32) * 0.1
        got, starts = art.window_scores(w, return_starts=True)
        want = scorer.window_scores(w)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
        # starts are the actual grid-snapped positions incl. the tail
        assert starts.shape == got.shape
        assert all(s % art.meta["stride"] == 0 for s in starts)
        if t > T:  # tail window present and tail-aligned (grid-snapped)
            tail = (t - T) - ((t - T) % art.meta["stride"])
            assert starts[-1] == tail
    assert np.isfinite(art.score(w, aggregate="mean"))

    side = json.loads(open(prefix + ".json").read())
    assert side["streaming"] and side["hop"] == hop


def test_export_serving_artifact_matches_ckpt_engine(tiny, tmp_path):
    """r4 (VERDICT item 5): a cli.export --serving bundle reconstructs a
    MultiStreamScorer WITHOUT tracing model code, and its wire-visible
    output (scores, escalated/gated flags, window order) is equal to the
    model-backed engine's — cascade escalation, int16 transport, and the
    host-side energy gate all composed."""
    from rtdsd_tpu.cli.export import (export_serving, load_serving,
                                      save_serving)
    from rtdsd_tpu.engine.serving import MultiStreamScorer

    spec, variables, direct = tiny
    cfg = spec.module.w2v_cfg
    duration = 80 * cfg.total_stride
    hop = duration // 2
    evars = init_variables_host(spec.module, jnp.zeros((2, T)), seed=5,
                                train=False)
    esc = (spec.module, evars["params"], evars.get("batch_stats", {}))

    rng = np.random.default_rng(0)
    wave = (rng.standard_normal(4 * hop + duration) * 0.1) \
        .astype(np.float32)
    # band from the screener's own score distribution so the cascade
    # genuinely splits the loud windows (some escalate, some don't)
    wins = np.stack([wave[s:s + duration]
                     for s in range(0, len(wave) - duration + 1, hop)])
    s_scores = np.asarray(direct(jnp.asarray(wins)))
    center = float(np.median(s_scores))
    band = float(np.quantile(np.abs(s_scores - center), 0.6)) + 1e-3
    kwargs = dict(duration=duration, hop=hop, max_streams=2,
                  transport_dtype="int16", escalate=esc,
                  escalate_band=band, escalate_center=center)

    ref_eng = MultiStreamScorer(spec.module, variables["params"],
                                variables.get("batch_stats", {}), cfg,
                                gate_rms_dbfs=-50.0, **kwargs)
    ext, sco, escx, meta = export_serving(spec.module, variables, cfg,
                                          platforms=("cpu",), **kwargs)
    assert escx is not None
    prefix = str(tmp_path / "serve_bundle")
    save_serving(ext, sco, escx, prefix, meta, variables,
                 esc_variables=evars)
    eng, meta2 = load_serving(prefix, gate_rms_dbfs=-50.0)
    assert meta2["escalate"] and meta2["transport_dtype"] == "int16"

    outs = []
    for e in (ref_eng, eng):
        loud = e.open_stream("loud")
        quiet = e.open_stream("quiet")
        e.push(loud, wave)
        # exact zeros: gated AND through the zero-segment const-scatter
        # fastpath — which the artifact engine must drive through its
        # DESERIALIZED extend program (conv(0) row derivation)
        e.push(quiet, np.zeros_like(wave))
        e.close_stream(loud, flush=True)
        e.close_stream(quiet, flush=True)
        outs.append(sorted(e.drain(),
                           key=lambda g: (str(g.stream_id),
                                          g.start_sample)))
        assert e.zero_segments > 0  # const fastpath engaged
    ref, got = outs
    assert len(ref) == len(got) > 0
    assert [g.gated for g in got] == [g.gated for g in ref]
    assert any(g.gated for g in got)
    assert [g.escalated for g in got] == [g.escalated for g in ref]
    assert any(g.escalated for g in got)
    np.testing.assert_allclose([g.score for g in got],
                               [g.score for g in ref],
                               rtol=1e-5, atol=1e-6)

    # the artifact engine has no model code to trace: its module stand-in
    # refuses apply() so an accidental trace fails loudly
    from rtdsd_tpu.cli.export import _artifact_model_stub
    with pytest.raises(RuntimeError, match="no model code"):
        _artifact_model_stub(jnp.float32).apply({}, None)


def test_serve_cli_artifact_flag_validation(tiny, tmp_path):
    """--artifact excludes --config/--ckpt and every export-baked flag;
    --max_streams must match the bundle's compiled slot count."""
    from rtdsd_tpu.cli.export import export_serving, save_serving
    from rtdsd_tpu.cli.serve import build_engine, parse_args

    spec, variables, direct = tiny
    cfg = spec.module.w2v_cfg
    duration = 80 * cfg.total_stride
    ext, sco, escx, meta = export_serving(
        spec.module, variables, cfg, duration=duration,
        max_streams=2, transport_dtype="float32", platforms=("cpu",))
    meta.update(sample_rate=16000)
    prefix = str(tmp_path / "plain_bundle")
    save_serving(ext, sco, escx, prefix, meta, variables)

    args = parse_args(["--artifact", prefix, "--audio", "x.wav"])
    eng, sr = build_engine(args, 1)
    assert sr == 16000.0 and eng.max_streams == 2

    with pytest.raises(SystemExit, match="replaces"):
        build_engine(parse_args(["--artifact", prefix, "--config", "c",
                                 "--ckpt", "k", "--audio", "x.wav"]), 1)
    with pytest.raises(SystemExit, match="baked"):
        build_engine(parse_args(["--artifact", prefix, "--window_sec",
                                 "1", "--audio", "x.wav"]), 1)
    with pytest.raises(SystemExit, match="slot count"):
        build_engine(parse_args(["--artifact", prefix, "--max_streams",
                                 "4", "--audio", "x.wav"]), 1)


def test_reload_params_from_artifact_sidecars(tiny, tmp_path):
    """cli.serve.reload_params in --artifact mode re-reads the weight
    sidecars from disk (the daemon's SIGHUP zero-downtime reload path
    for artifact deployments)."""
    import argparse

    from rtdsd_tpu.cli.export import export_serving, save_serving
    from rtdsd_tpu.cli.serve import reload_params

    spec, variables, direct = tiny
    cfg = spec.module.w2v_cfg
    duration = 80 * cfg.total_stride
    evars = init_variables_host(spec.module, jnp.zeros((2, T)), seed=7,
                                train=False)
    esc = (spec.module, evars["params"], evars.get("batch_stats", {}))
    ext, sco, escx, meta = export_serving(
        spec.module, variables, cfg, duration=duration, max_streams=2,
        escalate=esc, platforms=("cpu",))
    prefix = str(tmp_path / "reload_bundle")
    save_serving(ext, sco, escx, prefix, meta, variables,
                 esc_variables=evars)

    args = argparse.Namespace(artifact=prefix)
    params, stats, esc_out = reload_params(args)
    want = jax.tree_util.tree_leaves(variables["params"])
    got = jax.tree_util.tree_leaves(params)
    assert len(want) == len(got)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))
    assert esc_out is not None
    ew = jax.tree_util.tree_leaves(evars["params"])
    eg = jax.tree_util.tree_leaves(esc_out[0])
    for w, g in zip(ew, eg):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))


def test_export_streaming_rejects_subframe_hop(tiny):
    from rtdsd_tpu.cli.export import export_streaming

    spec, variables, _ = tiny
    for hop in (1, 0):  # 0 must trip the guard, not fall back to default
        with pytest.raises(ValueError, match="frame stride"):
            export_streaming(spec.module, variables, spec.module.w2v_cfg,
                             duration=T, hop=hop, platforms=("cpu",))


def test_export_multi_platform_includes_tpu(tiny, tmp_path):
    """cpu+tpu lowering (the CLI default) serializes and still executes on
    the CPU backend the suite runs under."""
    spec, variables, _ = tiny
    exported = export_scorer(spec.module, variables, num_samples=T,
                             batch=2, platforms=("cpu", "tpu"))
    assert set(exported.platforms) == {"cpu", "tpu"}
    path = str(tmp_path / "multi.jaxexp")
    save_exported(exported, path, {"model": spec.name}, variables)
    out = ScoringArtifact.load(path).call(jnp.zeros((2, T), jnp.float32))
    assert np.all(np.isfinite(np.asarray(out)))
