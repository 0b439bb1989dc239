"""Multi-stream serving engine tests (engine/serving.py).

Equivalence oracle: each stream's window scores must match scoring the
same windows directly through the full wave-input model — the serving
path (segmented conv -> device ring -> mod-gather -> conv_feats entry)
is an exact re-plumbing, not an approximation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtdsd_tpu.engine.serving import MultiStreamScorer
from rtdsd_tpu.engine.steps import make_score_step
from rtdsd_tpu.models.wav2vec2 import Wav2Vec2Config
from rtdsd_tpu.models.zoo import XLSR_AASIST


@pytest.fixture(scope="module")
def tiny():
    cfg = Wav2Vec2Config(conv_layers=((8, 10, 5), (8, 4, 4), (8, 2, 2)),
                         encoder_embed_dim=8, encoder_ffn_dim=16,
                         encoder_heads=2, encoder_layers=2, conv_pos=4,
                         conv_pos_groups=2)
    model = XLSR_AASIST(w2v_cfg=cfg)
    duration = 80 * cfg.total_stride  # 3200 samples, stride 40
    variables = model.init(jax.random.key(0), jnp.zeros((1, duration)))
    return (model, variables["params"], variables.get("batch_stats", {}),
            cfg, duration)


def _expected_window_scores(model, params, stats, wave, duration, hop):
    """Oracle: every hop-grid window scored directly from raw samples."""
    step = make_score_step(model)
    starts = range(0, len(wave) - duration + 1, hop)
    windows = np.stack([wave[s:s + duration] for s in starts])
    return np.asarray(step(params, stats, jnp.asarray(windows)))


def test_multistream_matches_direct_scoring(tiny):
    model, params, stats, cfg, duration = tiny
    hop = duration // 2
    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            hop=hop, max_streams=4)
    rng = np.random.default_rng(7)
    # lengths end exactly on the window grid so flush pads nothing
    # *inside* any scored window
    lengths = [3 * hop + duration, 5 * hop + duration, duration]
    waves = [rng.standard_normal(t).astype(np.float32) * 0.1
             for t in lengths]
    handles = [eng.open_stream(f"s{i}") for i in range(len(waves))]

    # push interleaved, in irregular chunk sizes, polling as we go
    got = []
    cursors = [0] * len(waves)
    while any(c < len(w) for c, w in zip(cursors, waves)):
        for i, (h, w) in enumerate(zip(handles, waves)):
            if cursors[i] < len(w):
                n = int(rng.integers(100, 1500))
                eng.push(h, w[cursors[i]:cursors[i] + n])
                cursors[i] += n
        got.extend(eng.poll())
    for h in handles:
        eng.close_stream(h, flush=True)
    got.extend(eng.drain())
    assert eng.active_streams == 0  # flushed streams released their slots

    for i, w in enumerate(waves):
        exp = _expected_window_scores(model, params, stats, w, duration, hop)
        mine = sorted([g for g in got if g.stream_id == f"s{i}"],
                      key=lambda g: g.start_sample)
        assert [g.start_sample for g in mine] == \
            [s * hop for s in range(len(exp))]
        np.testing.assert_allclose([g.score for g in mine], exp,
                                   rtol=2e-4, atol=2e-5)


def test_multistream_backlog_catchup(tiny):
    """A whole long wave pushed at once (backlog >> batch sizes) drains
    correctly through repeated bounded polls."""
    model, params, stats, cfg, duration = tiny
    hop = duration // 2
    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            hop=hop, max_streams=2, extend_batch=2,
                            score_batch=2)
    rng = np.random.default_rng(11)
    wave = rng.standard_normal(9 * hop + duration).astype(np.float32) * 0.1
    h = eng.open_stream("bulk")
    eng.push(h, wave)
    # the final window's last conv frame needs the receptive-field tail
    # beyond the last hop boundary — flush pads it (outside any gathered
    # frame, so scores stay exact)
    eng.close_stream(h, flush=True)
    out = eng.drain()
    exp = _expected_window_scores(model, params, stats, wave, duration, hop)
    assert len(out) == len(exp)
    np.testing.assert_allclose([g.score for g in out], exp,
                               rtol=2e-4, atol=2e-5)


def test_slot_exhaustion_and_reuse(tiny):
    model, params, stats, cfg, duration = tiny
    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            max_streams=2)
    a = eng.open_stream("a")
    eng.open_stream("b")
    with pytest.raises(RuntimeError, match="busy"):
        eng.open_stream("c")
    eng.close_stream(a)  # immediate release, no flush
    c = eng.open_stream("c")
    eng.push(c, np.zeros(100, np.float32))
    with pytest.raises(KeyError):
        eng.push(a if a != c else 99, np.zeros(10, np.float32))


def test_rejects_bad_geometry_and_group_norm(tiny):
    model, params, stats, cfg, duration = tiny
    with pytest.raises(ValueError, match="multiples"):
        MultiStreamScorer(model, params, stats, cfg, duration=duration,
                          hop=duration // 2 + 1)
    gn = Wav2Vec2Config(extractor_mode="group_norm")
    with pytest.raises(ValueError, match="layer_norm"):
        MultiStreamScorer(XLSR_AASIST(w2v_cfg=gn), {}, {}, gn,
                          duration=64000)


def test_warmup_compiles_and_push_after_flush_rejected(tiny):
    model, params, stats, cfg, duration = tiny
    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            max_streams=2)
    eng.warmup()  # no crash; compiles both programs on scratch rows
    h = eng.open_stream()
    eng.push(h, np.zeros(duration, np.float32))
    eng.close_stream(h, flush=True)
    with pytest.raises(RuntimeError, match="closing"):
        eng.push(h, np.zeros(10, np.float32))
    out = eng.drain()
    assert len(out) == 1 and out[0].start_sample == 0


def test_int16_transport_matches_quantized_direct(tiny):
    """int16 transport must equal direct scoring of the 16-bit-quantized
    wave (lossless for PCM-sourced audio; x -> round(x*32768)/32768)."""
    model, params, stats, cfg, duration = tiny
    hop = duration // 2
    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            hop=hop, max_streams=2,
                            transport_dtype="int16")
    rng = np.random.default_rng(21)
    wave = rng.standard_normal(4 * hop + duration).astype(np.float32) * 0.1
    q = np.clip(np.rint(wave * 32768.0), -32768, 32767)
    wave_q = (q / 32768.0).astype(np.float32)

    h = eng.open_stream("pcm")
    # mixed push dtypes: float chunk (engine quantizes) + raw int16 chunk
    eng.push(h, wave[: 3 * hop])
    eng.push(h, q[3 * hop:].astype(np.int16))
    eng.close_stream(h, flush=True)
    out = sorted(eng.drain(), key=lambda g: g.start_sample)

    exp = _expected_window_scores(model, params, stats, wave_q, duration,
                                  hop)
    assert len(out) == len(exp)
    np.testing.assert_allclose([g.score for g in out], exp,
                               rtol=2e-4, atol=2e-5)


def test_mulaw_codec_roundtrip():
    """mulaw8 companding: near-zero samples keep fine resolution (the
    point of companding), decode(encode(x)) is within the documented
    error envelope everywhere, and 0/±1 map exactly."""
    from rtdsd_tpu.engine.serving import mulaw_decode, mulaw_encode

    x = np.linspace(-1.0, 1.0, 4001).astype(np.float32)
    rt = np.asarray(mulaw_decode(jnp.asarray(mulaw_encode(x))))
    # companding error grows with |x|: ~2.2e-2 at full scale,
    # ~1e-4 near zero (where speech energy lives)
    np.testing.assert_allclose(rt, x, atol=2.3e-2)
    small = x[np.abs(x) < 0.01]
    rt_small = np.asarray(mulaw_decode(jnp.asarray(mulaw_encode(small))))
    np.testing.assert_allclose(rt_small, small, atol=3e-4)
    exact = np.array([-1.0, 0.0, 1.0], np.float32)
    np.testing.assert_allclose(
        np.asarray(mulaw_decode(jnp.asarray(mulaw_encode(exact)))),
        exact, atol=1e-6)
    assert mulaw_encode(exact).dtype == np.int8
    # decode clamps raw int8 input: -128 (never produced by our encoder,
    # but representable in a client-pushed buffer) must not escape [-1, 1]
    raw = jnp.asarray(np.array([-128, -127, 127], np.int8))
    dec = np.asarray(mulaw_decode(raw))
    assert dec[0] == dec[1] == -1.0 and dec[2] == 1.0


def test_mulaw8_transport_matches_companded_direct(tiny):
    """mulaw8 transport must equal direct scoring of the companded-
    roundtripped wave (the transport's exact semantics): the device
    decode in extend/escalate is decode(encode(x)), nothing else."""
    from rtdsd_tpu.engine.serving import mulaw_decode, mulaw_encode

    model, params, stats, cfg, duration = tiny
    hop = duration // 2
    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            hop=hop, max_streams=2,
                            transport_dtype="mulaw8")
    rng = np.random.default_rng(23)
    wave = rng.standard_normal(4 * hop + duration).astype(np.float32) * 0.1
    q16 = np.clip(np.rint(wave[3 * hop:] * 32768.0),
                  -32768, 32767).astype(np.int16)
    # exact transport semantics per chunk: float chunks compand directly,
    # int16 PCM chunks dequantize (x/32768) then compand
    codes = np.concatenate([
        mulaw_encode(wave[: 3 * hop]),
        mulaw_encode(q16.astype(np.float32) * (1.0 / 32768.0))])
    wave_c = np.asarray(mulaw_decode(jnp.asarray(codes)))

    h = eng.open_stream("mu")
    eng.push(h, wave[: 3 * hop])   # float chunk
    eng.push(h, q16)               # raw int16 PCM chunk
    eng.close_stream(h, flush=True)
    out = sorted(eng.drain(), key=lambda g: g.start_sample)

    exp = _expected_window_scores(model, params, stats, wave_c, duration,
                                  hop)
    assert len(out) == len(exp)
    np.testing.assert_allclose([g.score for g in out], exp,
                               rtol=2e-4, atol=2e-5)


def test_serving_conformer_family(tiny):
    """The engine is model-agnostic: any module with a ``conv_feats=``
    entry serves (zoo.py). XLSR_Conformer (the reference's second model
    family, 'Model'/'ConformerModel') must match its own direct scoring
    through the ring path, same oracle as the AASIST tests."""
    from rtdsd_tpu.models.zoo import XLSR_Conformer

    cfg = tiny[3]
    duration = tiny[4]
    model = XLSR_Conformer(w2v_cfg=cfg, emb_size=16, heads=2,
                           kernel_size=5, n_encoders=1)
    variables = model.init(jax.random.key(3), jnp.zeros((1, duration)))
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    hop = duration // 2
    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            hop=hop, max_streams=2)
    rng = np.random.default_rng(29)
    wave = rng.standard_normal(2 * hop + duration).astype(np.float32) * 0.1
    h = eng.open_stream("conf")
    eng.push(h, wave)
    eng.close_stream(h, flush=True)
    out = sorted(eng.drain(), key=lambda g: g.start_sample)
    exp = _expected_window_scores(model, params, stats, wave, duration, hop)
    assert len(out) == len(exp)
    np.testing.assert_allclose([g.score for g in out], exp,
                               rtol=2e-4, atol=2e-5)


def test_transport_dtype_validation(tiny):
    model, params, stats, cfg, duration = tiny
    with pytest.raises(ValueError, match="transport_dtype"):
        MultiStreamScorer(model, params, stats, cfg, duration=duration,
                          transport_dtype="int8")


def test_flush_tail_matches_incremental_offline(tiny):
    """Non-grid-aligned stream length: flush adds a tail-aligned final
    window (start = total - duration, snapped DOWN to the conv frame grid)
    scored on real audio — per-file aggregates therefore match the offline
    IncrementalStreamingScorer instead of drifting on zero-pad."""
    from rtdsd_tpu.engine.streaming import IncrementalStreamingScorer

    model, params, stats, cfg, duration = tiny
    hop = duration // 2
    stride = cfg.total_stride
    inc = IncrementalStreamingScorer(model, params, stats, cfg,
                                     duration=duration, hop=hop,
                                     batch_size=4, seg_frames=20)
    rng = np.random.default_rng(31)
    # offsets past the hop grid: 240 = frame-aligned tail, 203 leaves a
    # sub-frame remainder (zero-padded identically offline and serving),
    # 7 = sub-FRAME total remainder whose snapped tail dedups onto the hop
    # grid (offline _grid_starts emits NO extra window; serving must not
    # either)
    for extra in (240, 203, 7):
        wave = rng.standard_normal(2 * hop + duration + extra)\
            .astype(np.float32) * 0.1
        t = len(wave)
        eng = MultiStreamScorer(model, params, stats, cfg,
                                duration=duration, hop=hop, max_streams=2)
        h = eng.open_stream("tail")
        eng.push(h, wave)
        eng.close_stream(h, flush=True)
        eng.close_stream(h, flush=True)  # idempotent: must not corrupt
        got = sorted(eng.drain(), key=lambda g: g.start_sample)

        assert [g.start_sample for g in got] == inc._grid_starts(t), extra
        exp = inc.window_scores(wave)
        assert len(exp) == len(got)
        np.testing.assert_allclose([g.score for g in got], exp,
                                   rtol=2e-4, atol=2e-5)


def test_flush_short_stream_tiles_one_window(tiny):
    """A stream shorter than one window is repeat-tiled into exactly one
    window at flush (dataset duration-fit semantics), matching the offline
    scorers — not zero-padded, not dropped."""
    from rtdsd_tpu.engine.streaming import IncrementalStreamingScorer

    model, params, stats, cfg, duration = tiny
    inc = IncrementalStreamingScorer(model, params, stats, cfg,
                                     duration=duration, batch_size=4,
                                     seg_frames=20)
    rng = np.random.default_rng(33)
    wave = rng.standard_normal(duration // 3 - 7).astype(np.float32) * 0.1
    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            hop=duration // 2, max_streams=2)
    h = eng.open_stream("short")
    eng.push(h, wave[:100])  # split pushes: head retention must span chunks
    eng.push(h, wave[100:])
    eng.close_stream(h, flush=True)
    # a retried flush must be a no-op, not replace the tiled buffer with a
    # head+zero-padded one (r3 review finding)
    eng.close_stream(h, flush=True)
    got = eng.drain()
    assert len(got) == 1 and got[0].start_sample == 0
    exp = inc.window_scores(wave)
    np.testing.assert_allclose([got[0].score], exp, rtol=2e-4, atol=2e-5)
    assert eng.active_streams == 0


def test_flush_zero_push_frees_slot_without_window(tiny):
    """close(flush=True) on a stream that never pushed a sample must free
    the slot immediately and fabricate no all-zero window score."""
    model, params, stats, cfg, duration = tiny
    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            max_streams=2)
    h = eng.open_stream("empty")
    eng.close_stream(h, flush=True)
    assert eng.active_streams == 0
    assert eng.drain() == []


def test_round_robin_fairness_under_overload(tiny):
    """score_batch=1 with three backlogged streams: the per-poll rotation
    must hand the single score slot to a different stream each poll instead
    of draining slot 0 first (advisor r2: starvation under overload)."""
    model, params, stats, cfg, duration = tiny
    hop = duration // 2
    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            hop=hop, max_streams=3, extend_batch=12,
                            score_batch=1)
    rng = np.random.default_rng(37)
    handles = {}
    for i in range(3):
        wave = rng.standard_normal(4 * hop + duration).astype(np.float32)
        h = eng.open_stream(f"s{i}")
        eng.push(h, wave * 0.1)
        handles[h] = f"s{i}"

    first_scored = []
    for _ in range(20):
        out = eng.poll()
        if out:
            assert len(out) == 1  # score_batch=1
            first_scored.append(out[0].stream_id)
        if len(first_scored) == 3:
            break
    # three consecutive scoring polls served three distinct streams
    assert sorted(first_scored) == ["s0", "s1", "s2"]


def test_hbm_preflight_guard(tiny):
    """A configuration that cannot fit must raise at construction with the
    computed numbers (r2: S=1024 faulted the TPU worker mid-serve), and
    hbm_limit=0 must disable the guard for expert override."""
    model, params, stats, cfg, duration = tiny
    with pytest.raises(ValueError, match="HBM"):
        MultiStreamScorer(model, params, stats, cfg, duration=duration,
                          max_streams=4, hbm_limit=1000)
    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            max_streams=4, hbm_limit=0)
    assert eng.hbm_estimate > 1000  # the guard would have tripped


def test_auto_batch_shrinks_to_fit(tiny):
    """auto_batch=True turns the HBM guard's ValueError into an automatic
    batch shrink: with a limit between the full-batch and min-batch
    estimates the engine picks smaller dispatch batches and still scores
    streams exactly (drain covers the multi-dispatch backlog)."""
    model, params, stats, cfg, duration = tiny
    full = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                             max_streams=8, hbm_limit=0)
    floor = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                              max_streams=8, score_batch=1, extend_batch=1,
                              esc_batch=1, hbm_limit=0)
    assert floor.hbm_estimate < full.hbm_estimate
    limit = (floor.hbm_estimate + full.hbm_estimate) // 2

    # without auto_batch this limit raises; with it, batches shrink
    with pytest.raises(ValueError, match="auto_batch"):
        MultiStreamScorer(model, params, stats, cfg, duration=duration,
                          max_streams=8, hbm_limit=limit)
    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            max_streams=8, hbm_limit=limit, auto_batch=True)
    assert eng.score_batch < full.score_batch
    assert eng.hbm_estimate <= limit

    # a shrink below the fixed terms (rings+params) still raises
    with pytest.raises(ValueError, match="HBM"):
        MultiStreamScorer(model, params, stats, cfg, duration=duration,
                          max_streams=8, hbm_limit=1000, auto_batch=True)

    # exactness: capped-auto engine reproduces the full-batch engine
    rng = np.random.default_rng(3)
    wave = rng.standard_normal(duration * 2).astype(np.float32)
    got, want = [], []
    for e, acc in ((eng, got), (full, want)):
        h = e.open_stream("s")
        e.push(h, wave)
        acc.extend(ws.score for ws in e.drain())
        e.close_stream(h)
    assert len(got) == len(want) > 0
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_auto_batch_respects_mesh_tiling(tiny):
    """Under a mesh, auto_batch's shrunken dispatch batches must stay
    multiples of the mesh axis (the batch rows shard evenly)."""
    from jax.sharding import Mesh

    model, params, stats, cfg, duration = tiny
    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))
    n = mesh.shape["data"]
    full = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                             max_streams=16, hbm_limit=0, mesh=mesh)
    floor = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                              max_streams=16, score_batch=n,
                              extend_batch=n, esc_batch=n, hbm_limit=0,
                              mesh=mesh)
    limit = (floor.hbm_estimate + full.hbm_estimate) // 2
    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            max_streams=16, hbm_limit=limit,
                            auto_batch=True, mesh=mesh)
    assert eng.score_batch < full.score_batch
    assert eng.score_batch % n == 0
    assert eng.extend_batch % n == 0
    assert eng.esc_batch % n == 0


def test_capped_score_batch_caps_extend_batch(tiny):
    """The one-knob HBM escape hatch: capping score_batch alone also caps
    the extend batch when the device HBM is unknown (r3: at S=1024 an
    uncapped extend's conv activations faulted the worker even though
    score_batch was capped), while an explicit extend_batch still wins.
    (With a KNOWN HBM limit the default is estimate-aware — see
    test_hbm_aware_extend_batch_default.)"""
    model, params, stats, cfg, duration = tiny
    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            max_streams=8, score_batch=2, hbm_limit=0)
    assert eng.extend_batch == 2
    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            max_streams=8, score_batch=2, extend_batch=4,
                            hbm_limit=0)
    assert eng.extend_batch == 4


def test_hbm_aware_extend_batch_default(tiny):
    """r4 (VERDICT item 1): when score_batch is capped for HBM but the
    pre-flight estimate says the FULL-width extend batch still fits, the
    extend_batch default goes back to max_streams (the one-knob cap
    staggered window availability into half-full score dispatches:
    141.6 -> 79.6 device-ms/tick at S=1024 gated cascade). It falls back
    to the cap when the full extend does not fit or HBM is unknown, and
    an explicit extend_batch is never overridden."""
    model, params, stats, cfg, duration = tiny
    full = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                             max_streams=8, score_batch=2, extend_batch=8,
                             hbm_limit=0)
    capped = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                               max_streams=8, score_batch=2, extend_batch=2,
                               hbm_limit=0)
    assert capped.hbm_estimate < full.hbm_estimate

    # generous limit: the implicit extend default uncaps to max_streams
    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            max_streams=8, score_batch=2,
                            hbm_limit=full.hbm_estimate + 1)
    assert (eng.extend_batch, eng.score_batch) == (8, 2)
    assert eng.hbm_estimate == full.hbm_estimate

    # limit between the capped and full estimates: cap is kept
    mid = (capped.hbm_estimate + full.hbm_estimate) // 2
    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            max_streams=8, score_batch=2, hbm_limit=mid)
    assert eng.extend_batch == 2
    assert eng.hbm_estimate == capped.hbm_estimate

    # explicit extend_batch wins even when the full width would fit
    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            max_streams=8, score_batch=2, extend_batch=4,
                            hbm_limit=full.hbm_estimate + 1)
    assert eng.extend_batch == 4


def test_auto_batch_composes_with_extend_uncap(tiny):
    """auto_batch shrinks score_batch to fit, then the HBM-aware extend
    default restores extend_batch = max_streams when the post-shrink
    estimate allows it."""
    model, params, stats, cfg, duration = tiny
    # limit chosen so (score=4, extend=8) fits exactly but (8, 8) does not
    target = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                               max_streams=8, score_batch=4, extend_batch=8,
                               hbm_limit=0)
    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            max_streams=8, hbm_limit=target.hbm_estimate,
                            auto_batch=True)
    assert eng.score_batch == 4
    assert eng.extend_batch == 8
    assert eng.hbm_estimate <= target.hbm_estimate


def test_zero_segment_fastpath_exact(tiny):
    """r4 extend fastpath: exact-zero (dead-air) segments route to a
    scatter-only const program and the live extend drops to the half
    shape when it fits — BIT-EXACT vs the plain engine for audio that
    interleaves speech, exact silence, and straddling windows, with
    escalation reading the sample ring across the same boundaries."""
    model, params, stats, cfg, duration = tiny
    hop = duration // 2
    rng = np.random.default_rng(11)
    # loud | 4 hops of exact zeros | loud — windows straddle both edges
    wave = np.concatenate([
        rng.standard_normal(2 * hop).astype(np.float32) * 0.1,
        np.zeros(4 * hop, np.float32),
        rng.standard_normal(2 * hop + duration).astype(np.float32) * 0.1,
    ])
    esc_model = model
    evars_band = 1e9  # escalate everything: sample-ring content checked

    outs = []
    for fast in (False, True):
        eng = MultiStreamScorer(model, params, stats, cfg,
                                duration=duration, hop=hop, max_streams=4,
                                transport_dtype="int16",
                                extend_fastpath=fast,
                                escalate=(esc_model, params, stats),
                                escalate_band=evars_band)
        h = eng.open_stream("z")
        for i in range(0, len(wave), 700):  # uneven pushes
            eng.push(h, wave[i:i + 700])
        eng.close_stream(h, flush=True)
        outs.append(sorted(eng.drain(), key=lambda g: g.start_sample))
        if fast:
            assert eng.zero_segments > 0
            # a sub-shape rung (half or the default quarter) carried at
            # least one live extend
            assert eng.dispatch_counts["extend_half"] \
                + eng.dispatch_counts["extend_quarter"] > 0
    ref, got = outs
    assert len(ref) == len(got) > 0
    assert [g.start_sample for g in got] == [g.start_sample for g in ref]
    assert [g.escalated for g in got] == [g.escalated for g in ref]
    np.testing.assert_array_equal([g.score for g in got],
                                  [g.score for g in ref])


def test_shape_ladder_helper():
    """Rung geometry: successive halvings, mesh-axis rounding, zero-row
    rungs dropped, deep-rung naming."""
    from rtdsd_tpu.engine.serving import _shape_ladder

    assert _shape_ladder(512, 2, "extend", 1) == \
        [(256, "extend_half"), (128, "extend_quarter")]
    # mesh multiple: rungs round DOWN to n and drop at zero
    assert _shape_ladder(512, 2, "extend", 8) == \
        [(256, "extend_half"), (128, "extend_quarter")]
    assert _shape_ladder(24, 3, "score", 8) == [(8, "score_half")]
    assert _shape_ladder(4, 3, "extend", 8) == []
    assert _shape_ladder(64, 4, "x", 1) == \
        [(32, "x_half"), (16, "x_quarter"), (8, "x_eighth"),
         (4, "x_1_16")]
    assert _shape_ladder(64, 0, "x", 1) == []


def test_dispatch_detail_keys_covers_deep_rungs():
    """The cost-breakdown ordering is built from the live counter keys, so
    rungs deeper than '_eighth' (and any future counters) are never
    silently dropped (advisor r4); family order extend -> score ->
    escalate, base before rungs, extend_const last in its family."""
    from rtdsd_tpu.engine.serving import dispatch_detail_keys

    counts = {"extend": 1, "extend_const": 2, "score": 3, "escalate": 4,
              "extend_half": 5, "extend_quarter": 6, "score_half": 7,
              "escalate_half": 8, "escalate_quarter": 9,
              "escalate_eighth": 10, "escalate_1_16": 11, "other": 12}
    keys = dispatch_detail_keys(counts)
    assert set(keys) == set(counts)
    assert keys.index("extend") < keys.index("extend_half") \
        < keys.index("extend_quarter") < keys.index("extend_const")
    assert keys.index("extend_const") < keys.index("score")
    assert keys.index("score") < keys.index("score_half") \
        < keys.index("escalate")
    assert keys.index("escalate") < keys.index("escalate_half") \
        < keys.index("escalate_1_16")
    assert "escalate_1_16" in keys  # the deep rung the old tuple dropped
    assert keys[-1] == "other"


def test_rung_rows_reports_actual_dispatch_rows(tiny):
    """rung_rows maps every counter to its TRUE row count — the honest
    source for capacity accounting, since positional rung names like
    'half' understate mesh rounding (advisor r4)."""
    model, params, stats, cfg, dur = tiny
    eng = MultiStreamScorer(model, params, stats, cfg, duration=dur,
                            hop=dur // 2, max_streams=4, score_batch=4,
                            extend_rungs=2)
    assert eng.rung_rows["score"] == 4
    assert eng.rung_rows["extend"] == eng.extend_batch
    for rows, name in eng._extend_rungs:
        assert eng.rung_rows[name] == rows
    assert set(eng.dispatch_counts) <= set(eng.rung_rows) | {"extend_half",
                                                             "extend_quarter"}


def test_extend_ladder_quarter_rung(tiny):
    """extend_rungs=2: when the live rows fit a QUARTER of the extend
    batch the dispatch drops two rungs (smallest fitting shape wins),
    stays bit-exact vs the plain engine, and the rung is visible in
    dispatch_counts/device_costs."""
    model, params, stats, cfg, duration = tiny
    hop = duration // 2
    rng = np.random.default_rng(17)
    loud = rng.standard_normal(4 * hop + duration).astype(np.float32) * 0.1
    dead = np.zeros_like(loud)

    outs = []
    for fast, rungs in ((False, 0), (True, 2)):
        eng = MultiStreamScorer(model, params, stats, cfg,
                                duration=duration, hop=hop, max_streams=8,
                                transport_dtype="int16",
                                extend_fastpath=fast, extend_rungs=rungs)
        if fast:
            assert [nm for _b, nm in eng._extend_rungs] == \
                ["extend_half", "extend_quarter"]
            assert eng._extend_rungs[1][0] == eng.extend_batch // 4
        hs = [eng.open_stream("live"), eng.open_stream("dtx")]
        for i in range(0, len(loud), 900):
            eng.push(hs[0], loud[i:i + 900])
            eng.push(hs[1], dead[i:i + 900])
        for h in hs:
            eng.close_stream(h, flush=True)
        outs.append(sorted(eng.drain(),
                           key=lambda g: (g.stream_id, g.start_sample)))
        if fast:
            # 1 live stream: small drain polls ride the quarter rung (a
            # backlogged poll may batch enough same-stream segments to
            # need the half rung, but never the full shape)
            assert eng.dispatch_counts["extend_quarter"] > 0
            assert eng.dispatch_counts["extend"] == 0
            costs = eng.device_costs(n=2)
            assert costs["extend_quarter"] > 0
            # deterministic rung choice: exactly ONE live segment due ->
            # the smallest rung (quarter), not half or full
            h2 = eng.open_stream("one-seg")
            eng.push(h2, loud[:eng.seg_samples])
            before = dict(eng.dispatch_counts)
            eng.poll()
            delta = {k: eng.dispatch_counts[k] - before[k]
                     for k in before}
            assert delta["extend_quarter"] == 1
            assert delta["extend"] == delta["extend_half"] == 0
            eng.close_stream(h2)
    ref, got = outs
    assert len(ref) == len(got) > 0
    np.testing.assert_array_equal([g.score for g in got],
                                  [g.score for g in ref])


def test_score_and_esc_rungs(tiny):
    """Opt-in score/esc ladders: when due loud windows (or the final
    escalation chunk) fit a half shape, the dispatch drops to the rung —
    escalation decisions and gated flags identical to the fixed-shape
    engine, scores equal to f32 tolerance (a different batch shape
    retiles the model forward, ~1e-6 reassociation — unlike the conv
    extend ladder, which is bit-exact because each conv row is computed
    independently of its batch neighbors)."""
    model, params, stats, cfg, duration = tiny
    hop = duration // 2
    rng = np.random.default_rng(23)
    loud = rng.standard_normal(4 * hop + duration).astype(np.float32) * 0.1
    dead = np.zeros_like(loud)

    outs = []
    for rungs in (0, 1):
        eng = MultiStreamScorer(model, params, stats, cfg,
                                duration=duration, hop=hop, max_streams=8,
                                transport_dtype="int16",
                                gate_rms_dbfs=-50.0, gate_score=-7.0,
                                escalate=(model, params, stats),
                                escalate_band=1e9,
                                score_rungs=rungs, esc_rungs=rungs)
        if rungs:
            assert eng._score_rungs == [(eng.score_batch // 2,
                                         "score_half")]
            assert eng._esc_rungs == [(eng.esc_batch // 2,
                                       "escalate_half")]
        hs = [eng.open_stream("live"), eng.open_stream("dtx")]
        res = []
        for i in range(0, len(loud), 900):
            eng.push(hs[0], loud[i:i + 900])
            eng.push(hs[1], dead[i:i + 900])
            res += eng.poll()
        for h in hs:
            eng.close_stream(h, flush=True)
        res += eng.drain()
        outs.append(sorted(res,
                           key=lambda g: (g.stream_id, g.start_sample)))
        if rungs:
            # 1 loud stream against score_batch=8: every score dispatch
            # fits the half rung; the full shape never runs
            assert eng.dispatch_counts["score_half"] > 0
            assert eng.dispatch_counts["score"] == 0
            assert eng.dispatch_counts["escalate_half"] > 0
            costs = eng.device_costs(n=2)
            assert costs["score_half"] > 0
            assert costs["escalate_half"] > 0
    ref, got = outs
    assert len(ref) == len(got) > 0
    assert [g.gated for g in got] == [g.gated for g in ref]
    assert [g.escalated for g in got] == [g.escalated for g in ref]
    assert any(g.escalated for g in got)
    np.testing.assert_allclose([g.score for g in got],
                               [g.score for g in ref],
                               rtol=1e-5, atol=1e-5)


def test_zero_segment_fastpath_with_gate_and_swap(tiny):
    """Fastpath composes with the energy gate (gated flags identical) and
    survives a hot weight swap (conv(0) rows re-derive for the new conv
    weights — a stale const row block would poison the ring)."""
    model, params, stats, cfg, duration = tiny
    hop = duration // 2
    rng = np.random.default_rng(13)
    wave = np.concatenate([
        np.zeros(2 * hop, np.float32),
        rng.standard_normal(2 * hop + duration).astype(np.float32) * 0.1,
    ])

    outs = []
    for fast in (False, True):
        eng = MultiStreamScorer(model, params, stats, cfg,
                                duration=duration, hop=hop, max_streams=2,
                                transport_dtype="int16",
                                extend_fastpath=fast,
                                gate_rms_dbfs=-50.0, gate_score=-7.0)
        h = eng.open_stream("g")
        eng.push(h, wave)
        eng.close_stream(h, flush=True)
        outs.append(sorted(eng.drain(), key=lambda g: g.start_sample))
    ref, got = outs
    assert [g.gated for g in got] == [g.gated for g in ref]
    assert any(g.gated for g in got)
    np.testing.assert_array_equal([g.score for g in got],
                                  [g.score for g in ref])

    # hot swap: scaled conv weights change conv(0) (LN biases differ) —
    # the fastpath engine must re-derive, matching a fresh plain engine
    import jax as _jax

    new_params = _jax.tree_util.tree_map(lambda x: x * 1.1, params)
    fast_eng = MultiStreamScorer(model, params, stats, cfg,
                                 duration=duration, hop=hop,
                                 max_streams=2, transport_dtype="int16",
                                 extend_fastpath=True)
    fast_eng.swap_model(new_params, stats)
    plain_eng = MultiStreamScorer(model, new_params, stats, cfg,
                                  duration=duration, hop=hop,
                                  max_streams=2, transport_dtype="int16",
                                  extend_fastpath=False)
    res = []
    for eng in (fast_eng, plain_eng):
        h = eng.open_stream("s")
        eng.push(h, wave)
        eng.close_stream(h, flush=True)
        res.append([g.score for g in sorted(eng.drain(),
                                            key=lambda g: g.start_sample)])
    np.testing.assert_array_equal(res[0], res[1])


def test_dispatch_counts_and_device_costs(tiny):
    """Capacity accounting: dispatch_counts tracks one increment per device
    program call (the O(1)-dispatches-per-poll claim), and device_costs
    returns a positive amortized ms per program."""
    model, params, stats, cfg, duration = tiny
    hop = duration // 2
    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            hop=hop, max_streams=2)
    h = eng.open_stream("acct")
    eng.push(h, np.zeros(2 * hop + duration, np.float32))
    polls_with_work = 0
    while True:
        before = dict(eng.dispatch_counts)
        out = eng.poll()
        delta = {k: eng.dispatch_counts[k] - before[k]
                 for k in eng.dispatch_counts}
        if not (eng._last_poll_work or out):
            assert not any(delta.values())
            break
        polls_with_work += 1
        # O(1)/poll: at most one live extend (full OR a ladder rung),
        # one const scatter, one score
        assert sum(delta[k] for k in delta
                   if k.startswith("extend") and k != "extend_const") <= 1
        assert delta["extend_const"] <= 1 and delta["score"] <= 1
    assert polls_with_work >= 1
    # the pushed audio is all zeros, so the fastpath routes every segment
    # through the const scatter program
    assert eng.dispatch_counts["extend_const"] >= 1
    assert sum(v for k, v in eng.dispatch_counts.items()
               if k.startswith("extend") and k != "extend_const") == 0
    assert eng.dispatch_counts["score"] >= 1

    costs = eng.device_costs(n=2)
    assert {"extend", "extend_const", "score"} <= set(costs)
    assert all(v > 0 for v in costs.values())
    # the accounting itself must not perturb stream state
    eng.close_stream(h, flush=True)
    assert len(eng.drain()) >= 1


def test_multichip_serving_matches_single_device(tiny):
    """SPMD serving (mesh=): ring slot axis + batch rows sharded over an
    8-device mesh must reproduce the single-device engine's window scores
    exactly — XLA inserts the cross-chip gathers; the host scheduler is
    unchanged."""
    from jax.sharding import Mesh

    model, params, stats, cfg, duration = tiny
    hop = duration // 2
    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))
    rng = np.random.default_rng(41)
    waves = [rng.standard_normal(3 * hop + duration).astype(np.float32) * 0.1
             for _ in range(3)]

    def run(engine_kwargs):
        eng = MultiStreamScorer(model, params, stats, cfg,
                                duration=duration, hop=hop, max_streams=4,
                                **engine_kwargs)
        out = []
        hs = [eng.open_stream(f"s{i}") for i in range(len(waves))]
        for h, w in zip(hs, waves):
            eng.push(h, w)
        for h in hs:
            eng.close_stream(h, flush=True)
        out.extend(eng.drain())
        return sorted(out, key=lambda g: (str(g.stream_id), g.start_sample))

    single = run({})
    sharded = run({"mesh": mesh})
    assert [(g.stream_id, g.start_sample) for g in single] == \
        [(g.stream_id, g.start_sample) for g in sharded]
    np.testing.assert_allclose([g.score for g in sharded],
                               [g.score for g in single],
                               rtol=2e-4, atol=2e-5)


def test_multichip_serving_with_cascade_and_int16(tiny):
    """mesh= composes with int16 transport and cascade escalation (batch
    sizes round up to mesh multiples; escalated scores stay exactly the
    flagship's)."""
    from jax.sharding import Mesh

    model, params, stats, cfg, duration = tiny
    hop = duration // 2
    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))
    rng = np.random.default_rng(43)
    wave = rng.standard_normal(2 * hop + duration).astype(np.float32) * 0.1

    def run(mesh_arg):
        eng = MultiStreamScorer(
            model, params, stats, cfg, duration=duration, hop=hop,
            max_streams=2, transport_dtype="int16",
            escalate=(model, params, stats), escalate_band=1e9,
            mesh=mesh_arg)
        assert eng.extend_batch % (8 if mesh_arg is not None else 1) == 0
        h = eng.open_stream("c")
        eng.push(h, wave)
        eng.close_stream(h, flush=True)
        return sorted(eng.drain(), key=lambda g: g.start_sample)

    single = run(None)
    sharded = run(mesh)
    assert all(g.escalated for g in sharded)  # band covers everything
    np.testing.assert_allclose([g.score for g in sharded],
                               [g.score for g in single],
                               rtol=2e-4, atol=2e-5)


def test_push_int16_under_float32_transport_dequantizes(tiny):
    """Raw int16 PCM pushed under the default float32 transport must be
    dequantized on the host (under int16 transport the device extend does
    x/32768) — a bare astype fed the model +-32768-scale waves (r3 review
    finding)."""
    model, params, stats, cfg, duration = tiny
    rng = np.random.default_rng(47)
    wave = rng.standard_normal(duration).astype(np.float32) * 0.1
    q = np.clip(np.rint(wave * 32768.0), -32768, 32767).astype(np.int16)
    wave_q = (q.astype(np.float32) / 32768.0)

    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            hop=duration // 2, max_streams=2,
                            transport_dtype="float32")
    h = eng.open_stream("pcm32")
    eng.push(h, q)  # raw PCM into the float transport
    eng.close_stream(h, flush=True)
    got = eng.drain()
    exp = _expected_window_scores(model, params, stats, wave_q, duration,
                                  duration // 2)
    np.testing.assert_allclose([got[0].score], exp[:1], rtol=2e-4,
                               atol=2e-5)


def test_rejects_sparse_hop_and_multiaxis_mesh(tiny):
    model, params, stats, cfg, duration = tiny
    with pytest.raises(ValueError, match="must not exceed"):
        MultiStreamScorer(model, params, stats, cfg, duration=duration,
                          hop=2 * duration)
    from jax.sharding import Mesh
    devs = np.array(jax.devices()).reshape(2, -1)
    with pytest.raises(ValueError, match="one axis"):
        MultiStreamScorer(model, params, stats, cfg, duration=duration,
                          mesh=Mesh(devs, ("data", "model")))


def test_overload_fairness_no_stream_starves(tiny):
    """Under sustained overload (due windows per poll > score_batch), the
    round-robin rotation must spread capacity over every stream instead of
    letting low-index slots monopolize the batch (high-index starvation)."""
    model, params, stats, cfg, duration = tiny
    hop = duration // 2
    n_streams, per_stream_wins = 6, 4
    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            hop=hop, max_streams=n_streams,
                            score_batch=2, extend_batch=4)
    rng = np.random.default_rng(3)
    handles = [eng.open_stream(f"s{i}") for i in range(n_streams)]
    # extra tail so the first per_stream_wins windows are scoreable
    # without a flush (the final window's conv frames need the
    # receptive-field tail beyond the last hop boundary)
    t = (per_stream_wins + 1) * hop + duration
    for h in handles:
        eng.push(h, rng.standard_normal(t).astype(np.float32) * 0.1)

    first_scored_at = {}
    counts = {f"s{i}": 0 for i in range(n_streams)}
    for tick in range(200):
        for ws in eng.poll():
            counts[ws.stream_id] += 1
            first_scored_at.setdefault(ws.stream_id, tick)
        if all(c >= per_stream_wins for c in counts.values()):
            break
    # every stream fully scored, and nobody waited for everyone else to
    # finish first: the last stream to start must begin well before the
    # backlog is done (strict FIFO-by-slot would put it at the very end)
    assert all(c >= per_stream_wins for c in counts.values()), counts
    total_polls = max(first_scored_at.values())
    backlog_polls = n_streams * per_stream_wins / 2  # score_batch=2
    assert total_polls < backlog_polls * 0.75, (first_scored_at, counts)


# ---------------------------------------------------------- energy gate


def _gated_wave(rng, duration, hop):
    """[loud window | silence | loud tail] on the hop grid: windows that
    cover only the silent span must gate; windows touching loud audio
    must score normally."""
    loud1 = rng.standard_normal(duration).astype(np.float32) * 0.1
    silence = np.zeros(2 * duration, np.float32)
    loud2 = rng.standard_normal(duration).astype(np.float32) * 0.1
    return np.concatenate([loud1, silence, loud2])


def test_energy_gate_skips_silent_windows(tiny):
    """Windows fully inside silence emit gate_score with gated=True and
    NO score dispatch; every window that touches loud audio scores
    byte-identically to an ungated engine; ordering and slot release
    are unaffected."""
    model, params, stats, cfg, duration = tiny
    hop = duration // 2
    rng = np.random.default_rng(31)
    wave = _gated_wave(rng, duration, hop)

    def run(**kw):
        eng = MultiStreamScorer(model, params, stats, cfg,
                                duration=duration, hop=hop,
                                max_streams=2, **kw)
        h = eng.open_stream("g")
        for i in range(0, len(wave), 700):
            eng.push(h, wave[i:i + 700])
        eng.close_stream(h, flush=True)
        out = sorted(eng.drain(), key=lambda g: g.start_sample)
        return eng, out

    base_eng, base = run()
    gate_eng, gated = run(gate_rms_dbfs=-50.0, gate_score=-7.5)

    assert [g.start_sample for g in gated] == \
        [g.start_sample for g in base]
    n_gated = 0
    for b, g in zip(base, gated):
        # a window is all-silence iff its sample span lies in the
        # silent middle [duration, 3*duration)
        silent = (b.start_sample >= duration
                  and b.start_sample + duration <= 3 * duration)
        if silent:
            assert g.gated and g.score == -7.5 and not g.escalated
            n_gated += 1
        else:
            assert not g.gated
            assert g.score == pytest.approx(b.score, abs=0.0)
    assert n_gated >= 2  # the construction guarantees silent windows
    assert gate_eng.gated_windows == n_gated
    # the gate actually saved score dispatches
    assert gate_eng.dispatch_counts["score"] < \
        base_eng.dispatch_counts["score"]
    assert gate_eng.active_streams == 0  # flush still releases the slot


def test_energy_gate_emission_order_is_monotone_per_stream(tiny):
    """Within one poll, gated windows are resolved host-side BEFORE the
    score dispatch, so a stream's gated window w+1 could be emitted ahead
    of its scored window w (daemon clients see per-stream timestamps go
    backwards). poll() must reorder its own emissions so each stream's
    start_samples are non-decreasing in the raw, unsorted output."""
    model, params, stats, cfg, duration = tiny
    hop = duration // 2
    rng = np.random.default_rng(47)
    # [loud | 2d silence | loud]: in a single poll the loud windows score
    # while the silent middle gates — the inversion-prone interleave
    wave = _gated_wave(rng, duration, hop)
    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            hop=hop, max_streams=2, extend_batch=32,
                            score_batch=16, gate_rms_dbfs=-50.0,
                            gate_score=-7.5)
    h = eng.open_stream("m")
    eng.push(h, wave)  # everything due at once
    eng.close_stream(h, flush=True)
    out = eng.drain()  # NOT sorted — emission order is the contract
    assert any(g.gated for g in out) and any(not g.gated for g in out)
    starts = [g.start_sample for g in out if g.stream_id == "m"]
    assert starts == sorted(starts), starts


def test_energy_gate_threshold_semantics(tiny):
    """A quiet-but-present tone above the threshold must NOT gate; the
    same tone below the threshold must. Threshold is RMS dBFS: a
    sine of amplitude a has RMS a/sqrt(2)."""
    model, params, stats, cfg, duration = tiny
    hop = duration // 2

    def run(amp, gate_db):
        eng = MultiStreamScorer(model, params, stats, cfg,
                                duration=duration, hop=hop, max_streams=1,
                                gate_rms_dbfs=gate_db, gate_score=0.0)
        t = np.arange(2 * duration, dtype=np.float32)
        wave = (amp * np.sin(2 * np.pi * 440 * t / 16000)) \
            .astype(np.float32)
        h = eng.open_stream("t")
        eng.push(h, wave)
        eng.close_stream(h, flush=True)
        out = eng.drain()
        return all(g.gated for g in out), any(g.gated for g in out)

    # amp 0.01 -> RMS ~ -43 dBFS: above a -50 gate, below a -30 gate
    all_g, any_g = run(0.01, -50.0)
    assert not any_g
    all_g, any_g = run(0.01, -30.0)
    assert all_g


def test_energy_gate_int16_transport_matches_float(tiny):
    """Gating decisions are taken on the decoded amplitude scale, so the
    same wave gates identically under float32 and int16 transports."""
    model, params, stats, cfg, duration = tiny
    hop = duration // 2
    rng = np.random.default_rng(5)
    wave = _gated_wave(rng, duration, hop)

    def run(transport):
        eng = MultiStreamScorer(model, params, stats, cfg,
                                duration=duration, hop=hop, max_streams=1,
                                transport_dtype=transport,
                                gate_rms_dbfs=-50.0, gate_score=1.0)
        h = eng.open_stream("x")
        eng.push(h, wave)
        eng.close_stream(h, flush=True)
        return [g.gated for g in
                sorted(eng.drain(), key=lambda g: g.start_sample)]

    assert run("float32") == run("int16") == run("mulaw8")


def test_energy_gate_ordering_under_tiny_score_batch(tiny):
    """With score_batch=1 and interleaved loud/silent windows the gate
    must never let next_win skip an unscored loud window: all windows
    arrive, in order, with loud ones equal to the ungated engine."""
    model, params, stats, cfg, duration = tiny
    hop = duration // 2
    rng = np.random.default_rng(11)
    wave = _gated_wave(rng, duration, hop)

    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            hop=hop, max_streams=2, score_batch=1,
                            extend_batch=2,
                            gate_rms_dbfs=-50.0, gate_score=0.0)
    hs = [eng.open_stream(f"s{i}") for i in range(2)]
    for h in hs:
        eng.push(h, wave)
        eng.close_stream(h, flush=True)
    out = eng.drain()
    for i in range(2):
        mine = sorted([g for g in out if g.stream_id == f"s{i}"],
                      key=lambda g: g.start_sample)
        exp = _expected_window_scores(model, params, stats, wave,
                                      duration, hop)
        assert [g.start_sample for g in mine] == \
            [s * hop for s in range(len(exp))]
        for g, e in zip(mine, exp):
            if not g.gated:
                assert g.score == pytest.approx(float(e), rel=2e-4,
                                                abs=2e-5)


def test_energy_gate_rejects_positive_threshold(tiny):
    model, params, stats, cfg, duration = tiny
    with pytest.raises(ValueError, match="dBFS"):
        MultiStreamScorer(model, params, stats, cfg, duration=duration,
                          hop=duration // 2, max_streams=1,
                          gate_rms_dbfs=3.0)


# ------------------------------------------------------- hot model swap


def test_swap_model_hot_reload(tiny):
    """swap_model replaces the weights with no recompile, ring rebuild
    or stream churn: after an immediate swap, every window scores as the
    NEW checkpoint (daemon SIGHUP reload path); architecture mismatches
    raise before any state is touched."""
    model, params, stats, cfg, duration = tiny
    hop = duration // 2
    var_b = model.init(jax.random.key(99), jnp.zeros((1, duration)))
    params_b, stats_b = var_b["params"], var_b.get("batch_stats", {})

    rng = np.random.default_rng(13)
    wave = rng.standard_normal(3 * hop + duration).astype(np.float32) * 0.1

    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            hop=hop, max_streams=2)
    h = eng.open_stream("s")
    eng.swap_model(params_b, stats_b)  # before any push: pure new-model
    assert eng.model_swaps == 1
    eng.push(h, wave)
    eng.close_stream(h, flush=True)
    got = sorted(eng.drain(), key=lambda g: g.start_sample)

    exp_b = _expected_window_scores(model, params_b, stats_b, wave,
                                    duration, hop)
    exp_a = _expected_window_scores(model, params, stats, wave,
                                    duration, hop)
    np.testing.assert_allclose([g.score for g in got[:len(exp_b)]],
                               exp_b, rtol=2e-4, atol=2e-5)
    # and they are genuinely the new model's, not the old one's
    assert not np.allclose([g.score for g in got[:len(exp_a)]], exp_a,
                           rtol=2e-4, atol=2e-5)

    # structure mismatch (e.g. different quantization mode) raises
    leaves, treedef = jax.tree_util.tree_flatten(params_b)
    with pytest.raises(ValueError, match="tree structure"):
        eng.swap_model({"not": leaves[0]}, stats_b)
    # shape mismatch names the offending leaf
    bad = [jnp.zeros(tuple(d + 1 for d in leaves[0].shape),
                     leaves[0].dtype)] + leaves[1:]
    with pytest.raises(ValueError, match="swap_model: params"):
        eng.swap_model(jax.tree_util.tree_unflatten(treedef, bad),
                       stats_b)
    # escalate swap without a cascade raises
    with pytest.raises(ValueError, match="without a cascade"):
        eng.swap_model(params_b, stats_b,
                       escalate=(params_b, stats_b))
    assert eng.model_swaps == 1  # failed swaps don't count


def test_swap_model_cascade_flagship(tiny):
    """With a cascade, swap_model(escalate=...) hot-swaps the flagship:
    an always-escalating engine reproduces the NEW flagship's direct
    scores after the swap."""
    model, params, stats, cfg, duration = tiny
    hop = duration // 2
    var_b = model.init(jax.random.key(7), jnp.zeros((1, duration)))
    params_b, stats_b = var_b["params"], var_b.get("batch_stats", {})

    rng = np.random.default_rng(17)
    wave = rng.standard_normal(2 * hop + duration).astype(np.float32) * 0.1

    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            hop=hop, max_streams=2,
                            escalate=(model, params, stats),
                            escalate_band=1e9)  # every window escalates
    eng.swap_model(params, stats, escalate=(params_b, stats_b))
    h = eng.open_stream("c")
    eng.push(h, wave)
    eng.close_stream(h, flush=True)
    got = sorted(eng.drain(), key=lambda g: g.start_sample)
    assert got and all(g.escalated for g in got)

    exp_b = _expected_window_scores(model, params_b, stats_b, wave,
                                    duration, hop)
    np.testing.assert_allclose([g.score for g in got[:len(exp_b)]],
                               exp_b, rtol=2e-4, atol=2e-5)


def test_swap_model_quantized_w8a8(tiny):
    """Hot reload under w8a8 serving: reload_params re-applies the same
    quantization, so two checkpoints' quantized trees share structure
    and swap cleanly; post-swap scores equal direct scoring through the
    new quantized params."""
    import dataclasses

    from rtdsd_tpu.models.quantize import quantize_encoder_params

    model, params, stats, cfg, duration = tiny
    cfg_q = dataclasses.replace(cfg, w8=True, a8=True)
    model_q = XLSR_AASIST(w2v_cfg=cfg_q)
    qparams = quantize_encoder_params(params)
    var_b = model.init(jax.random.key(5), jnp.zeros((1, duration)))
    qparams_b = quantize_encoder_params(var_b["params"])
    stats_b = var_b.get("batch_stats", {})

    hop = duration // 2
    rng = np.random.default_rng(23)
    wave = rng.standard_normal(2 * hop + duration).astype(np.float32) * 0.1

    eng = MultiStreamScorer(model_q, qparams, stats, cfg_q,
                            duration=duration, hop=hop, max_streams=2)
    eng.swap_model(qparams_b, stats_b)
    h = eng.open_stream("q")
    eng.push(h, wave)
    eng.close_stream(h, flush=True)
    got = sorted(eng.drain(), key=lambda g: g.start_sample)

    exp_b = _expected_window_scores(model_q, qparams_b, stats_b, wave,
                                    duration, hop)
    np.testing.assert_allclose([g.score for g in got[:len(exp_b)]],
                               exp_b, rtol=2e-4, atol=2e-5)
    # a FULL-PRECISION tree must be rejected (different structure)
    with pytest.raises(ValueError, match="tree structure"):
        eng.swap_model(params, stats)


def _drive_hop_by_hop(eng, wave, hop, handle):
    """Push one hop at a time, polling after each (steady-state serving
    cadence: ~1 window due per poll)."""
    got = []
    for i in range(0, len(wave), hop):
        eng.push(handle, wave[i:i + hop])
        got.extend(eng.poll())
    eng.close_stream(handle, flush=True)
    got.extend(eng.drain())
    return got


def test_auto_provision_deepens_ladders_and_preserves_windows(tiny):
    """r5 adaptive provisioning: an engine provisioned for 8-wide score
    dispatches but fed ~1 due window per poll deepens its score ladder
    from observed EMAs after the hysteresis window — no batch knobs
    passed — and the full window set (starts AND scores) matches a
    fixed-shape auto_provision=False engine. Resize safety: ladder
    deepening must never drop or duplicate a window."""
    model, params, stats, cfg, duration = tiny
    hop = duration // 2
    rng = np.random.default_rng(23)
    # enough hops to clear the 48-poll hysteresis with work every poll
    wave = rng.standard_normal(70 * hop + duration).astype(np.float32) * 0.1

    runs = {}
    for auto in (False, True):
        eng = MultiStreamScorer(model, params, stats, cfg,
                                duration=duration, hop=hop, max_streams=8,
                                score_batch=8, esc_batch=8,
                                escalate=(model, params, stats),
                                escalate_band=1e9,  # every window escalates
                                auto_provision=auto)
        assert eng._auto_provision is auto
        base_score_rungs = list(eng._score_rungs)
        got = _drive_hop_by_hop(eng, wave, hop, eng.open_stream("a"))
        runs[auto] = sorted(got, key=lambda g: g.start_sample)
        if auto:
            # ladders deepened beyond the defaults and actually engaged
            assert len(eng._score_rungs) > len(base_score_rungs)
            assert len(eng._esc_rungs) > 0
            assert sum(eng.dispatch_counts[nm]
                       for _rb, nm in eng._score_rungs) > 0
            assert sum(eng.dispatch_counts[nm]
                       for _rb, nm in eng._esc_rungs) > 0
            assert eng._ap_budget < 6  # budget actually spent
            for _rb, nm in eng._score_rungs + eng._esc_rungs:
                assert nm in eng.rung_rows
        else:
            assert eng._score_rungs == [] and eng._esc_rungs == []

    fixed, adaptive = runs[False], runs[True]
    assert [g.start_sample for g in adaptive] == \
        [g.start_sample for g in fixed]
    assert [g.escalated for g in adaptive] == [g.escalated for g in fixed]
    # sub-shape dispatches retile fusion: scores agree to float tolerance
    np.testing.assert_allclose([g.score for g in adaptive],
                               [g.score for g in fixed],
                               rtol=1e-4, atol=1e-5)


def test_auto_provision_hysteresis_and_gates(tiny):
    """Short workloads (< provision_after polls) never trigger adaptation;
    auto_provision=False and exported fixed-shape engines
    (_subshape_ok=False) never adapt regardless of load."""
    model, params, stats, cfg, duration = tiny
    hop = duration // 2
    rng = np.random.default_rng(29)
    wave = rng.standard_normal(10 * hop + duration).astype(np.float32) * 0.1

    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            hop=hop, max_streams=8, score_batch=8)
    _drive_hop_by_hop(eng, wave, hop, eng.open_stream("s"))
    assert eng._score_rungs == []  # hysteresis: too few polls

    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            hop=hop, max_streams=8, score_batch=8,
                            provision_after=4)
    eng._subshape_ok = False  # exported-artifact case
    _drive_hop_by_hop(eng, wave, hop, eng.open_stream("s"))
    assert eng._score_rungs == []

    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            hop=hop, max_streams=8, score_batch=8,
                            provision_after=4, auto_provision=False)
    _drive_hop_by_hop(eng, wave, hop, eng.open_stream("s"))
    assert eng._score_rungs == []

    # and with a short hysteresis it DOES adapt on the same short load
    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            hop=hop, max_streams=8, score_batch=8,
                            provision_after=4)
    _drive_hop_by_hop(eng, wave, hop, eng.open_stream("s"))
    assert len(eng._score_rungs) > 0


def test_probe_hbm_monotone_ascent(tmp_path, monkeypatch):
    """r5 (VERDICT r4 item 3): the empirical HBM probe finds the usable
    limit against an injected allocator by MONOTONE ascent (on the axon
    relay the first failed allocation poisons later trials, so all
    refinement must precede any failure), records the sidecar, and
    _device_hbm_bytes picks it up where the device reports no
    bytes_limit (relay / CPU)."""
    from rtdsd_tpu.engine.serving import (_device_hbm_bytes,
                                          hbm_limit_file_path,
                                          probe_hbm_bytes)

    true_limit = int(13.3 * 2 ** 30)
    state = {"used": 0, "poisoned": False}

    def alloc():
        # model the relay: any failure poisons every later allocation
        if state["poisoned"] or state["used"] + 2 ** 30 > true_limit:
            state["poisoned"] = True
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")
        state["used"] += 2 ** 30
        return object()

    got = probe_hbm_bytes(alloc=alloc)
    # fixed 1 GiB blocks: 13 succeed, the 14th fails
    assert got == 13 * 2 ** 30
    state.update(used=0, poisoned=False)

    # max_gb cap: stop before ever failing
    alloc_count = [0]

    def alloc_ok():
        alloc_count[0] += 1
        return object()

    assert probe_hbm_bytes(max_gb=4.0, alloc=alloc_ok) == 4 * 2 ** 30
    assert alloc_count[0] == 4  # never probes past the cap

    # a dead device raises instead of calibrating nonsense
    def dead():
        raise RuntimeError("RESOURCE_EXHAUSTED")

    with pytest.raises(RuntimeError, match="GiB"):
        probe_hbm_bytes(alloc=dead)

    # record -> sidecar -> _device_hbm_bytes fallback chain
    path = str(tmp_path / "hbm.json")
    monkeypatch.setenv("RTDSD_HBM_LIMIT_FILE", path)
    monkeypatch.delenv("RTDSD_HBM_GB", raising=False)
    assert hbm_limit_file_path() == path
    rec = probe_hbm_bytes(alloc=alloc, record=True)
    import os as _os

    assert _os.path.exists(path)
    assert _device_hbm_bytes() == rec  # CPU reports no stats -> sidecar

    # env override outranks the sidecar
    monkeypatch.setenv("RTDSD_HBM_GB", "7.5")
    assert _device_hbm_bytes() == int(7.5 * 2 ** 30)

    # a sidecar recorded on a DIFFERENT device kind is ignored
    monkeypatch.delenv("RTDSD_HBM_GB", raising=False)
    import json as _json

    with open(path, "w") as fh:
        _json.dump({"bytes": 123, "device_kind": "TPU v9"}, fh)
    assert _device_hbm_bytes() is None


def test_hbm_sidecar_engages_extend_uncap(tiny, tmp_path, monkeypatch):
    """With a calibrated sidecar present, the HBM-aware extend default
    (keep extend_batch = max_streams when the estimate fits) engages on
    devices that report no bytes_limit — previously inert exactly there."""
    import json as _json

    model, params, stats, cfg, duration = tiny
    path = str(tmp_path / "hbm.json")
    monkeypatch.setenv("RTDSD_HBM_LIMIT_FILE", path)
    monkeypatch.delenv("RTDSD_HBM_GB", raising=False)

    def mk():
        return MultiStreamScorer(model, params, stats, cfg,
                                 duration=duration, hop=duration // 2,
                                 max_streams=8, score_batch=2)

    eng = mk()  # no limit known: capped fallback (+ stderr warning)
    assert eng.extend_batch == 2
    with open(path, "w") as fh:
        _json.dump({"bytes": 4 * 2 ** 30, "device_kind": "cpu"}, fh)
    eng = mk()  # sidecar limit known and the tiny config fits: uncap
    assert eng.extend_batch == 8


def test_provisioning_observability(tiny):
    """provisioning() reports the live shape ladders, adaptation state,
    and EMAs (the daemon stats line prints it)."""
    model, params, stats, cfg, duration = tiny
    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            hop=duration // 2, max_streams=8,
                            score_batch=8, extend_rungs=2, score_rungs=1)
    p = eng.provisioning()
    assert p["score"] == [8, 4]
    assert p["extend"][0] == eng.extend_batch
    assert len(p["extend"]) == 1 + len(eng._extend_rungs)
    assert p["escalate"] == []  # no cascade configured
    assert p["auto"] is True and p["auto_budget_left"] == 6
    assert p["ema"] == {}  # nothing dispatched yet


def test_esc_rate_sizes_esc_batch(tiny):
    """esc_rate (the calibration sidecar's measured dev escalation rate)
    sizes the escalation chunk as ~1.25 x rate x score_batch — the
    PERFORMANCE.md operational rule ("size esc_batch to the in-band
    rate"; esc cost is ~linear per row, padding pays real time) folded
    into the sweep -> sidecar -> serve flow. Explicit esc_batch wins;
    the rate never widens the chunk past the score batch that feeds it."""
    model, params, stats, cfg, duration = tiny

    def mk(**kw):
        return MultiStreamScorer(model, params, stats, cfg,
                                 duration=duration, max_streams=32,
                                 escalate=(model, params, stats),
                                 hbm_limit=0, **kw)

    assert mk().esc_batch == 8                  # historical score/4
    assert mk(esc_rate=0.1).esc_batch == 4      # ceil(1.25*0.1*32)
    assert mk(esc_rate=0.5).esc_batch == 20     # ceil(1.25*0.5*32)
    assert mk(esc_rate=0.0).esc_batch == 1      # one-row floor
    assert mk(esc_rate=1.0).esc_batch == 32     # capped at score_batch
    assert mk(esc_rate=0.1, esc_batch=16).esc_batch == 16  # explicit wins
    # rate follows the capped score batch, not max_streams
    assert mk(esc_rate=0.5, score_batch=16).esc_batch == 10
    with pytest.raises(ValueError, match="esc_rate"):
        mk(esc_rate=1.5)


def test_esc_rate_scales_through_auto_batch_shrink(tiny):
    """Under an auto_batch HBM shrink the escalation chunk follows the
    CAPPED score batch at the calibrated rate (sizing esc from the
    pre-shrink width would re-inflate the footprint the shrink just
    bought)."""
    model, params, stats, cfg, duration = tiny
    full = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                             max_streams=8, escalate=(model, params, stats),
                             hbm_limit=0)
    floor = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                              max_streams=8, score_batch=1, extend_batch=1,
                              esc_batch=1, escalate=(model, params, stats),
                              hbm_limit=0)
    limit = (floor.hbm_estimate + full.hbm_estimate) // 2
    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            max_streams=8, escalate=(model, params, stats),
                            esc_rate=0.5, auto_batch=True, hbm_limit=limit)
    assert eng.score_batch < 8  # the shrink engaged
    import math as _math

    assert eng.esc_batch <= max(1, _math.ceil(1.25 * 0.5
                                              * eng.score_batch))
