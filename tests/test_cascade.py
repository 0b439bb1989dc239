"""Cascade scoring tests: cheap screener + escalate-to-flagship.

Two surfaces:
- batch scoring (`cli/common.py::produce_evaluation_file_cascade`) — a
  second fixed-shape pass over the subset of uncertain trials;
- live serving (`engine/serving.py` ``escalate=``) — the flagship
  re-scores in-band windows from the screener's own conv ring.

Oracles are the single-model paths: band -> -1 must reproduce the
screener exactly, band -> inf the flagship exactly, and a mid band must
pick per-item between the two.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtdsd_tpu.cli.common import (produce_evaluation_file,
                                  produce_evaluation_file_cascade)
from rtdsd_tpu.data.dataset import AudioDataset
from rtdsd_tpu.data.io import write_wav
from rtdsd_tpu.data.protocols import Trial
from rtdsd_tpu.engine.serving import MultiStreamScorer
from rtdsd_tpu.engine.steps import TrainState, make_score_step
from rtdsd_tpu.models.registry import ModelSpec
from rtdsd_tpu.models.wav2vec2 import Wav2Vec2Config
from rtdsd_tpu.models.zoo import XLSR_AASIST

W2V = dict(conv_layers=((8, 10, 5), (8, 4, 4), (8, 2, 2)),
           encoder_embed_dim=8, encoder_ffn_dim=16, encoder_heads=2,
           conv_pos=4, conv_pos_groups=2)
DURATION = 80 * 40  # 80 frames at total stride 40


def _build(n_layers, seed, conv_from=None):
    cfg = Wav2Vec2Config(encoder_layers=n_layers, **W2V)
    model = XLSR_AASIST(w2v_cfg=cfg)
    variables = model.init(jax.random.key(seed),
                           jnp.zeros((1, DURATION)))
    params = variables["params"]
    if conv_from is not None:  # share the conv front-end (KD student)
        params = dict(params)
        ssl = dict(params["ssl_model"])
        ssl["feature_extractor"] = \
            conv_from["ssl_model"]["feature_extractor"]
        params["ssl_model"] = ssl
    return (model, params, variables.get("batch_stats", {}), cfg)


@pytest.fixture(scope="module")
def pair():
    flag = _build(2, seed=0)
    stud = _build(1, seed=1, conv_from=flag[1])
    return flag, stud


def _direct(modelpack, wave, hop):
    model, params, stats, _ = modelpack
    step = make_score_step(model)
    starts = range(0, len(wave) - DURATION + 1, hop)
    win = np.stack([wave[s:s + DURATION] for s in starts])
    return np.asarray(step(params, stats, jnp.asarray(win)))


def _serve(modelpack, wave, hop, **kwargs):
    model, params, stats, cfg = modelpack
    eng = MultiStreamScorer(model, params, stats, cfg, duration=DURATION,
                            hop=hop, max_streams=2, **kwargs)
    h = eng.open_stream("s")
    eng.push(h, wave)
    eng.close_stream(h, flush=True)
    out = eng.drain()
    return sorted(out, key=lambda g: g.start_sample)


@pytest.fixture(scope="module")
def wave():
    rng = np.random.default_rng(3)
    hop = DURATION // 2
    return rng.standard_normal(6 * hop + DURATION).astype(np.float32) * 0.1


def test_serving_escalation_bands(pair, wave):
    flag, stud = pair
    hop = DURATION // 2
    s_exp = _direct(stud, wave, hop)
    f_exp = _direct(flag, wave, hop)
    esc = dict(escalate=(flag[0], flag[1], flag[2]))

    none = _serve(stud, wave, hop, escalate_band=-1.0, **esc)
    np.testing.assert_allclose([g.score for g in none], s_exp,
                               rtol=2e-4, atol=2e-5)
    assert not any(g.escalated for g in none)

    every = _serve(stud, wave, hop, escalate_band=1e9, **esc)
    np.testing.assert_allclose([g.score for g in every], f_exp,
                               rtol=2e-4, atol=2e-5)
    assert all(g.escalated for g in every)

    band = float(np.median(np.abs(s_exp)))  # splits the windows
    mid = _serve(stud, wave, hop, escalate_band=band, **esc)
    for g, s, f in zip(mid, s_exp, f_exp):
        if abs(s) <= band + 1e-6:
            assert g.escalated
            np.testing.assert_allclose(g.score, f, rtol=2e-4, atol=2e-5)
        else:
            assert not g.escalated
            np.testing.assert_allclose(g.score, s, rtol=2e-4, atol=2e-5)
    assert any(g.escalated for g in mid) and not all(g.escalated
                                                     for g in mid)


def test_w8a8_screener_band_decisions(pair, wave):
    """r4 (VERDICT item 2): serving with a w8a8-quantized screener.
    Screener numerics gate escalation, so quantization drift must not
    flip band decisions: with the band placed in the largest gap of the
    bf16 screen-score distances, the quantized engine must escalate
    exactly the same windows, escalated windows must still score exactly
    on the (unquantized) flagship, and unescalated screen scores must
    stay within bounded drift of bf16."""
    import dataclasses

    from rtdsd_tpu.models.quantize import quantize_encoder_params

    flag, stud = pair
    model, params, stats, cfg = stud
    hop = DURATION // 2
    s_exp = _direct(stud, wave, hop)
    f_exp = _direct(flag, wave, hop)

    center = float(np.median(s_exp))
    d = np.sort(np.abs(s_exp - center))
    gaps = np.diff(d)
    i = int(np.argmax(gaps))
    band = float((d[i] + d[i + 1]) / 2)

    qcfg = dataclasses.replace(cfg, w8=True, a8=True)
    qmodel = XLSR_AASIST(w2v_cfg=qcfg)
    qparams = quantize_encoder_params(params)
    esc = dict(escalate=(flag[0], flag[1], flag[2]),
               escalate_center=center, escalate_band=band)

    ref = _serve(stud, wave, hop, **esc)
    got = _serve((qmodel, qparams, stats, qcfg), wave, hop, **esc)
    assert [g.escalated for g in got] == [g.escalated for g in ref]
    assert any(g.escalated for g in got)
    assert not all(g.escalated for g in got)
    for g, r, f in zip(got, ref, f_exp):
        if g.escalated:
            np.testing.assert_allclose(g.score, f, rtol=2e-4, atol=2e-5)
        else:
            assert abs(g.score - r.score) < 0.3, \
                f"w8a8 screen drift {abs(g.score - r.score):.4f}"


def test_esc_gather_forms_equal(pair, wave):
    """r4: the 'slice' escalation gather (vmapped dynamic_slice on the
    doubled slot row, 6x faster on TPU) must reproduce the proven 'flat'
    per-sample gather exactly — same windows, same flagship scores."""
    flag, stud = pair
    hop = DURATION // 2
    esc = dict(escalate=(flag[0], flag[1], flag[2]), escalate_band=1e9)
    a = _serve(stud, wave, hop, esc_gather="flat", **esc)
    b = _serve(stud, wave, hop, esc_gather="slice", **esc)
    assert len(a) == len(b) > 0
    assert all(g.escalated for g in b)
    np.testing.assert_allclose([g.score for g in b],
                               [g.score for g in a], rtol=1e-6, atol=1e-7)

    with pytest.raises(ValueError, match="esc_gather"):
        _serve(stud, wave, hop, esc_gather="bogus", **esc)


def test_serving_escalation_small_esc_batch(pair, wave):
    """Escalation backlog larger than esc_batch drains via chunked
    same-poll dispatches."""
    flag, stud = pair
    hop = DURATION // 2
    f_exp = _direct(flag, wave, hop)
    out = _serve(stud, wave, hop, escalate=(flag[0], flag[1], flag[2]),
                 escalate_band=1e9, esc_batch=1)
    np.testing.assert_allclose([g.score for g in out], f_exp,
                               rtol=2e-4, atol=2e-5)


def test_serving_escalation_works_with_mismatched_conv(pair, wave):
    """The escalation path scores raw windows from the sample ring, so
    the screener's conv front-end may differ arbitrarily from the
    flagship's (e.g. a KD student whose conv drifted during
    distillation) — escalated scores must still be the flagship's exact
    direct scores."""
    flag, _ = pair
    other = _build(1, seed=9)  # conv NOT shared with the flagship
    hop = DURATION // 2
    f_exp = _direct(flag, wave, hop)
    out = _serve(other, wave, hop, escalate=(flag[0], flag[1], flag[2]),
                 escalate_band=1e9)
    assert all(g.escalated for g in out)
    np.testing.assert_allclose([g.score for g in out], f_exp,
                               rtol=2e-4, atol=2e-5)


# --------------------------------------------------------- batch cascade


def _spec(modelpack):
    model = modelpack[0]
    return ModelSpec(name="tiny", module=model, layer_indices=[])


def _state(modelpack):
    return TrainState(step=jnp.zeros((), jnp.int32), params=modelpack[1],
                      batch_stats=modelpack[2], opt_state=())


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("cascade_ds")
    rng = np.random.default_rng(5)
    trials = []
    for i in range(10):
        w = (rng.standard_normal(DURATION + 37 * i) * 0.1).astype(np.float32)
        path = str(root / f"c{i:02d}.wav")
        write_wav(path, w, 16000)
        trials.append(Trial(path, f"c{i:02d}", i % 2))
    return AudioDataset(trials, DURATION)


def _read_scores(path):
    out = {}
    for ln in open(path):
        uid, sc = ln.split()
        out[uid] = float(sc)
    return out


def test_batch_cascade_bands(pair, dataset, tmp_path):
    flag, stud = pair
    kw = dict(batch_size=4, num_workers=1)

    produce_evaluation_file(dataset, _spec(stud), _state(stud),
                            str(tmp_path / "stud.txt"), 4, num_workers=1)
    produce_evaluation_file(dataset, _spec(flag), _state(flag),
                            str(tmp_path / "flag.txt"), 4, num_workers=1)
    s_ref = _read_scores(tmp_path / "stud.txt")
    f_ref = _read_scores(tmp_path / "flag.txt")

    produce_evaluation_file_cascade(
        dataset, dataset, _spec(stud), _state(stud), _spec(flag),
        _state(flag), str(tmp_path / "none.txt"), band=-1.0, **kw)
    assert _read_scores(tmp_path / "none.txt") == s_ref

    produce_evaluation_file_cascade(
        dataset, dataset, _spec(stud), _state(stud), _spec(flag),
        _state(flag), str(tmp_path / "all.txt"), band=1e9, **kw)
    got = _read_scores(tmp_path / "all.txt")
    assert set(got) == set(f_ref)
    for uid in got:
        np.testing.assert_allclose(got[uid], f_ref[uid], rtol=1e-6)

    band = float(np.median(np.abs(np.asarray(list(s_ref.values())))))
    produce_evaluation_file_cascade(
        dataset, dataset, _spec(stud), _state(stud), _spec(flag),
        _state(flag), str(tmp_path / "mid.txt"), band=band, **kw)
    got = _read_scores(tmp_path / "mid.txt")
    n_esc = 0
    for uid in got:
        if abs(s_ref[uid]) <= band + 1e-9:
            n_esc += 1
            np.testing.assert_allclose(got[uid], f_ref[uid], rtol=1e-6)
        else:
            np.testing.assert_allclose(got[uid], s_ref[uid], rtol=1e-6)
    assert 0 < n_esc < len(got)


def test_serving_escalation_zero_spare_frame_geometry(pair):
    """Regression: when win_frames is an exact multiple of seg_frames, a
    window becomes due with ZERO spare segment frames and the escalation
    gather needs the final conv frame's receptive-field tail — which only
    exists in the sample ring because extend stores whole overlapping
    segments (plus one ring frame of margin). Escalated scores must equal
    the flagship's direct scores even in this geometry."""
    flag, stud = pair
    stride = flag[3].total_stride  # 40
    rf = flag[3].conv_receptive_field
    # duration chosen so win_frames == 80 (multiple of seg_frames 40)
    duration = 81 * stride
    assert flag[3].num_frames(duration) == 80
    hop = 40 * stride
    assert flag[3].num_frames(duration) % (hop // stride) == 0

    rng = np.random.default_rng(17)
    wave = rng.standard_normal(4 * hop + duration).astype(np.float32) * 0.1

    model, params, stats, cfg = stud
    eng = MultiStreamScorer(model, params, stats, cfg, duration=duration,
                            hop=hop, max_streams=2,
                            escalate=(flag[0], flag[1], flag[2]),
                            escalate_band=1e9)
    h = eng.open_stream("s")
    eng.push(h, wave)
    eng.close_stream(h, flush=True)
    out = sorted(eng.drain(), key=lambda g: g.start_sample)

    step = make_score_step(flag[0])
    starts = range(0, len(wave) - duration + 1, hop)
    win = np.stack([wave[s:s + duration] for s in starts])
    exp = np.asarray(step(flag[1], flag[2], jnp.asarray(win)))
    assert len(out) == len(exp)
    assert all(g.escalated for g in out)
    np.testing.assert_allclose([g.score for g in out], exp,
                               rtol=2e-4, atol=2e-5)
