"""Streaming scorer + profiling harness tests."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from rtdsd_tpu.engine.steps import make_score_step
from rtdsd_tpu.engine.streaming import StreamingScorer, frame_windows
from rtdsd_tpu.utils.profiling import Timing, measure


def test_frame_windows_cover_and_tile():
    w = np.arange(100, dtype=np.float32)
    out = frame_windows(w, duration=40, hop=30)
    # starts 0, 30, 60 (covers to 100)
    assert out.shape == (3, 40)
    np.testing.assert_array_equal(out[0], w[:40])
    np.testing.assert_array_equal(out[-1], w[60:100])

    # short input: one repeat-tiled window
    short = np.arange(30, dtype=np.float32)
    out = frame_windows(short, duration=40, hop=30)
    assert out.shape == (1, 40)
    np.testing.assert_array_equal(out[0], np.resize(short, 40))


def test_frame_windows_tail_window():
    w = np.arange(105, dtype=np.float32)
    out = frame_windows(w, 40, 30)
    # starts 0, 30, 60, then tail at 65
    assert out.shape == (4, 40)
    np.testing.assert_array_equal(out[-1], w[65:105])


class _Mean(nn.Module):
    @nn.compact
    def __call__(self, x, *, train=False):
        m = x.mean(-1, keepdims=True)
        return jnp.concatenate([-m, m], axis=-1) * nn.Dense(
            1, use_bias=False, kernel_init=nn.initializers.ones)(
                jnp.ones((x.shape[0], 1)))


def test_streaming_scorer_aggregation():
    model = _Mean()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 10)))
    step = make_score_step(model)
    scorer = StreamingScorer(step, variables["params"], {}, duration=10,
                             hop=5, batch_size=4, aggregate="mean")
    # wave with mean ramping up; score = window mean
    wave = np.linspace(0, 1, 50).astype(np.float32)
    ws = scorer.window_scores(wave)
    assert len(ws) >= 8
    assert ws[-1] > ws[0]  # later windows have larger means
    s_mean = scorer.score(wave)
    scorer.aggregate = "max"
    assert scorer.score(wave) >= s_mean
    scorer.aggregate = "min"
    assert scorer.score(wave) <= s_mean


def test_measure_returns_sane_timing():
    f = jax.jit(lambda x: x * 2)
    x = jnp.ones((8, 8))
    t = measure(f, (x,), warmup=1, iters=5)
    assert isinstance(t, Timing)
    assert 0 < t.p50_ms < 1000
    assert t.p99_ms >= t.p50_ms
    per = t.per_item_ms(8)
    assert abs(per.p50_ms - t.p50_ms / 8) < 1e-9
    assert t.throughput(8) > 0


def test_frame_starts_tail_window():
    from rtdsd_tpu.engine.streaming import frame_starts, frame_windows

    # 7.3 s at unit rate: hop grid 0..6 plus a tail window at T - duration
    starts = frame_starts(7300, 1000, 500)
    assert starts[-1] == 6300 and starts[-2] == 6000
    assert frame_windows(np.arange(7300, dtype=np.float32),
                         1000, 500).shape[0] == len(starts)
    # exact cover: no extra tail
    assert frame_starts(3000, 1000, 500)[-1] == 2000
    # short input: single window
    assert frame_starts(800, 1000, 500) == [0]


def test_receptive_field_xlsr():
    from rtdsd_tpu.engine.streaming import receptive_field
    from rtdsd_tpu.models.wav2vec2 import Wav2Vec2Config

    cfg = Wav2Vec2Config()
    assert receptive_field(cfg.conv_layers) == 400
    assert cfg.total_stride == 320


def test_incremental_scorer_matches_naive():
    """Conv-feature caching is exact: incremental == naive per-window scores
    when every window start lies on the conv frame grid."""
    from rtdsd_tpu.engine.streaming import IncrementalStreamingScorer
    from rtdsd_tpu.models.wav2vec2 import Wav2Vec2Config
    from rtdsd_tpu.models.zoo import XLSR_AASIST

    cfg = Wav2Vec2Config(conv_layers=((8, 10, 5), (8, 4, 4), (8, 2, 2)),
                         encoder_embed_dim=8, encoder_ffn_dim=16,
                         encoder_heads=2, encoder_layers=2, conv_pos=4,
                         conv_pos_groups=2)
    stride = cfg.total_stride  # 40
    model = XLSR_AASIST(w2v_cfg=cfg)
    duration = 80 * stride          # 3200 samples
    variables = model.init(jax.random.key(0), jnp.zeros((1, duration)))
    params, stats = variables["params"], variables.get("batch_stats", {})

    # duration and hop both multiples of the conv stride; length chosen so
    # the tail window also lands on the grid
    hop = 40 * stride
    wave = np.random.default_rng(3).standard_normal(
        (200 * stride,)).astype(np.float32)

    naive = StreamingScorer(make_score_step(model), params, stats,
                            duration=duration, hop=hop, batch_size=4)
    inc = IncrementalStreamingScorer(model, params, stats, cfg,
                                     duration=duration, hop=hop,
                                     batch_size=4, seg_frames=50)
    ws_naive = naive.window_scores(wave)
    ws_inc = inc.window_scores(wave)
    assert ws_naive.shape == ws_inc.shape
    np.testing.assert_allclose(ws_inc, ws_naive, rtol=2e-4, atol=2e-5)

    # short input (single tiled window) agrees too
    short = wave[: duration // 2]
    np.testing.assert_allclose(inc.window_scores(short),
                               naive.window_scores(short),
                               rtol=2e-4, atol=2e-5)


def test_streaming_eer_not_worse_than_offline_crop():
    """r4 streaming-quality guard (in-process counterpart of the e2e
    harness in test_cli_e2e.py): on a separable synthetic task, a model
    trained to separate 1 s crops must separate long audio at least as
    well through mean-aggregated streaming windows as through a single
    offline crop. Guards the window-aggregation path against silent
    quality drift."""
    import optax
    from flax import linen as nn

    from rtdsd_tpu.utils.metrics import compute_eer

    class _Feat(nn.Module):
        @nn.compact
        def __call__(self, x, *, train=False):
            a = jnp.abs(x).reshape(x.shape[0], 20, -1)
            f = jnp.concatenate([a.mean(-1), a.max(-1)], axis=-1)
            return nn.Dense(2)(jax.nn.selu(nn.Dense(16)(f)))

    dur, sr = 2000, 16000
    rng = np.random.default_rng(0)

    def batch(n, start=0):
        waves, labels = [], []
        for i in range(start, start + n):
            bona = i % 2 == 1
            t = np.arange(dur) / sr
            w = (0.3 * np.sin(2 * np.pi * (350 + 10 * i) * t) if bona
                 else 0.2 * rng.standard_normal(dur))
            waves.append(w.astype(np.float32))
            labels.append(int(bona))
        return jnp.asarray(np.stack(waves)), jnp.asarray(labels)

    model = _Feat()
    params = model.init(jax.random.key(0), jnp.zeros((1, dur)))["params"]
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def train_step(params, opt, waves, labels):
        def loss_fn(p):
            logits = model.apply({"params": p}, waves, train=True)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, loss

    for step_i in range(60):
        waves, labels = batch(16, start=(step_i * 16) % 64)
        params, opt, loss = train_step(params, opt, waves, labels)
    assert float(loss) < 0.1, f"toy task did not train (loss {loss})"

    # long eval audio: 3x the train duration, unseen frequencies
    longs, labels = [], []
    for i in range(100, 112):
        bona = i % 2 == 1
        t = np.arange(3 * dur) / sr
        w = (0.3 * np.sin(2 * np.pi * (350 + 10 * i) * t) if bona
             else 0.2 * rng.standard_normal(3 * dur))
        longs.append(w.astype(np.float32))
        labels.append(int(bona))
    labels = np.asarray(labels)

    step = make_score_step(model)
    offline = np.asarray(step(params, {},
                              jnp.asarray(np.stack([w[:dur]
                                                    for w in longs]))))
    scorer = StreamingScorer(step, params, {}, duration=dur, hop=dur // 2,
                             batch_size=8, aggregate="mean")
    streamed = np.asarray([scorer.score(w) for w in longs])

    assert compute_eer(streamed, labels) <= \
        compute_eer(offline, labels) + 1e-12
    assert compute_eer(streamed, labels) == 0.0  # separable task kept


def test_incremental_scorer_rejects_group_norm():
    import pytest

    from rtdsd_tpu.engine.streaming import IncrementalStreamingScorer
    from rtdsd_tpu.models.wav2vec2 import Wav2Vec2Config
    from rtdsd_tpu.models.zoo import XLSR_AASIST

    cfg = Wav2Vec2Config(extractor_mode="group_norm")
    with pytest.raises(ValueError, match="layer_norm"):
        IncrementalStreamingScorer(XLSR_AASIST(w2v_cfg=cfg), {}, {}, cfg,
                                   duration=64000)
