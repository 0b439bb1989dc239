"""DSP op tests against scipy/numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal as sps

from rtdsd_tpu.ops.augment import sinc_fir, waveform_augment
from rtdsd_tpu.ops.preemphasis import pre_emphasis
from rtdsd_tpu.ops.rawboost import (MAX_CHAIN_TAPS, RawBoostArgs,
                                    _conv_full_fixed, filter_fir,
                                    firwin_bandstop, isd_additive_noise,
                                    norm_wav, rawboost, ssi_additive_noise)


def test_pre_emphasis_matches_reference_semantics(rng):
    x = rng.standard_normal((3, 100)).astype(np.float32)
    y = np.asarray(pre_emphasis(jnp.asarray(x), 0.97))
    # reflect-pad by one then FIR [-0.97, 1]: y[0] = x[0] - 0.97*x[1]
    expected = np.empty_like(x)
    expected[:, 0] = x[:, 0] - 0.97 * x[:, 1]
    expected[:, 1:] = x[:, 1:] - 0.97 * x[:, :-1]
    np.testing.assert_allclose(y, expected, rtol=1e-5, atol=1e-6)


def test_pre_emphasis_disabled_is_identity(rng):
    x = rng.standard_normal((2, 50)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(pre_emphasis(jnp.asarray(x), enabled=False)), x)


@pytest.mark.parametrize("c,f1,f2", [(11, 100.0, 900.0), (51, 500.0, 1500.0),
                                     (99, 20.0, 7000.0)])
def test_firwin_bandstop_matches_scipy(c, f1, f2):
    fs = 16000.0
    ours = np.asarray(firwin_bandstop(jnp.float32(c), jnp.float32(f1),
                                      jnp.float32(f2), fs))
    ref = sps.firwin(c, [f1, f2], window="hamming", fs=fs)
    np.testing.assert_allclose(ours[:c], ref, rtol=1e-4, atol=1e-6)
    assert np.all(ours[c:] == 0)


def test_conv_full_fixed_matches_numpy(rng):
    a = np.zeros(128, np.float32)
    b = np.zeros(MAX_CHAIN_TAPS, np.float32)
    a[:11] = rng.standard_normal(11)
    b[:21] = rng.standard_normal(21)
    out = np.asarray(_conv_full_fixed(jnp.asarray(a), jnp.asarray(b), 64))
    expected = np.convolve(a, b)[:64]
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


def test_filter_fir_matches_reference_centered_slice(rng):
    """Oracle = the documented reference behavior (RawBoost.py:54-59):
    pad-by-N zeros, causal lfilter, slice [N//2 : len-N//2]."""
    t, taps = 400, 31
    x = rng.standard_normal(t).astype(np.float64)
    b_np = sps.firwin(taps, [300, 3000], window="hamming", fs=16000)
    n = taps + 1
    xpad = np.pad(x, (0, n))
    y_ref = sps.lfilter(b_np, 1, xpad)[n // 2: xpad.shape[0] - n // 2]

    b_buf = np.zeros(MAX_CHAIN_TAPS, np.float32)
    b_buf[:taps] = b_np
    y = np.asarray(filter_fir(jnp.asarray(x, jnp.float32),
                              jnp.asarray(b_buf), jnp.int32(taps)))
    assert y.shape == (t,)
    np.testing.assert_allclose(y, y_ref, rtol=1e-3, atol=1e-5)


def test_norm_wav():
    x = jnp.asarray([0.5, -2.0, 1.0])
    np.testing.assert_allclose(np.asarray(norm_wav(x, always=False)),
                               [0.25, -1.0, 0.5])
    y = jnp.asarray([0.2, -0.5])
    np.testing.assert_allclose(np.asarray(norm_wav(y, always=False)),
                               [0.2, -0.5])
    np.testing.assert_allclose(np.asarray(norm_wav(y, always=True)),
                               [0.4, -1.0])


def test_isd_modifies_bounded_fraction(rng):
    args = RawBoostArgs()
    x = jnp.asarray(rng.standard_normal(4000).astype(np.float32)) * 0.1
    y = isd_additive_noise(jax.random.key(3), x, args)
    changed = np.sum(~np.isclose(np.asarray(y), np.asarray(x)))
    assert changed <= int(4000 * args.P / 100) + 1
    assert np.isfinite(np.asarray(y)).all()


def test_ssi_achieves_sampled_snr(rng):
    args = RawBoostArgs()
    x = jnp.asarray(rng.standard_normal(4000).astype(np.float32))
    y = ssi_additive_noise(jax.random.key(5), x, args, 16000.0)
    noise = np.asarray(y) - np.asarray(x)
    snr = 20 * np.log10(np.linalg.norm(np.asarray(x)) / np.linalg.norm(noise))
    assert args.SNRmin - 0.5 <= snr <= args.SNRmax + 0.5


@pytest.mark.parametrize("algo", [1, 2, 4, 8, -1])
def test_rawboost_batch(algo, rng):
    batch = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32)) * 0.1
    out = rawboost(jax.random.key(0), batch, algo)
    assert out.shape == batch.shape
    assert np.isfinite(np.asarray(out)).all()
    if algo == -1:
        np.testing.assert_array_equal(np.asarray(out), np.asarray(batch))
    else:
        assert not np.allclose(np.asarray(out), np.asarray(batch))


def test_sinc_fir_dc_and_nyquist():
    lp = np.asarray(sinc_fir(jnp.float32(2000.0), 16000.0, highpass=False))
    # unity DC gain for lowpass
    np.testing.assert_allclose(lp.sum(), 1.0, rtol=1e-5)
    hp = np.asarray(sinc_fir(jnp.float32(2000.0), 16000.0, highpass=True))
    # ~zero DC gain for highpass
    assert abs(hp.sum()) < 1e-5


def test_waveform_augment_shapes_and_determinism(rng):
    batch = jnp.asarray(rng.standard_normal((4, 4000)).astype(np.float32))
    out1 = waveform_augment(jax.random.key(7), batch)
    out2 = waveform_augment(jax.random.key(7), batch)
    assert out1.shape == batch.shape
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    out3 = waveform_augment(jax.random.key(8), batch)
    assert not np.allclose(np.asarray(out1), np.asarray(out3))


def _dominant_hz(seg, sr=16000.0):
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    return np.fft.rfftfreq(len(seg), 1.0 / sr)[int(np.argmax(spec))]


def test_time_stretch_preserves_pitch_and_scales_tempo(rng):
    """Phase-vocoder semantics (the reference chain uses librosa
    time_stretch via audiomentations): tempo changes, pitch does NOT —
    a plain resample would shift a 440 Hz tone to 550 Hz at rate 1.25."""
    from rtdsd_tpu.ops.augment import time_stretch

    sr, n = 16000.0, 8000
    tt = np.arange(n) / sr
    x = jnp.asarray(np.sin(2 * np.pi * 440.0 * tt).astype(np.float32))
    fast = np.asarray(time_stretch(jax.random.key(0), x, 1.25, 1.25))
    slow = np.asarray(time_stretch(jax.random.key(0), x, 0.8, 0.8))
    assert fast.shape == slow.shape == (n,)
    # pitch preserved in the active region (resolution ~4 Hz at 4096 pts)
    assert abs(_dominant_hz(fast[1024:5120]) - 440.0) < 12.0
    assert abs(_dominant_hz(slow[1024:5120]) - 440.0) < 12.0
    # tempo: rate>1 exhausts the signal early -> near-silent tail beyond
    # n/rate (+ one window of overlap-add smear); rate<1 stays active
    tail = int(n / 1.25) + 1536
    assert np.abs(fast[tail:]).max() < 0.05
    assert np.abs(slow[tail:]).max() > 0.2
    # energy roughly preserved where both are active
    assert 0.5 < np.std(fast[1024:5120]) / np.std(np.asarray(x)) < 1.5


def test_air_absorption_attenuates_highs(rng):
    from rtdsd_tpu.ops.augment import air_absorption

    t = np.arange(8000) / 16000
    low = np.sin(2 * np.pi * 200 * t).astype(np.float32)
    high = np.sin(2 * np.pi * 6000 * t).astype(np.float32)
    y_low = np.asarray(air_absorption(jax.random.key(0),
                                      jnp.asarray(low), 20.0, 20.0, 16000))
    y_high = np.asarray(air_absorption(jax.random.key(0),
                                       jnp.asarray(high), 20.0, 20.0, 16000))
    low_ratio = np.linalg.norm(y_low) / np.linalg.norm(low)
    high_ratio = np.linalg.norm(y_high) / np.linalg.norm(high)
    assert high_ratio < low_ratio < 1.001
    assert high_ratio < 0.8


def test_mul_augment_mapping():
    from rtdsd_tpu.engine.steps import post_device_augs, pre_device_augs

    # reference Compose order (augmentation.py:97-107)
    assert pre_device_augs(["mul_augment"]) == ("TST", "GAN", "AIR", "TMK")
    # RawBoost wins the if/elif dispatch (train_set.py:112-124)
    assert pre_device_augs(["mul_augment", "RawBoost4"]) == ()
    # trainer-side chain: fixed ACN->HPF->LPF->GAN order, gated
    assert post_device_augs(["GAN", "ACN", "mul_augment"], True) == \
        ("ACN", "GAN")
    assert post_device_augs(["ACN"], False) == ()


class TestFastGelu:
    """ops/fastgelu.py: rational-erf GELU must be bf16-faithful."""

    def _all_bf16(self, lo=-16.0, hi=16.0):
        bits = np.arange(1 << 16, dtype=np.uint32)
        f = (bits << 16).view(np.float32)
        return f[np.isfinite(f) & (f >= lo) & (f <= hi)].astype(np.float32)

    def test_bf16_faithful_vs_exact_erf(self):
        from rtdsd_tpu.ops.fastgelu import gelu_fast

        x = self._all_bf16()
        exact = jax.nn.gelu(jnp.asarray(x), approximate=False)
        fast = gelu_fast(jnp.asarray(x))
        eb = np.asarray(exact.astype(jnp.bfloat16), np.float32)
        fb = np.asarray(fast.astype(jnp.bfloat16), np.float32)
        mismatch = eb != fb
        # bitwise identical except the near-zero negative tail
        assert mismatch.mean() < 0.01
        assert x[mismatch].max() < -2.8
        # tail obeys the 0.5*|x|*erfc(2.92) saturation bound
        d = np.abs(np.asarray(exact, np.float32) - np.asarray(fast,
                                                              np.float32))
        assert d.max() <= 2.1e-5 * np.abs(x).max()
        assert np.all(d <= 2.1e-5 * np.maximum(np.abs(x), 0.25))

    def test_bf16_io_path(self):
        from rtdsd_tpu.ops.fastgelu import gelu_fast

        x = jnp.asarray(self._all_bf16(), jnp.bfloat16)
        y = gelu_fast(x)
        assert y.dtype == jnp.bfloat16
        want = jax.nn.gelu(x.astype(jnp.float32), approximate=False)
        np.testing.assert_allclose(
            np.asarray(y, np.float32), np.asarray(want, np.float32),
            rtol=1e-2, atol=4e-3)

    def test_gradient_close_to_exact(self):
        from rtdsd_tpu.ops.fastgelu import gelu_fast

        x = jnp.linspace(-4.0, 4.0, 4001)
        g_fast = jax.vmap(jax.grad(lambda v: gelu_fast(v)))(x)
        g_ref = jax.vmap(jax.grad(
            lambda v: jax.nn.gelu(v, approximate=False)))(x)
        np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                                   atol=5e-5)

    def test_encoder_fast_vs_exact_within_bf16_noise(self):
        """Tiny f32 encoder: flipping fast_gelu moves features < 1e-4."""
        import dataclasses

        from rtdsd_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder

        cfg = Wav2Vec2Config(
            conv_layers=((16, 10, 5), (16, 3, 2), (16, 2, 2)),
            encoder_embed_dim=16, encoder_ffn_dim=32, encoder_heads=2,
            encoder_layers=2, conv_pos=8, conv_pos_groups=2, fast_gelu=True)
        wave = jnp.asarray(np.random.default_rng(0).standard_normal(
            (2, 1600)).astype(np.float32) * 0.1)
        enc = Wav2Vec2Encoder(cfg)
        params = enc.init(jax.random.key(0), wave)
        out_fast = enc.apply(params, wave)
        exact = Wav2Vec2Encoder(dataclasses.replace(cfg, fast_gelu=False))
        out_exact = exact.apply(params, wave)
        np.testing.assert_allclose(np.asarray(out_fast),
                                   np.asarray(out_exact), atol=1e-4)
