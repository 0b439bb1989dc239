"""RawBoost parity vs the REFERENCE'S OWN code (`/root/reference/data/
RawBoost.py`, pure numpy/scipy — importable with no torch/fairseq).

`tests/test_ops.py` validates the tap-design math against scipy oracles;
this file goes one step further in the spirit of `test_reference_oracle.py`:
it executes the reference's actual functions and replays their exact random
draws through our deterministic cores (`notch_chain_from_params`,
`lnl_from_chains`, `isd_from_params`, `ssi_from_params` — the split that
makes the randomness injectable). Any divergence in the FIR design, the
chain convolution, the freqz peak normalization, the centered-slice
filtering, or the composition arithmetic fails here against the reference
itself, not a re-derivation.

The reference draws randomness via its module-global ``randRange``
(RawBoost.py:15-19) and bare ``np.random`` calls; we monkeypatch
``randRange`` with a scripted replay and seed ``np.random`` for the rest.
"""

import importlib.util
import os

import numpy as np
import pytest

import jax.numpy as jnp

from rtdsd_tpu.ops.rawboost import (MAX_CHAIN_TAPS, filter_fir,
                                    isd_from_params, lnl_from_chains,
                                    norm_wav, notch_chain_from_params,
                                    ssi_from_params)

REF_PATH = "/root/reference/data/RawBoost.py"

pytestmark = pytest.mark.skipif(not os.path.exists(REF_PATH),
                                reason="reference snapshot not present")

FS = 16000.0


def _load_ref():
    pytest.importorskip("scipy")
    spec = importlib.util.spec_from_file_location("ref_rawboost", REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _ScriptedRandRange:
    """Replay a recorded draw sequence through the reference's randRange
    signature (returns a shape-(1,) array, or int when integer=True)."""

    def __init__(self, values):
        self.values = list(values)
        self.log = []

    def __call__(self, x1, x2, integer):
        v = self.values.pop(0)
        # the reference passes reversed ranges for biased gains
        # (np.random.uniform accepts high < low); normalize for the check
        lo, hi = min(x1, x2), max(x1, x2)
        assert lo <= v <= hi, f"scripted draw {v} outside [{lo}, {hi}]"
        self.log.append((v, integer))
        return int(v) if integer else np.array([v])


def _notch_draws(rng, n_bands, g=0.0):
    """One genNotchCoeffs draw sequence: (fc, bw, c) per band then G."""
    seq = []
    for _ in range(n_bands):
        seq += [float(rng.uniform(25, 7800)), float(rng.uniform(100, 1000)),
                float(rng.uniform(10, 100))]
    seq.append(g)
    return seq


def _split_draws(seq, n_bands):
    """Scripted sequence -> (fcs, bws, cs_raw, g) arrays for our core."""
    per = np.asarray(seq[:3 * n_bands], np.float32).reshape(n_bands, 3)
    # the reference's randRange(..., integer=1) truncates with int()
    return (jnp.asarray(per[:, 0]), jnp.asarray(per[:, 1]),
            jnp.asarray(per[:, 2].astype(np.int32)),
            jnp.float32(seq[3 * n_bands]))


def test_filter_fir_matches_reference_filterFIR():
    """filter_fir == the reference's pad + lfilter + centered slice, for
    both odd-tap single filters and a realistic chained length."""
    ref = _load_ref()
    rng = np.random.default_rng(0)
    x = rng.standard_normal(3000).astype(np.float32)
    for taps in (21, 73, 301):
        b = rng.standard_normal(taps).astype(np.float32) * 0.1
        want = ref.filterFIR(x.astype(np.float64), b.astype(np.float64))
        buf = np.zeros(MAX_CHAIN_TAPS, np.float32)
        buf[:taps] = b
        got = np.asarray(filter_fir(jnp.asarray(x), jnp.asarray(buf),
                                    jnp.int32(taps)))
        np.testing.assert_allclose(got, want[: len(x)], rtol=2e-4,
                                   atol=2e-4)


@pytest.mark.parametrize("n_bands", [1, 3, 5])
def test_notch_chain_matches_reference_genNotchCoeffs(n_bands):
    ref = _load_ref()
    rng = np.random.default_rng(n_bands)
    seq = _notch_draws(rng, n_bands, g=float(rng.uniform(-6, 0)))
    ref.randRange = _ScriptedRandRange(list(seq))
    want = ref.genNotchCoeffs(n_bands, 20, 8000, 100, 1000, 10, 100,
                              -20, 20, FS)

    fcs, bws, cs, g = _split_draws(seq, n_bands)
    b, length = notch_chain_from_params(fcs, bws, cs, g, FS)
    assert int(length) == len(want)
    np.testing.assert_allclose(np.asarray(b)[: len(want)], want,
                               rtol=2e-4, atol=1e-7)
    # beyond the true chain length only FFT-convolution round-off remains
    assert np.max(np.abs(np.asarray(b)[len(want):])) < 1e-6


def test_lnl_matches_reference_LnL_convolutive_noise():
    """Full LnL composition (powers, per-stage chains, the stage>=1 gain
    bias, mean removal, peak norm) vs the reference's own function."""
    ref = _load_ref()
    rng = np.random.default_rng(42)
    n_f, n_bands = 3, 2
    t = 4000
    x = (0.4 * np.sin(2 * np.pi * 440 * np.arange(t) / FS)
         + 0.1 * rng.standard_normal(t)).astype(np.float32)

    seq, stage_draws = [], []
    for i in range(n_f):
        # default minG=maxG=0: stage 0 draws G from [0,0]; stages >= 1
        # subtract the lin/nonlin bias -> reversed range (-5, -20)
        # (RawBoost.py:67-69)
        g = float(rng.uniform(-20, -5)) if i else 0.0
        s = _notch_draws(rng, n_bands, g=g)
        seq += s
        stage_draws.append(s)
    ref.randRange = _ScriptedRandRange(list(seq))
    want = ref.LnL_convolutive_noise(
        x.astype(np.float64), n_f, n_bands, 20, 8000, 100, 1000, 10, 100,
        0, 0, 5, 20, FS)

    chains = [notch_chain_from_params(*_split_draws(s, n_bands), FS)
              for s in stage_draws]
    got = np.asarray(lnl_from_chains(jnp.asarray(x), chains))
    np.testing.assert_allclose(got, want[:t], rtol=5e-4, atol=5e-5)


def test_isd_matches_reference_ISD_additive_noise():
    ref = _load_ref()
    rng = np.random.default_rng(7)
    t = 2000
    x = rng.standard_normal(t).astype(np.float32) * 0.3

    p_cap, g_sd = 10.0, 2.0
    beta = 6.5
    ref.randRange = _ScriptedRandRange([beta])
    np.random.seed(123)  # consumes permutation + two rand(n) draws
    want = ref.ISD_additive_noise(x.astype(np.float64), p_cap, g_sd)

    # replay the np.random consumption exactly as the reference did
    np.random.seed(123)
    n = int(t * beta / 100)
    p = np.random.permutation(t)[:n]
    f_r_sel = (2 * np.random.rand(n) - 1) * (2 * np.random.rand(n) - 1)
    selected = np.zeros(t, bool)
    selected[p] = True
    f_r = np.zeros(t, np.float32)
    f_r[p] = f_r_sel
    got = np.asarray(isd_from_params(jnp.asarray(x), jnp.asarray(selected),
                                     jnp.asarray(f_r), g_sd))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_ssi_matches_reference_SSI_additive_noise():
    ref = _load_ref()
    rng = np.random.default_rng(11)
    t = 3000
    x = rng.standard_normal(t).astype(np.float32) * 0.2

    n_bands = 3
    snr = 17.0
    seq = _notch_draws(rng, n_bands, g=0.0) + [snr]
    ref.randRange = _ScriptedRandRange(list(seq))
    np.random.seed(99)  # consumes the noise normal(0, 1, t)
    want = ref.SSI_additive_noise(x.astype(np.float64), 10, 40, n_bands,
                                  20, 8000, 100, 1000, 10, 100, 0, 0, FS)

    np.random.seed(99)
    noise = np.random.normal(0, 1, t)
    b, length = notch_chain_from_params(*_split_draws(seq[:-1], n_bands),
                                        FS)
    got = np.asarray(ssi_from_params(jnp.asarray(x),
                                     jnp.asarray(noise, jnp.float32),
                                     b, length, jnp.float32(snr)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_norm_wav_matches_reference():
    ref = _load_ref()
    rng = np.random.default_rng(3)
    for scale, always in [(0.5, 0), (1.7, 0), (0.5, 1), (1.7, 1)]:
        x = (rng.standard_normal(500) * scale).astype(np.float32)
        want = ref.normWav(x.astype(np.float64).copy(), always)
        got = np.asarray(norm_wav(jnp.asarray(x), always=bool(always)))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
