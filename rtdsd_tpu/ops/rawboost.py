"""RawBoost data-boosting DSP, batched and on-device.

The reference runs RawBoost per-utterance on CPU DataLoader workers with
numpy/scipy (``/root/reference/data/RawBoost.py``): LnL convolutive noise
(random multi-notch FIR banks over signal powers, :64-75), ISD impulsive
signal-dependent noise (:79-91), SSI stationary colored additive noise
(:96-106), composed into algorithms 1-8 (:109-174). That made the host the
training bottleneck (SURVEY.md §3.5).

This rebuild keeps identical *distributional* semantics but runs the whole
thing inside jit on the accelerator, vmapped over the batch with per-sample
PRNG keys:

- random FIR *design* (``scipy.signal.firwin`` band-stop + Hamming window +
  DC-gain scaling, chained by convolution, ``freqz``-peak normalization) is
  reimplemented in closed form over **fixed-size masked tap buffers** — tap
  counts are random, so buffers are padded to the static maximum (501 taps
  for 5 bands x maxCoeff 100) and masked; no dynamic shapes ever reach XLA.
- FIR application uses one rFFT convolution per stage (64 k samples -> 2^17
  FFT), the reference's centered-slice semantics reproduced with a
  ``dynamic_slice`` at the traced filter midpoint.
- ISD's "random n positions out of T" is realized with a uniform ranking
  mask (exactly n positions selected, uniformly), avoiding host-side
  ``np.random.permutation``.

Tap-design math is validated against scipy oracles in
``tests/test_ops.py``.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RawBoostArgs:
    """Parameter block, defaults = /root/reference/data/train_set.py:66-84."""

    nBands: int = 5
    minF: float = 20.0
    maxF: float = 8000.0
    minBW: float = 100.0
    maxBW: float = 1000.0
    minCoeff: int = 10
    maxCoeff: int = 100
    minG: float = 0.0
    maxG: float = 0.0
    minBiasLinNonLin: float = 5.0
    maxBiasLinNonLin: float = 20.0
    N_f: int = 5
    P: float = 10.0
    g_sd: float = 2.0
    SNRmin: float = 10.0
    SNRmax: float = 40.0


# Static tap-buffer sizes: maxCoeff=100 -> odd-ified 101 taps per band;
# 5 chained bands -> 5*(101-1)+1 = 501 total.
MAX_BAND_TAPS = 128
MAX_CHAIN_TAPS = 512
_FREQZ_N = 512  # scipy.signal.freqz default worN


def _hamming(n: jax.Array, c: jax.Array) -> jax.Array:
    """Hamming window of (traced) length c evaluated on index grid n."""
    return 0.54 - 0.46 * jnp.cos(2.0 * jnp.pi * n / (c - 1.0))


def firwin_bandstop(c: jax.Array, f1: jax.Array, f2: jax.Array, fs: float,
                    max_taps: int = MAX_BAND_TAPS) -> jax.Array:
    """scipy.signal.firwin(c, [f1, f2], window='hamming', fs=fs) band-stop,
    on a fixed ``max_taps`` buffer with entries >= c zeroed.

    c must be odd (the reference odd-ifies it, RawBoost.py:37-38).
    """
    n = jnp.arange(max_taps, dtype=jnp.float32)
    alpha = (c - 1.0) / 2.0
    m = n - alpha
    nyq = fs / 2.0
    w1, w2 = f1 / nyq, f2 / nyq
    # ideal band-stop: passbands [0, w1] and [w2, 1] (units of Nyquist)
    h = w1 * jnp.sinc(w1 * m) + jnp.sinc(m) - w2 * jnp.sinc(w2 * m)
    h = h * _hamming(n, c)
    valid = n < c
    h = jnp.where(valid, h, 0.0)
    # scale=True: unity response at DC (first passband contains 0)
    return h / jnp.sum(h)


def _conv_full_fixed(a: jax.Array, b: jax.Array, out_len: int) -> jax.Array:
    """Full convolution of two fixed-size (masked) buffers, truncated."""
    n = out_len + b.shape[0]  # enough room; round to fft-friendly size
    nfft = 1 << (n - 1).bit_length()
    fa = jnp.fft.rfft(a, nfft)
    fb = jnp.fft.rfft(b, nfft)
    return jnp.fft.irfft(fa * fb, nfft)[:out_len]


def notch_chain_from_params(fcs: jax.Array, bws: jax.Array, cs: jax.Array,
                            g: jax.Array, fs: float
                            ) -> Tuple[jax.Array, jax.Array]:
    """Deterministic core of the multi-notch FIR chain given the raw random
    draws (ref genNotchCoeffs, RawBoost.py:30-51): per-band center freq /
    bandwidth / tap-count draws (pre-odd-ification, pre-clamp — exactly
    what the reference's ``randRange`` returns), plus the gain draw G.

    Split out from :func:`gen_notch_coeffs` so the reference's own scipy
    code can be replayed draw-for-draw as a numerical oracle
    (tests/test_rawboost_oracle.py). Returns (taps buffer of
    MAX_CHAIN_TAPS, actual length L).
    """
    b = jnp.zeros((MAX_CHAIN_TAPS,), jnp.float32).at[0].set(1.0)
    length = jnp.asarray(1, jnp.int32)
    for i in range(fcs.shape[0]):
        c = cs[i].astype(jnp.int32)
        c = c + (c % 2 == 0)  # odd-ify (RawBoost.py:37-38)
        f1 = jnp.maximum(fcs[i] - bws[i] / 2.0, 1.0 / 1000.0)
        f2 = jnp.minimum(fcs[i] + bws[i] / 2.0, fs / 2.0 - 1.0 / 1000.0)
        h = firwin_bandstop(c.astype(jnp.float32), f1, f2, fs)
        b = _conv_full_fixed(h, b, MAX_CHAIN_TAPS)
        length = length + c - 1

    # freqz(b, 1, fs)[1] over 512 points on [0, pi): rfft at 2*_FREQZ_N grid
    spec = jnp.fft.rfft(b, 2 * _FREQZ_N)[:_FREQZ_N]
    peak = jnp.max(jnp.abs(spec))
    b = (10.0 ** (g / 20.0)) * b / peak
    return b, length


def gen_notch_coeffs(key: jax.Array, args: RawBoostArgs, fs: float,
                     min_g: jax.Array, max_g: jax.Array
                     ) -> Tuple[jax.Array, jax.Array]:
    """Random multi-notch FIR chain (ref RawBoost.py:30-51).

    Returns (taps buffer of MAX_CHAIN_TAPS, actual length L).
    """
    keys = jax.random.split(key, args.nBands + 1)
    fcs, bws, cs = [], [], []
    for i in range(args.nBands):
        kf, kb, kc = jax.random.split(keys[i], 3)
        fcs.append(jax.random.uniform(kf, (), minval=args.minF,
                                      maxval=args.maxF))
        bws.append(jax.random.uniform(kb, (), minval=args.minBW,
                                      maxval=args.maxBW))
        cs.append(jnp.floor(jax.random.uniform(
            kc, (), minval=float(args.minCoeff),
            maxval=float(args.maxCoeff))).astype(jnp.int32))
    g = jax.random.uniform(keys[-1], (), minval=min_g, maxval=max_g)
    return notch_chain_from_params(jnp.stack(fcs), jnp.stack(bws),
                                   jnp.stack(cs), g, fs)


def filter_fir(x: jax.Array, b: jax.Array, length: jax.Array) -> jax.Array:
    """Centered FIR filtering (ref RawBoost.py:54-59).

    Reference: pad x with N=len(b)+1 zeros, causal lfilter, slice
    [N//2 : end-N//2]. Equivalent: full convolution, dynamic slice of size T
    starting at N//2.
    """
    t = x.shape[-1]
    y_full = _conv_full_fixed(x, b, t + MAX_CHAIN_TAPS)
    start = (length + 1) // 2
    return jax.lax.dynamic_slice_in_dim(y_full, start, t, axis=-1)


def norm_wav(x: jax.Array, always: bool) -> jax.Array:
    """ref RawBoost.py:22-27."""
    peak = jnp.max(jnp.abs(x))
    if always:
        return x / peak
    return jnp.where(peak > 1.0, x / peak, x)


def lnl_from_chains(x: jax.Array, chains) -> jax.Array:
    """Deterministic core of LnL convolutive noise given the per-stage
    notch chains (ref RawBoost.py:64-75): sum of filtered signal powers,
    mean-removed, peak-normalized. ``chains`` is a sequence of
    (taps buffer, length) — stage i filters ``x ** (i + 1)``."""
    y = jnp.zeros_like(x)
    for i, (b, length) in enumerate(chains):
        y = y + filter_fir(jnp.power(x, i + 1), b, length)
    y = y - jnp.mean(y)
    return norm_wav(y, always=False)


def lnl_convolutive_noise(key: jax.Array, x: jax.Array,
                          args: RawBoostArgs, fs: float) -> jax.Array:
    """Linear+nonlinear convolutive noise (ref RawBoost.py:64-75)."""
    min_g, max_g = float(args.minG), float(args.maxG)
    keys = jax.random.split(key, args.N_f)
    chains = []
    for i in range(args.N_f):
        if i == 1:  # bias persists for stages >= 1 (RawBoost.py:67-69)
            min_g = min_g - args.minBiasLinNonLin
            max_g = max_g - args.maxBiasLinNonLin
        chains.append(gen_notch_coeffs(keys[i], args, fs,
                                       jnp.float32(min_g),
                                       jnp.float32(max_g)))
    return lnl_from_chains(x, chains)


def isd_additive_noise(key: jax.Array, x: jax.Array,
                       args: RawBoostArgs) -> jax.Array:
    """Impulsive signal-dependent noise (ref RawBoost.py:79-91).

    Exactly n = floor(T*beta/100) positions, uniformly chosen, get
    ``x += g_sd * x * f_r`` with f_r a product of two U(-1,1) draws.
    """
    kb, kp, k1, k2 = jax.random.split(key, 4)
    t = x.shape[-1]
    beta = jax.random.uniform(kb, (), minval=0.0, maxval=args.P)
    n = jnp.floor(t * beta / 100.0).astype(jnp.int32)
    # uniform ranking: rank[j] < n selects exactly n uniform positions
    u = jax.random.uniform(kp, (t,))
    rank = jnp.argsort(jnp.argsort(u))
    selected = rank < n
    f_r = ((2.0 * jax.random.uniform(k1, (t,)) - 1.0) *
           (2.0 * jax.random.uniform(k2, (t,)) - 1.0))
    return isd_from_params(x, selected, f_r, args.g_sd)


def isd_from_params(x: jax.Array, selected: jax.Array, f_r: jax.Array,
                    g_sd: float) -> jax.Array:
    """Deterministic core of ISD noise given the selection mask and the
    per-position noise factors (ref RawBoost.py:79-91)."""
    y = jnp.where(selected, x + g_sd * x * f_r, x)
    return norm_wav(y, always=False)


def ssi_additive_noise(key: jax.Array, x: jax.Array,
                       args: RawBoostArgs, fs: float) -> jax.Array:
    """Stationary colored additive noise at random SNR (ref RawBoost.py:96-106)."""
    kn, kc, ks = jax.random.split(key, 3)
    noise = jax.random.normal(kn, x.shape)
    b, length = gen_notch_coeffs(kc, args, fs,
                                 jnp.float32(args.minG), jnp.float32(args.maxG))
    snr = jax.random.uniform(ks, (), minval=args.SNRmin, maxval=args.SNRmax)
    return ssi_from_params(x, noise, b, length, snr)


def ssi_from_params(x: jax.Array, noise: jax.Array, b: jax.Array,
                    length: jax.Array, snr: jax.Array) -> jax.Array:
    """Deterministic core of SSI noise given the raw noise vector, notch
    chain, and SNR draw (ref RawBoost.py:96-106)."""
    noise = filter_fir(noise, b, length)
    noise = norm_wav(noise, always=True)
    noise = noise / jnp.linalg.norm(noise) * jnp.linalg.norm(x) \
        / (10.0 ** (0.05 * snr))
    return x + noise


def _rawboost_single(key: jax.Array, x: jax.Array, algo: int,
                     args: RawBoostArgs, fs: float) -> jax.Array:
    """Algorithm dispatch (ref RawBoost.py:109-174); ``algo`` is static."""
    k1, k2, k3 = jax.random.split(key, 3)
    if algo == 1:
        return lnl_convolutive_noise(k1, x, args, fs)
    if algo == 2:
        return isd_additive_noise(k2, x, args)
    if algo == 3:
        return ssi_additive_noise(k3, x, args, fs)
    if algo == 4:  # 1+2+3 in series
        x = lnl_convolutive_noise(k1, x, args, fs)
        x = isd_additive_noise(k2, x, args)
        return ssi_additive_noise(k3, x, args, fs)
    if algo == 5:  # 1+2
        x = lnl_convolutive_noise(k1, x, args, fs)
        return isd_additive_noise(k2, x, args)
    if algo == 6:  # 1+3
        x = lnl_convolutive_noise(k1, x, args, fs)
        return ssi_additive_noise(k3, x, args, fs)
    if algo == 7:  # 2+3
        x = isd_additive_noise(k2, x, args)
        return ssi_additive_noise(k3, x, args, fs)
    if algo == 8:  # 1 || 2
        a = lnl_convolutive_noise(k1, x, args, fs)
        b = isd_additive_noise(k2, x, args)
        return norm_wav(a + b, always=False)
    return x  # algo outside 1..8: identity (ref RawBoost.py:169-172)


@partial(jax.jit, static_argnames=("algo", "args", "fs"))
def rawboost(key: jax.Array, batch: jax.Array, algo: int,
             args: RawBoostArgs = RawBoostArgs(),
             fs: float = 16000.0) -> jax.Array:
    """Apply RawBoost algorithm ``algo`` to a batch (B, T) of waveforms.

    One independent PRNG stream per utterance (vmapped), all on device.
    """
    keys = jax.random.split(key, batch.shape[0])
    fn = lambda k, x: _rawboost_single(k, x, algo, args, fs)
    return jax.vmap(fn)(keys, batch)
