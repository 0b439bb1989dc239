"""Pallas TPU quantization kernels: per-channel int8 with stochastic rounding.

Serving building block (int8 weight compression halves HBM weight traffic
for small-batch scoring): quantize a (rows, cols) matrix per-column to int8
with on-chip PRNG stochastic rounding, and dequantize back. The kernels
follow the TPU quantization pattern (seeded pltpu PRNG + stochastic_round);
on non-TPU backends the same API runs a numpy-equivalent jnp path so the
tests and callers are portable.

Round-1 scope: standalone kernels + round-trip accuracy tests; wiring into a
w8 scoring path for the XLSR FFN stack is the round-2 item (PERFORMANCE.md
backlog).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None


def _quant_kernel(seed_ref, x_ref, val_ref, scale_ref):
    pltpu.prng_seed(seed_ref[0])
    x = x_ref[:]
    # per-column scale: max |x| / 127
    absmax = jnp.max(jnp.abs(x), axis=0, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    scale_ref[:] = scale
    scaled = x / scale
    # int8 stochastic rounding: floor(x + u), u ~ U[0,1) from on-chip PRNG
    # (pltpu.stochastic_round only targets float dtypes)
    bits = pltpu.bitcast(pltpu.prng_random_bits(scaled.shape), jnp.uint32)
    u = (bits >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
    val_ref[:] = jnp.clip(jnp.floor(scaled + u), -128, 127).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def quantize_int8(x: jax.Array, seed: int | jax.Array = 0,
                  interpret: bool | None = None
                  ) -> Tuple[jax.Array, jax.Array]:
    """(R, C) float -> ((R, C) int8 values, (1, C) float32 scales)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    x = x.astype(jnp.float32)
    r, c = x.shape
    if interpret or pltpu is None:
        # portable path: deterministic round-to-nearest
        absmax = jnp.max(jnp.abs(x), axis=0, keepdims=True)
        scale = jnp.maximum(absmax, 1e-12) / 127.0
        vals = jnp.clip(jnp.round(x / scale), -128, 127).astype(jnp.int8)
        return vals, scale

    seed_arr = jnp.asarray([seed], jnp.int32)
    vals, scales = pl.pallas_call(
        _quant_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=_VMEM),
        ],
        out_specs=(pl.BlockSpec(memory_space=_VMEM),
                   pl.BlockSpec(memory_space=_VMEM)),
        out_shape=(jax.ShapeDtypeStruct((r, c), jnp.int8),
                   jax.ShapeDtypeStruct((1, c), jnp.float32)),
    )(seed_arr, x)
    return vals, scales


def dequantize_int8(vals: jax.Array, scales: jax.Array,
                    dtype=jnp.float32) -> jax.Array:
    return (vals.astype(jnp.float32) * scales).astype(dtype)


def quantized_matmul(x: jax.Array, w_vals: jax.Array, w_scales: jax.Array,
                     ) -> jax.Array:
    """x @ dequant(w): dequantization folded after an int-weight dot.

    x (B, K) float; w int8 (K, N) with (1, N) scales. Computes in the input
    dtype; XLA fuses the int8->float convert into the dot operand stream.
    """
    w = w_vals.astype(x.dtype)
    return (x @ w) * w_scales.astype(x.dtype)
