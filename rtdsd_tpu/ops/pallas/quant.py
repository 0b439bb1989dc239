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
    # per-column-block grid: decorrelate the PRNG stream across blocks
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
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
    # Column-block grid: per-column scales make columns independent, so
    # blocks are (all rows, bc cols) sized to fit scoped VMEM. Full-matrix
    # blocks OOM on real layer shapes ((4096, 1024) f32 = 16.8 MB > the
    # 16 MB scoped-vmem stack).
    bc = _col_block(r, c)
    if interpret or pltpu is None or bc is None:
        # portable path (also the odd-shape fallback): round-to-nearest
        absmax = jnp.max(jnp.abs(x), axis=0, keepdims=True)
        scale = jnp.maximum(absmax, 1e-12) / 127.0
        vals = jnp.clip(jnp.round(x / scale), -128, 127).astype(jnp.int8)
        return vals, scale

    seed_arr = jnp.asarray([seed], jnp.int32)
    vals, scales = pl.pallas_call(
        _quant_kernel,
        grid=(c // bc,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((r, bc), lambda i: (0, i)),
        ],
        out_specs=(pl.BlockSpec((r, bc), lambda i: (0, i)),
                   pl.BlockSpec((1, bc), lambda i: (0, i))),
        out_shape=(jax.ShapeDtypeStruct((r, c), jnp.int8),
                   jax.ShapeDtypeStruct((1, c), jnp.float32)),
    )(seed_arr, x)
    return vals, scales


# ~4 MB of f32 input per block leaves room for the int8 output, the random
# bits, and the f32 intermediates inside the 16 MB scoped-VMEM stack.
_BLOCK_BYTES = 4 * 1024 * 1024


def _col_block(r: int, c: int) -> int | None:
    """Largest 128-multiple column-block width that divides c and fits VMEM;
    None -> shapes unsuited to the TPU kernel (caller falls back to jnp),
    including matrices so tall that even a 128-wide block blows the budget."""
    if c % 128 != 0 or 4 * r * 128 > _BLOCK_BYTES:
        return None
    bc = min(c, max(128, _BLOCK_BYTES // (4 * r) // 128 * 128))
    while c % bc != 0:
        bc -= 128
    return bc


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
