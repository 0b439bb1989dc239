"""Pallas TPU kernel: fused GAT pairwise-attention aggregation.

The AASIST graph attention (``/root/reference/models/aasist_modules.py:61-97``;
flax port ``rtdsd_tpu/models/aasist.py::GraphAttentionLayer``) computes

    pair[i,j,:] = x[i,:] * x[j,:]                      (N, N, D)
    score[i,j]  = tanh(pair[i,j,:] @ W + b) @ a / temp (N, N)
    att         = softmax_j(score)
    out[i,:]    = sum_j att[i,j] * x[j,:]              (N, D)

The naive graph materializes the (B, N, N, D) pairwise tensor and the
(B, N, N, Dout) projection in HBM (for B=32, N=66, D=64: ~35 MB per tensor
per layer). This kernel keeps everything for one batch row in VMEM: for each
query node i it forms the pairwise row, projects on the MXU, softmaxes, and
aggregates — the O(N^2 D) intermediates never leave the chip.

Numerically identical (up to float reassociation) to the einsum path; the
equivalence test lives in tests/test_pallas.py. Runs in interpreter mode off
TPU so the same code path is testable on CPU.

Inference-path kernel (no custom VJP yet): the flax layer uses it under
``fused=True`` at eval; training keeps the XLA einsum graph.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU-enabled builds
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None


def _gat_kernel(x_ref, w_ref, b_ref, a_ref, o_ref, *, temp: float, n: int):
    x = x_ref[0]                      # (N, D)
    w = w_ref[:]                      # (D, Do)
    b = b_ref[:]                      # (1, Do)
    a = a_ref[:]                      # (Do, 1)

    def body(i, _):
        xi = x[i, :]                              # (D,)
        pair = xi[None, :] * x                    # (N, D) — row i vs all j
        proj = jnp.tanh(
            jnp.dot(pair, w, preferred_element_type=jnp.float32) + b)
        s = jnp.dot(proj, a, preferred_element_type=jnp.float32)[:, 0] / temp
        s = jax.nn.softmax(s)
        o_ref[0, i, :] = jnp.dot(s[None, :], x,
                                 preferred_element_type=jnp.float32)[0]
        return 0

    jax.lax.fori_loop(0, n, body, 0)


@functools.partial(jax.jit, static_argnames=("temperature", "interpret"))
def fused_gat_aggregate(x: jax.Array, att_proj_kernel: jax.Array,
                        att_proj_bias: jax.Array, att_weight: jax.Array,
                        temperature: float = 1.0,
                        interpret: bool | None = None) -> jax.Array:
    """(B, N, D) nodes -> (B, N, D) attention-aggregated nodes.

    att_proj_kernel: (D, Do); att_proj_bias: (Do,); att_weight: (Do, 1).
    """
    b, n, d = x.shape
    do = att_proj_kernel.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    x = x.astype(jnp.float32)
    kernel = functools.partial(_gat_kernel, temp=float(temperature), n=n)
    specs = dict(memory_space=_VMEM) if (_VMEM is not None and not interpret) \
        else {}
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), **specs),
            pl.BlockSpec((d, do), lambda i: (0, 0), **specs),
            pl.BlockSpec((1, do), lambda i: (0, 0), **specs),
            pl.BlockSpec((do, 1), lambda i: (0, 0), **specs),
        ],
        out_specs=pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), **specs),
        out_shape=jax.ShapeDtypeStruct((b, n, d), jnp.float32),
        interpret=interpret,
    )(x, att_proj_kernel.astype(jnp.float32),
      att_proj_bias.reshape(1, -1).astype(jnp.float32),
      att_weight.astype(jnp.float32))
