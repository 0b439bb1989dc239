"""Pallas TPU kernel: fused GAT pairwise-attention aggregation.

The AASIST graph attention (``/root/reference/models/aasist_modules.py:61-97``;
flax port ``rtdsd_tpu/models/aasist.py::GraphAttentionLayer``) computes

    pair[i,j,:] = x[i,:] * x[j,:]                      (N, N, D)
    score[i,j]  = tanh(pair[i,j,:] @ W + b) @ a / temp (N, N)
    att         = softmax_j(score)
    out[i,:]    = sum_j att[i,j] * x[j,:]              (N, D)

The naive graph materializes the (B, N, N, D) pairwise tensor and the
(B, N, N, Dout) projection in HBM (for B=128, N=66, D=64: ~140 MB per tensor
per layer). This kernel keeps everything for one batch row in VMEM: each grid
step handles 8 query nodes (TPU sublane granularity); per query the pairwise
row is formed, projected on the MXU, masked-softmaxed and aggregated — the
O(N^2 D) intermediates never reach HBM.

TPU lowering constraints honored: node count padded to a multiple of 8
outside the kernel (padded keys masked to -inf before softmax), all in-kernel
indices static, block shapes (1, 8, D) / (1, Np, D).

Numerically identical (up to float reassociation) to the einsum path; the
equivalence tests live in tests/test_pallas.py. Runs in interpreter mode off
TPU so the same code path is testable on CPU.

Inference-path kernel (no custom VJP): the flax layer uses it under
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

_SUBLANE = 8


def _gat_kernel(xq_ref, x_ref, w_ref, b_ref, a_ref, o_ref, *, temp: float,
                n_valid: int):
    """One grid step = (batch b, query-node group of 8)."""
    xq = xq_ref[0]                    # (8, D)   — 8 query nodes
    x = x_ref[0]                      # (Np, D)  — all (padded) nodes
    w = w_ref[:]                      # (D, Do)
    b = b_ref[:]                      # (1, Do)
    a = a_ref[:]                      # (Do, 1)

    np_nodes = x.shape[0]
    # mask for padded key nodes (j >= n_valid)
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (np_nodes, 1), 0)
    neg_inf = jnp.float32(-1e30)

    for q in range(_SUBLANE):         # static unrolled loop
        xi = xq[q, :]                             # (D,)
        pair = xi[None, :] * x                    # (Np, D)
        proj = jnp.tanh(
            jnp.dot(pair, w, preferred_element_type=jnp.float32) + b)
        s = jnp.dot(proj, a, preferred_element_type=jnp.float32) / temp
        s = jnp.where(j_idx < n_valid, s, neg_inf)       # (Np, 1)
        s = s - jnp.max(s, axis=0, keepdims=True)
        e = jnp.exp(s)
        soft = e / jnp.sum(e, axis=0, keepdims=True)
        o_ref[0, q, :] = jnp.sum(soft * x, axis=0)


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

    n_pad = -(-n // _SUBLANE) * _SUBLANE
    x32 = x.astype(jnp.float32)
    if n_pad != n:
        x32 = jnp.pad(x32, ((0, 0), (0, n_pad - n), (0, 0)))

    kernel = functools.partial(_gat_kernel, temp=float(temperature),
                               n_valid=n)
    specs = dict(memory_space=_VMEM) if (_VMEM is not None and not interpret) \
        else {}
    out = pl.pallas_call(
        kernel,
        grid=(b, n_pad // _SUBLANE),
        in_specs=[
            pl.BlockSpec((1, _SUBLANE, d), lambda bi, i: (bi, i, 0), **specs),
            pl.BlockSpec((1, n_pad, d), lambda bi, i: (bi, 0, 0), **specs),
            pl.BlockSpec((d, do), lambda bi, i: (0, 0), **specs),
            pl.BlockSpec((1, do), lambda bi, i: (0, 0), **specs),
            pl.BlockSpec((do, 1), lambda bi, i: (0, 0), **specs),
        ],
        out_specs=pl.BlockSpec((1, _SUBLANE, d), lambda bi, i: (bi, i, 0),
                               **specs),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, d), jnp.float32),
        interpret=interpret,
    )(x32, x32, att_proj_kernel.astype(jnp.float32),
      att_proj_bias.reshape(1, -1).astype(jnp.float32),
      att_weight.astype(jnp.float32))
    return out[:, :n, :]


def _htrg_kernel(xq_ref, x_ref, w_ref, b_ref, w11_ref, w22_ref, w12_ref,
                 o_ref, *, temp: float, n_valid: int, n1: int):
    """Heterogeneous variant: edge weight selected by (i, j) node types —
    w11 for S-S, w22 for T-T, w12 for cross edges
    (ref aasist_modules.py:239-267)."""
    xq = xq_ref[0]                    # (8, D)
    x = x_ref[0]                      # (Np, D)
    w = w_ref[:]
    b = b_ref[:]
    w11, w22, w12 = w11_ref[:], w22_ref[:], w12_ref[:]

    np_nodes = x.shape[0]
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (np_nodes, 1), 0)
    j_is_1 = j_idx < n1
    valid = j_idx < n_valid
    neg_inf = jnp.float32(-1e30)
    block = pl.program_id(1)

    for q in range(_SUBLANE):
        i_global = block * _SUBLANE + q
        i_is_1 = i_global < n1
        xi = xq[q, :]
        pair = xi[None, :] * x
        proj = jnp.tanh(
            jnp.dot(pair, w, preferred_element_type=jnp.float32) + b)
        s11 = jnp.dot(proj, w11, preferred_element_type=jnp.float32)
        s22 = jnp.dot(proj, w22, preferred_element_type=jnp.float32)
        s12 = jnp.dot(proj, w12, preferred_element_type=jnp.float32)
        same_1 = jnp.logical_and(i_is_1, j_is_1)
        same_2 = jnp.logical_and(jnp.logical_not(i_is_1),
                                 jnp.logical_not(j_is_1))
        s = jnp.where(same_1, s11, jnp.where(same_2, s22, s12)) / temp
        s = jnp.where(valid, s, neg_inf)
        s = s - jnp.max(s, axis=0, keepdims=True)
        e = jnp.exp(s)
        soft = e / jnp.sum(e, axis=0, keepdims=True)
        o_ref[0, q, :] = jnp.sum(soft * x, axis=0)


@functools.partial(jax.jit, static_argnames=("n1", "temperature", "interpret"))
def fused_htrg_gat_aggregate(x: jax.Array, att_proj_kernel: jax.Array,
                             att_proj_bias: jax.Array, w11: jax.Array,
                             w22: jax.Array, w12: jax.Array, n1: int,
                             temperature: float = 1.0,
                             interpret: bool | None = None) -> jax.Array:
    """Typed-edge GAT aggregation for the heterogeneous S/T graph.

    x: (B, N, D) concat of n1 type-1 and N-n1 type-2 nodes.
    """
    b, n, d = x.shape
    do = att_proj_kernel.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    n_pad = -(-n // _SUBLANE) * _SUBLANE
    x32 = x.astype(jnp.float32)
    if n_pad != n:
        x32 = jnp.pad(x32, ((0, 0), (0, n_pad - n), (0, 0)))

    kernel = functools.partial(_htrg_kernel, temp=float(temperature),
                               n_valid=n, n1=int(n1))
    specs = dict(memory_space=_VMEM) if (_VMEM is not None and not interpret) \
        else {}
    ew = lambda a: a.astype(jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_pad // _SUBLANE),
        in_specs=[
            pl.BlockSpec((1, _SUBLANE, d), lambda bi, i: (bi, i, 0), **specs),
            pl.BlockSpec((1, n_pad, d), lambda bi, i: (bi, 0, 0), **specs),
            pl.BlockSpec((d, do), lambda bi, i: (0, 0), **specs),
            pl.BlockSpec((1, do), lambda bi, i: (0, 0), **specs),
            pl.BlockSpec((do, 1), lambda bi, i: (0, 0), **specs),
            pl.BlockSpec((do, 1), lambda bi, i: (0, 0), **specs),
            pl.BlockSpec((do, 1), lambda bi, i: (0, 0), **specs),
        ],
        out_specs=pl.BlockSpec((1, _SUBLANE, d), lambda bi, i: (bi, i, 0),
                               **specs),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, d), jnp.float32),
        interpret=interpret,
    )(x32, x32, att_proj_kernel.astype(jnp.float32),
      att_proj_bias.reshape(1, -1).astype(jnp.float32),
      ew(w11), ew(w22), ew(w12))
    return out[:, :n, :]
