"""Fused multi-head self-attention Pallas kernel for short sequences.

The XLSR front-end attends over T=199 frames (4 s clips; SURVEY.md §3.4).
At this length the in-tree flash-attention kernels (block machinery sized
for T >= 1024) lose to XLA — measured 2.5 ms vs 1.65 ms/clip
(tools/opt_probe.py) — but XLA's own lowering still materializes the
(B, H, T, T) score tensor in HBM with an f32 softmax round-trip: at
b128/T199/H16 that is ~180 MB of score traffic per clip-batch, ~0.65
ms/clip of the flagship's forward, by far the largest remaining
non-matmul cost.

This kernel exploits the *small*-T regime instead: each grid cell loads a
group of G whole (T, D) head slices into VMEM and runs Q@K^T, row softmax,
P@V in one fused body — the (G, T, T) score block never leaves VMEM.
Grouping heads (G=16 => one cell per batch element on the flagship) keeps
grid cells big enough that per-cell DMA setup doesn't dominate, which is
what sank the generic flash kernel here.

Sequence padding goes to a multiple of 16 (bf16 sublane tile); padded key
columns are masked to -1e30 before the softmax; padded query rows are
zeros, softmax over real keys stays finite, and the caller slices them off.

Inference-path only: no custom VJP is defined. Measured at the flagship's
shapes it ties XLA (20.2 vs 17.7 us/clip — both softmax-exp-bound), so it
is NOT wired into the encoder; it ships as a tested option for future
longer-window streaming modes where the score tensor stops fitting VMEM
caches and flash-style fusion starts paying.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, t_real: int, scale: float):
    # refs: (G, T_pad, D) — G head-slices resident in VMEM
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # (G, T_pad, T_pad)
    s = s * scale
    if t_real < s.shape[-1]:
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(cols < t_real, s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # (G, T_pad, D)
    o_ref[...] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def mha_small_t(q: jax.Array, k: jax.Array, v: jax.Array,
                scale: float | None = None,
                interpret: bool = False) -> jax.Array:
    """Self-attention for (B, T, H, D) inputs with small T (<= ~512).

    Drop-in for ``jax.nn.dot_product_attention`` (same BTHD layout, same
    1/sqrt(D) default scale); scores/softmax in f32, output in the input
    dtype. ``interpret=True`` runs the kernel in Pallas interpreter mode
    (for CPU tests).
    """
    b, t, h, d = q.shape
    if scale is None:
        scale = d ** -0.5
    t_pad = _round_up(t, 16)

    def to_heads(x):
        x = jnp.pad(x, [(0, 0), (0, t_pad - t), (0, 0), (0, 0)]) \
            if t_pad != t else x
        return x.transpose(0, 2, 1, 3).reshape(b * h, t_pad, d)

    qh, kh, vh = to_heads(q), to_heads(k), to_heads(v)

    # heads per grid cell: big enough to amortize DMA setup, small enough
    # for VMEM (G=16: ~1.7 MB of qkv/o + 2.8 MB f32 scores at T_pad=208)
    g = h
    while g > 16 or (b * h) % g:
        g -= 1
    block = pl.BlockSpec((g, t_pad, d), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(_mha_kernel, t_real=t, scale=float(scale)),
        grid=(b * h // g,),
        in_specs=[block, block, block],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, d), q.dtype),
        interpret=interpret,
    )(qh, kh, vh)
    return out.reshape(b, h, t_pad, d).transpose(0, 2, 1, 3)[:, :t]
