"""Fused conv + LayerNorm + GELU Pallas kernels (wav2vec2 front-end).

Each feature-extractor layer (reference: fairseq conv blocks used by
``/root/reference/models/fe.py``; here ``models/wav2vec2.py
ConvFeatureExtractor``) is conv1d(k, stride) -> LayerNorm(C) -> GELU. XLA
runs these as separate ops — the layer output makes ~3 HBM round-trips
(conv write, LN stats + apply, GELU), measured ~224 us/clip at b128
against a ~150 us/clip floor (tools/conv_probe.py).

Two kernels:

- :func:`ln_gelu` — LayerNorm + rational-erf GELU in one HBM pass
  (stats, normalize, activate entirely in VMEM). Used after layer 0's
  XLA conv (that conv is 22 us/clip; its LN+GELU epilogue was 143).
- :func:`conv_ln_gelu_grouped` — a whole conv layer per grid cell
  block for the 512->512 stride-2 layers. The stride is absorbed by a
  *zero-copy* reshape ``(B, T, C) -> (B, T/s, s*C)`` outside the kernel
  (row-major identity), so every conv tap j becomes a lane-aligned
  minor-dim slice ``x[q : q + F, p*C : (p+1)*C]`` (q = j // s, p = j % s)
  of the VMEM block — no strided loads, no in-kernel sublane reshapes
  (Mosaic supports neither). Taps concatenate into an in-VMEM im2col
  patch matrix feeding one MXU matmul, and LN + GELU run as the epilogue:
  one HBM read of x, one HBM write of y per layer.

Chaining trick: kernels emit ``n_blocks * block`` frames (a multiple of
8), a row or two beyond the semantically valid ``F``. All per-frame ops
(matmul, LN, GELU) are row-local, and a valid output frame only ever
reads samples ``< t_valid``, so tail garbage never contaminates valid
rows — layers chain uncropped (keeping every inter-layer array length
divisible by the next reshape's stride) and only the final output is
sliced to the true frame count.

Inference-path only (no custom VJP).

**Measured verdict (v5e, b128, this toolchain): XLA wins — these kernels
are NOT wired into the encoder.** ln_gelu runs at 123 us/clip vs its 32
us memory floor; the fused conv layer at 183 us/clip vs XLA's 98 for the
same conv+LN+GELU (block size 256/512/1024 makes no difference, so it is
Mosaic scheduling, not tiling). Same pattern as the small-T attention
kernel (attention.py) and the dots/im2col conv rewrites
(tools/conv_probe.py): on this toolchain XLA's own fusion of
medium-arithmetic-intensity patterns is strong, and the profitable
optimizations are *algorithmic* (e.g. the rational-erf GELU, which is
where the front-end's real win came from). Kept as a tested reference
for the Element-indexed overlapping-window (stencil) technique.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from rtdsd_tpu.ops.fastgelu import _INV_SQRT2, erf_rational
from rtdsd_tpu.ops.pallas.attention import _round_up


def _ln_gelu_f32(acc, g_ref, beta_ref, eps):
    mean = jnp.mean(acc, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(acc - mean), axis=-1, keepdims=True)
    h = (acc - mean) * jax.lax.rsqrt(var + eps)
    h = h * g_ref[...].astype(jnp.float32) + beta_ref[...].astype(jnp.float32)
    return 0.5 * h * (1.0 + erf_rational(h * _INV_SQRT2))


def _ln_gelu_kernel(x_ref, g_ref, beta_ref, o_ref, *, eps: float):
    o_ref[...] = _ln_gelu_f32(x_ref[...].astype(jnp.float32), g_ref,
                              beta_ref, eps).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("f_blk", "eps", "interpret"))
def ln_gelu(x: jax.Array, gamma: jax.Array, beta: jax.Array, *,
            f_blk: int = 512, eps: float = 1e-5,
            interpret: bool = False) -> jax.Array:
    """Fused per-row LayerNorm + GELU: x (B, F, C) -> same shape.

    Output length is rounded up to the frame block (tail rows garbage);
    callers chain uncropped (see module docstring) or slice.
    """
    bsz, f_out, c = x.shape
    f_blk = max(8, min(_round_up(f_blk, 8), _round_up(f_out, 8)))
    n_blk = (f_out + f_blk - 1) // f_blk
    out = pl.pallas_call(
        functools.partial(_ln_gelu_kernel, eps=eps),
        grid=(bsz, n_blk),
        in_specs=[
            pl.BlockSpec((None, f_blk, c), lambda bi, fi: (bi, fi, 0)),
            pl.BlockSpec((c,), lambda bi, fi: (0,)),
            pl.BlockSpec((c,), lambda bi, fi: (0,)),
        ],
        out_specs=pl.BlockSpec((None, f_blk, c), lambda bi, fi: (bi, fi, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, n_blk * f_blk, c), x.dtype),
        interpret=interpret,
    )(x, gamma, beta)
    return out


def _conv_kernel(x_ref, w_ref, b_ref, g_ref, beta_ref, o_ref, *,
                 k: int, s: int, cin: int, f_blk: int, eps: float):
    # taps j < s live in group row f (channels p*cin, contiguous = the whole
    # row); taps j >= s live in row f+1, channels [0, (k-s)*cin). Two
    # matmuls instead of an im2col concat: Mosaic cannot concatenate
    # operands whose sublane offsets differ (row f vs row f+1).
    xv = x_ref[...]                                    # (win_f, s*cin)
    w = w_ref[...]                                     # (k*cin, Cout)
    acc = jax.lax.dot_general(
        xv[0:f_blk, :], w[0:s * cin, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (f_blk, Cout)
    if k > s:
        acc = acc + jax.lax.dot_general(
            xv[1:1 + f_blk, 0:(k - s) * cin], w[s * cin:, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    acc = acc + b_ref[...].astype(jnp.float32)
    o_ref[...] = _ln_gelu_f32(acc, g_ref, beta_ref, eps).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("k", "s", "t_valid", "f_blk",
                                             "eps", "interpret"))
def conv_ln_gelu_grouped(x: jax.Array, w: jax.Array, b: jax.Array,
                         gamma: jax.Array, beta: jax.Array, *, k: int, s: int,
                         t_valid: int | None = None, f_blk: int = 256,
                         eps: float = 1e-5,
                         interpret: bool = False) -> jax.Array:
    """One fused layer y = GELU(LN(conv1d(x, w, b))) for stride-s convs.

    x: (B, T, Cin) with T % s == 0 and Cin % 128 == 0; w: (k, Cin, Cout)
    with s <= k <= 2*s. ``t_valid`` (<= T) is the semantically valid prefix
    of x; valid output frames are ``(t_valid - k) // s + 1``, and the
    returned array is that rounded up to the frame block (tail garbage,
    see module docstring).
    """
    bsz, t, cin = x.shape
    cout = w.shape[-1]
    if t_valid is None:
        t_valid = t
    if t % s or (cin % 128 and not interpret):
        raise ValueError(f"need T % {s} == 0 and Cin % 128 == 0, "
                         f"got T={t} Cin={cin}")
    if not s <= k <= 2 * s:
        raise ValueError(f"need s <= k <= 2s, got k={k} s={s}")
    f_out = (t_valid - k) // s + 1
    f_blk = max(8, min(_round_up(f_blk, 8), _round_up(f_out, 8)))
    n_blk = (f_out + f_blk - 1) // f_blk
    win_f = _round_up(f_blk + 1, 8)
    # grouped view: zero-copy row-major reshape; tap j of frame f is
    # group (f + j // s), channel block (j % s)
    xg = x.reshape(bsz, t // s, s * cin)
    pad_hi = max(0, (n_blk - 1) * f_blk + win_f - t // s)

    w2 = w.reshape(k * cin, cout).astype(x.dtype)
    out = pl.pallas_call(
        functools.partial(_conv_kernel, k=k, s=s, cin=cin, f_blk=f_blk,
                          eps=eps),
        grid=(bsz, n_blk),
        in_specs=[
            pl.BlockSpec((pl.Squeezed(), pl.Element(win_f, (0, pad_hi)),
                          pl.Element(s * cin)),
                         lambda bi, fi: (bi, fi * f_blk, 0)),
            pl.BlockSpec((k * cin, cout), lambda bi, fi: (0, 0)),
            pl.BlockSpec((cout,), lambda bi, fi: (0,)),
            pl.BlockSpec((cout,), lambda bi, fi: (0,)),
            pl.BlockSpec((cout,), lambda bi, fi: (0,)),
        ],
        out_specs=pl.BlockSpec((None, f_blk, cout),
                               lambda bi, fi: (bi, fi, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, n_blk * f_blk, cout), x.dtype),
        interpret=interpret,
    )(xg, w2, b, gamma, beta)
    return out


def supports_fused(conv_layers, extractor_mode: str) -> bool:
    """True if the fused path covers this front-end geometry."""
    if extractor_mode != "layer_norm":
        return False
    for i, (dim, k, s) in enumerate(conv_layers):
        if i == 0:
            continue  # layer 0 conv stays XLA; only its LN+GELU is fused
        cin = conv_layers[i - 1][0]
        # chained inter-layer array lengths are rounded up to multiples of
        # 8 (n_blk * f_blk), so the grouped reshape's T % s == 0 holds only
        # when s divides 8
        if not (s <= k <= 2 * s and cin % 128 == 0 and 8 % s == 0):
            return False
    return True


def fused_conv_frontend(wave: jax.Array, layer_params, conv_layers,
                        dtype=jnp.bfloat16, interpret: bool = False
                        ) -> jax.Array:
    """Run the whole conv front-end with the fused kernels.

    wave: (B, T) raw audio. ``layer_params`` is a list of per-layer dicts
    with conv ``kernel``/``bias`` and LN ``scale``/``bias`` (the
    ConvFeatureExtractor param tree). Returns (B, num_frames, C_last),
    exactly matching the XLA path's frame count.
    """
    x = wave[..., None].astype(dtype)
    t_valid = x.shape[1]
    for i, (dim, k, s) in enumerate(conv_layers):
        p = layer_params[i]
        kern = p["conv"]["kernel"].astype(dtype)
        # conv_bias=False builds no bias param; the kernels take a dense
        # (Cout,) operand, so substitute zeros
        bias = p["conv"].get("bias")
        if bias is None:
            bias = jnp.zeros((kern.shape[-1],), jnp.float32)
        gamma, beta = p["ln"]["scale"], p["ln"]["bias"]
        f_out = (t_valid - k) // s + 1
        if i == 0:
            y = jax.lax.conv_general_dilated(
                x, kern, (s,), "VALID",
                dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=dtype) + bias.astype(dtype)
            x = ln_gelu(y, gamma, beta, interpret=interpret)
        else:
            x = conv_ln_gelu_grouped(x, kern, bias, gamma, beta, k=k, s=s,
                                     t_valid=t_valid, interpret=interpret)
        t_valid = f_out
    return x[:, :t_valid]
