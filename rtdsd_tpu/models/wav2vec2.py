"""wav2vec2-XLSR (XLS-R 300M) front-end, pure JAX/flax.

The reference loads the fairseq XLSR-300M checkpoint and calls
``model(x, mask=False, features_only=True)['x']``
(``/root/reference/models/fe.py:8-40``); the layer-pruned student variant
slices ``encoder.layers`` to the first/last/middle-n or an arbitrary
``custom_order`` (``/root/reference/models/fe.py:43-99``). This module is a
from-scratch JAX implementation of the same computation:

  raw wave (B, T) ->
    7-layer strided conv feature extractor (stride 320, RF 400, layer-norm
    mode) -> (B, frames, 512)
  -> layer_norm -> Linear 512->1024
  -> grouped-conv relative positional embedding (k=128, groups=16) + GELU
  -> N pre-LN transformer layers (16 heads, ffn 4096)
  -> final layer_norm                                    -> (B, frames, 1024)

TPU-first choices:
- Transformer layers are *stacked* (one pytree with a leading layer axis) and
  executed with ``lax.scan`` — one compilation of one layer regardless of N,
  and layer-subset/custom-order is a static ``jnp.take`` on the stacked
  params (see :func:`select_layers`).
- Attention uses ``jax.nn.dot_product_attention`` (fused on TPU).
- Optional ``remat`` wraps each scanned layer in ``jax.checkpoint`` to trade
  FLOPs for HBM during training.
- All matmuls run in the configured ``dtype`` (bfloat16 by default for MXU);
  params and layer-norm statistics stay float32.

Checkpoint conversion from the fairseq ``.pt`` lives in
:mod:`rtdsd_tpu.models.convert_fairseq`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.ad_checkpoint
import jax.numpy as jnp
from flax import linen as nn

from rtdsd_tpu.ops import fastgelu, groupedconv

Dtype = Any

# torch/fairseq LayerNorm & GroupNorm default eps (flax's default is 1e-6;
# the reference stack normalizes with 1e-5, so use it everywhere for parity)
LN_EPS = 1e-5


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Config:
    # conv feature extractor: (dim, kernel, stride) per layer
    conv_layers: Tuple[Tuple[int, int, int], ...] = (
        (512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2), (512, 3, 2),
        (512, 2, 2), (512, 2, 2))
    extractor_mode: str = "layer_norm"   # XLSR uses per-block LayerNorm
    conv_bias: bool = True
    encoder_embed_dim: int = 1024
    encoder_ffn_dim: int = 4096
    encoder_heads: int = 16
    encoder_layers: int = 24
    conv_pos: int = 128
    conv_pos_groups: int = 16
    dropout: float = 0.0
    attention_dropout: float = 0.0
    activation_dropout: float = 0.0
    layer_norm_first: bool = True        # XLSR / large models are pre-LN
    # lax.scan unroll factor for the layer stack. The scanned while-loop can
    # be pathologically slow to compile on some XLA:TPU toolchains; full
    # unroll (= encoder_layers) trades compile-graph size for a flat program.
    scan_unroll: int = 1
    # "conv": XLA convolutions (fastest steady-state; first-ever compile of
    # the 64k-sample layers takes minutes -> mitigated by the persistent
    # compilation cache). "dots": strided convs decomposed into k
    # strided-slice MXU matmuls (~6x faster cold compile, ~30% slower run).
    conv_impl: str = "conv"
    # Rematerialization policy when the encoder is built with remat=True:
    # "full" recomputes the whole layer in backward (lowest memory);
    # "hidden" saves the two largest per-layer intermediates (post-GELU FFN
    # hidden + attention output, tagged via checkpoint_name) and recomputes
    # only the rest — ~1.6 GB extra at batch 32 for less backward recompute.
    # "dots" saves every matmul output (jax dots_saveable) — least
    # recompute, most memory of the three.
    remat_policy: str = "full"
    # Partial (mixed) rematerialization: with remat=True and this >= 2,
    # the scanned stack becomes chunks of this many layers where the
    # FIRST layer of each chunk keeps its activations (no remat) and the
    # other (m-1) remat — recompute drops to (m-1)/m of the layers for
    # (L/m) layers' worth of extra activation memory. The whole-program
    # policies ("hidden"/"dots") fail to compile at b192 on this
    # toolchain (PERFORMANCE.md r4 retry); this is the compilable
    # middle ground between 46% MFU and the toolchain wall (probed in
    # tools/train_remat_probe.py). 0/1 = off (uniform per-layer remat).
    # Requires encoder_layers % remat_save_every == 0. Parameter layout
    # changes (layers/layer_save + layers/layers_r vs layers/layer);
    # models/convert_fairseq.py::to_mixed_remat maps a standard stacked
    # tree into it.
    remat_save_every: int = 0
    # Weight-only int8 transformer matmuls (serving mode): q/k/v/out/fc1/fc2
    # kernels are stored as int8 values + per-output-column float scales
    # (produced by models/quantize.py from a trained f32 tree), dequantized
    # on the fly inside the matmul. Halves the ~600 MB weight HBM traffic per
    # forward vs bf16 — a small-batch / real-time latency knob; at large
    # batch the model is MXU-bound and w8 is neutral.
    w8: bool = False
    # Dynamic int8 activations on top of w8 (w8a8 serving mode): per-token
    # symmetric abs-max quantization feeds int8 x int8 MXU matmuls (v5e
    # runs int8 at ~1.6-1.7x the bf16 rate; the dynamic-quant epilogue
    # costs ~10% of that back). Same quantized weight tree as w8. Requires
    # w8=True; scoring-path numerics shift more than w8 — validate scores.
    a8: bool = False
    # Rational-minimax erf GELU (ops/fastgelu.py): ~5x fewer VPU ops than
    # XLA's exact erf and fusable into matmul epilogues; accurate below bf16
    # resolution (see the fastgelu module docstring). Set False for
    # bit-exact-vs-XLA float32 numerics (e.g. torch-oracle parity tests).
    fast_gelu: bool = True
    # bf16 attention softmax (max-subtract in bf16, exp in f32, normalize
    # in bf16): halves the score-tensor traffic, measured 27% faster than
    # the f32-softmax attention at the flagship's shapes (12.5 vs 17.1
    # us/clip/layer). Output differs from the f32 softmax by ~7e-4 abs —
    # the bf16 compute dtype's own noise scale — so it only activates when
    # the model computes in (b)f16 AND runs in eval mode, the domain the
    # drift was validated in (decision-identical CLI scoring). Training
    # keeps the f32-softmax attention; enabling it there measured +7%
    # train throughput (158 vs 147 utt/s) but its gradient-noise effect on
    # convergence/EER is unvalidated — revisit with a convergence study.
    fast_softmax: bool = True
    # Extend fast_softmax to TRAINING forwards. Default ON since round 2:
    # +3.8-7% train throughput (151.8 vs 146.2 utt/s at b64 remat this
    # toolchain; 158 vs 147 round 1), gradient delta 0.28% global (bf16
    # noise scale), and the synthetic-task convergence study
    # (tools/fast_softmax_study.py, table in PERFORMANCE.md) shows
    # seed-indistinguishable loss curves and identical EER/accuracy.
    # Set false to restore the f32-softmax training attention. Only active
    # when fast_softmax is on, dtype is (b)f16, and attention_dropout == 0
    # (the dropout path needs explicit probabilities).
    fast_softmax_train: bool = True

    # Split the conv front-end into this many stride-aligned overlapping
    # segments batched together (0/1 = off). At B=1 the 64k-sample conv
    # chain is launch-bound; as 8 batched 8k segments it runs ~8% faster
    # end-to-end (tools/b1_opt_probe.py: 3.32 -> 3.04 ms/clip; with
    # scan_unroll=24 too, 2.84). Exact for the layer_norm extractor (per-
    # frame normalization); neutral at large batch — a small-batch /
    # real-time serving knob.
    conv_segments: int = 0

    @property
    def head_dim(self) -> int:
        return self.encoder_embed_dim // self.encoder_heads

    @property
    def conv_receptive_field(self) -> int:
        return conv_receptive_field(self.conv_layers)

    @property
    def total_stride(self) -> int:
        s = 1
        for _, _, stride in self.conv_layers:
            s *= stride
        return s

    def num_frames(self, num_samples: int) -> int:
        t = num_samples
        for _, k, s in self.conv_layers:
            t = (t - k) // s + 1
        return t


def conv_receptive_field(conv_layers) -> int:
    """Conv-stack receptive field in samples (XLSR: 400). Single source of
    truth — the streaming scorer and segmented-conv path both use it."""
    rf = 1
    for _dim, k, s in reversed(list(conv_layers)):
        rf = (rf - 1) * s + k
    return rf


def conv_segment_geometry(cfg: "Wav2Vec2Config", seg_frames: int,
                          n_segs: int) -> Tuple[int, int, int]:
    """(seg_samples, seg_hop, padded_total_samples) for splitting a wave
    into ``n_segs`` stride-aligned overlapping conv segments of
    ``seg_frames`` frames each. Shared by the encoder's conv_segments path
    and the incremental streaming scorer so the alignment arithmetic has
    one implementation."""
    stride = cfg.total_stride
    seg_samples = cfg.conv_receptive_field + (seg_frames - 1) * stride
    seg_hop = seg_frames * stride
    pad_to = (n_segs - 1) * seg_hop + seg_samples
    return seg_samples, seg_hop, pad_to


def middle_indices(array_length: int, n: int) -> List[int]:
    """Ref: /root/reference/models/fe.py:43-50."""
    start = (array_length - n) // 2
    return list(range(start, start + n))


def resolve_layer_indices(total: int, num_layers: int, order: str = "first",
                          custom_order: Optional[Sequence[int]] = None
                          ) -> List[int]:
    """Layer-subset selection semantics of My_XLSR_FE
    (/root/reference/models/fe.py:69-90)."""
    if num_layers < 1 or num_layers > total:
        raise ValueError(f"num_layers must be in [1, {total}]")
    if order == "first":
        return list(range(num_layers))
    if order == "last":
        return list(range(total - num_layers, total))
    if order == "middle":
        return middle_indices(total, num_layers)
    if custom_order is None:
        raise ValueError("custom order requires custom_order list of ints")
    if not isinstance(custom_order, (list, tuple)):
        raise ValueError("custom_order must be a list of integers")
    bad = [i for i in custom_order if not (0 <= int(i) < total)]
    if bad:
        # fail like the reference's ModuleList indexing would (fe.py:89-90)
        # instead of letting jnp.take clamp silently to the wrong layers
        raise ValueError(f"custom_order indices {bad} out of range "
                         f"[0, {total})")
    return list(custom_order)


def strided_conv1d_dots(x: jax.Array, kernel: jax.Array,
                        bias: Optional[jax.Array], stride: int) -> jax.Array:
    """VALID strided 1-D conv as a sum of k strided-slice matmuls.

    x: (B, T, Cin); kernel: (k, Cin, Cout). Equivalent to
    ``nn.Conv(padding="VALID", strides=stride)`` but lowers to k MXU dots —
    on some XLA:TPU toolchains the native conv lowering of the wav2vec2
    front-end (64000-sample spatial dim) takes minutes to compile; this
    compiles in seconds and runs at matmul speed.
    """
    k, _cin, _cout = kernel.shape
    frames = (x.shape[1] - k) // stride + 1
    y = None
    for j in range(k):
        xs = jax.lax.slice_in_dim(x, j, j + stride * (frames - 1) + 1,
                                  stride, axis=1)
        t = jnp.einsum("btc,co->bto", xs, kernel[j],
                       preferred_element_type=x.dtype)
        y = t if y is None else y + t
    if bias is not None:
        y = y + bias
    return y


class _ConvParams(nn.Module):
    """Conv-compatible params (kernel (k, Cin, Cout) [, bias]) without
    applying them — same tree as nn.Conv, consumed by the dots path."""

    features: int
    kernel_size: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, in_features, self.features))
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.features,)) if self.use_bias else None
        return k, b


def _use_fast_gelu(cfg: "Wav2Vec2Config", dtype) -> bool:
    """Fast rational-erf GELU only where its ~4e-6 abs error sits below the
    compute dtype's own resolution — (b)f16. float32 keeps XLA's exact erf so
    scoring a converted reference checkpoint at compute_dtype float32 stays
    bit-comparable to the torch oracle (same gating rule as fast_softmax)."""
    return cfg.fast_gelu and dtype in (jnp.bfloat16, jnp.float16)


class ConvFeatureExtractor(nn.Module):
    """Strided 1-D conv stack over the raw waveform (fairseq layer_norm mode)."""

    cfg: Wav2Vec2Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (B, T) -> (B, T, 1)
        x = x[..., None].astype(self.dtype)
        for i, (dim, k, stride) in enumerate(self.cfg.conv_layers):
            if self.cfg.conv_impl == "dots":
                kern, bias = _ConvParams(dim, k, self.cfg.conv_bias,
                                         name=f"conv_{i}")(x.shape[-1])
                x = strided_conv1d_dots(x, kern.astype(x.dtype),
                                        None if bias is None
                                        else bias.astype(x.dtype), stride)
            else:
                x = nn.Conv(dim, (k,), strides=(stride,), padding="VALID",
                            use_bias=self.cfg.conv_bias, name=f"conv_{i}",
                            dtype=self.dtype)(x)
            if self.cfg.extractor_mode == "layer_norm":
                x = nn.LayerNorm(epsilon=LN_EPS, name=f"ln_{i}", dtype=self.dtype)(x)
            elif self.cfg.extractor_mode == "group_norm" and i == 0:
                # fairseq "default" mode: GroupNorm(512, 512) on layer 0 only
                x = nn.GroupNorm(epsilon=LN_EPS, num_groups=dim, name="gn_0",
                                 dtype=self.dtype)(x)
            x = fastgelu.gelu(x, fast=_use_fast_gelu(self.cfg, self.dtype))
        return x  # (B, frames, 512)


class PositionalConv(nn.Module):
    """Grouped conv positional embedding (fairseq pos_conv + SamePad + GELU).

    In training mode the grouped conv runs through
    :func:`groupedconv.grouped_conv1d` (per-group plain convolutions, same
    math and same param tree as ``nn.Conv(feature_group_count=...)``)
    because XLA's SPMD partitioner multiplies a feature-grouped conv's
    *kernel gradient* by the model-axis size on multi-axis meshes — see
    ops/groupedconv.py. Eval/scoring is never differentiated, so it keeps
    the native grouped conv (one fused op; the per-group loop costs ~3%
    of flagship scoring).
    """

    cfg: Wav2Vec2Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        k = self.cfg.conv_pos
        dim = self.cfg.encoder_embed_dim
        groups = self.cfg.conv_pos_groups
        conv = _ConvParams(dim, k, use_bias=True, name="conv")
        kern, bias = conv(x.shape[-1] // groups)
        kern = kern.astype(self.dtype)
        bias = None if bias is None else bias.astype(self.dtype)
        if train:
            pos = groupedconv.grouped_conv1d(
                x, kern, bias, groups=groups, padding=((k // 2, k // 2),))
        else:
            pos = jax.lax.conv_general_dilated(
                x, kern, (1,), ((k // 2, k // 2),),
                dimension_numbers=("NWC", "WIO", "NWC"),
                feature_group_count=groups,
                preferred_element_type=x.dtype)
            if bias is not None:
                pos = pos + bias
        if k % 2 == 0:
            pos = pos[:, :-1, :]  # fairseq SamePad trims one step for even k
        return fastgelu.gelu(pos, fast=_use_fast_gelu(self.cfg, self.dtype))


class W8Dense(nn.Module):
    """Dense with weight-only int8 storage: ``y = (x @ vals) * scales + b``.

    ``vals`` (in, out) int8 and ``scales`` (1, out) float32 come from
    :func:`rtdsd_tpu.models.quantize.quantize_encoder_params`; the per-column
    scale commutes out of the matmul, so dequantization is a fused epilogue
    and the kernel bytes read from HBM stay int8.
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        vals = self.param("vals", nn.initializers.zeros_init(),
                          (x.shape[-1], self.features), jnp.int8)
        scales = self.param("scales", nn.initializers.ones_init(),
                            (1, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        y = jnp.dot(x.astype(self.dtype), vals.astype(self.dtype))
        return y * scales[0].astype(self.dtype) + bias.astype(self.dtype)


class W8A8Dense(nn.Module):
    """Dense with int8 weights AND dynamically int8-quantized activations.

    Same ``vals``/``scales``/``bias`` param tree as :class:`W8Dense` (one
    quantized checkpoint serves both modes). Activations are quantized
    per token (row-wise symmetric abs-max to [-127, 127]) at matmul entry,
    the product runs int8 x int8 -> int32 on the MXU (~1.6-1.7x the bf16
    rate on v5e), and both scales dequantize in the f32 epilogue:

        y = (xq @ vals) * (amax / 127) * scales + b
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        vals = self.param("vals", nn.initializers.zeros_init(),
                          (x.shape[-1], self.features), jnp.int8)
        scales = self.param("scales", nn.initializers.ones_init(),
                            (1, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        xf = x.astype(jnp.float32)
        amax = jnp.maximum(
            jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-6)
        xq = jnp.round(xf * (127.0 / amax)).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, vals, (((xq.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * (amax * (1.0 / 127.0))
        y = y * scales[0] + bias
        return y.astype(self.dtype)


class TransformerLayer(nn.Module):
    """Pre-LN transformer layer (fairseq TransformerSentenceEncoderLayer,
    layer_norm_first=True)."""

    cfg: Wav2Vec2Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        cfg = self.cfg
        residual = x
        h = nn.LayerNorm(epsilon=LN_EPS, name="self_attn_layer_norm", dtype=self.dtype)(x)

        def dense(features, name):
            if cfg.w8 and cfg.a8:
                return W8A8Dense(features, name=name, dtype=self.dtype)
            if cfg.w8:
                return W8Dense(features, name=name, dtype=self.dtype)
            return nn.Dense(features, name=name, dtype=self.dtype)

        def proj(name):
            return dense(cfg.encoder_embed_dim, name)

        b, t, d = h.shape
        shape_h = (b, t, cfg.encoder_heads, cfg.head_dim)
        q = proj("q_proj")(h).reshape(shape_h)
        kk = proj("k_proj")(h).reshape(shape_h)
        v = proj("v_proj")(h).reshape(shape_h)
        if cfg.attention_dropout > 0 and train:
            # fairseq applies dropout to the attention probabilities; the
            # fused jax.nn.dot_product_attention has no dropout hook, so
            # take the explicit path only when it actually matters
            scores = jnp.einsum("bqhd,bkhd->bhqk", q * cfg.head_dim ** -0.5,
                                kk)
            probs = jax.nn.softmax(scores.astype(jnp.float32)).astype(h.dtype)
            probs = nn.Dropout(cfg.attention_dropout,
                               deterministic=not train)(probs)
            attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        elif (cfg.fast_softmax and (not train or cfg.fast_softmax_train)
                and self.dtype in (jnp.bfloat16, jnp.float16)):
            s = jnp.einsum("bqhd,bkhd->bhqk", q * cfg.head_dim ** -0.5,
                           kk, preferred_element_type=self.dtype)
            mx = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp((s - mx).astype(jnp.float32)).astype(self.dtype)
            probs = e / jnp.sum(e, axis=-1, keepdims=True).astype(self.dtype)
            attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        else:
            attn = jax.nn.dot_product_attention(q, kk, v)
        attn = attn.reshape(b, t, d)
        h = proj("out_proj")(attn)
        h = jax.ad_checkpoint.checkpoint_name(h, "attn_out")
        h = nn.Dropout(cfg.dropout, deterministic=not train)(h)
        x = residual + h

        residual = x
        h = nn.LayerNorm(epsilon=LN_EPS, name="final_layer_norm", dtype=self.dtype)(x)
        h = dense(cfg.encoder_ffn_dim, "fc1")(h)
        h = fastgelu.gelu(h, fast=_use_fast_gelu(cfg, self.dtype))
        h = jax.ad_checkpoint.checkpoint_name(h, "ffn_hidden")
        h = nn.Dropout(cfg.activation_dropout, deterministic=not train)(h)
        h = dense(cfg.encoder_embed_dim, "fc2")(h)
        h = nn.Dropout(cfg.dropout, deterministic=not train)(h)
        return residual + h


def _segmented_conv_impl(extractor, wave: jax.Array, cfg: "Wav2Vec2Config"
                         ) -> jax.Array:
    """Conv front-end over ``cfg.conv_segments`` stride-aligned overlapping
    segments batched along B. Exact for the layer_norm extractor: frames
    are stride-aligned (VALID padding, total stride divides segment hops)
    and normalization is per-frame. See tools/b1_opt_probe.py."""
    if cfg.extractor_mode != "layer_norm":
        raise ValueError("conv_segments requires the layer_norm extractor "
                         "(group_norm normalizes across the whole window)")
    b, t = wave.shape
    total = cfg.num_frames(t)
    nseg = cfg.conv_segments
    seg_frames = -(-total // nseg)
    seg_samples, seg_hop, pad_to = conv_segment_geometry(cfg, seg_frames,
                                                         nseg)
    wp = jnp.pad(wave, ((0, 0), (0, max(0, pad_to - t))))
    segs = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(wp, i * seg_hop, seg_samples, axis=1)
         for i in range(nseg)], axis=1)                # (B, nseg, seg_samples)
    f = extractor(segs.reshape(b * nseg, seg_samples))
    return f.reshape(b, nseg * seg_frames, f.shape[-1])[:, :total]


class _ScanLayer(nn.Module):
    """Adapter giving TransformerLayer scan's (carry, x) -> (carry, y) shape.

    The per-layer output is also emitted as ``y`` so KD taps get every
    intermediate hidden state for free (stacked (L, B, T, D)). ``train`` is a
    module attribute, not a call kwarg — nn.scan drops call kwargs."""

    cfg: Wav2Vec2Config
    dtype: Dtype = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, carry, _):
        y = TransformerLayer(self.cfg, self.dtype, name="layer")(
            carry, train=self.train)
        return y, y


class _MixedRematChunk(nn.Module):
    """One chunk of the partial-remat stack (``remat_save_every`` = m):
    the first layer runs plain (its activations are saved — the chunk
    boundary), the remaining m-1 layers run under an inner remat'd scan.
    Emits the chunk's per-layer hiddens stacked (m, B, T, D) so the outer
    scan still exposes every hidden state for KD taps."""

    cfg: Wav2Vec2Config
    dtype: Dtype = jnp.float32
    train: bool = False
    policy: Optional[object] = None

    @nn.compact
    def __call__(self, carry, _):
        y0 = TransformerLayer(self.cfg, self.dtype, name="layer_save")(
            carry, train=self.train)
        inner_cls = nn.remat(_ScanLayer, static_argnums=(),
                             prevent_cse=False, policy=self.policy)
        inner = nn.scan(
            inner_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.cfg.remat_save_every - 1,
            metadata_params={nn.PARTITION_NAME: "layers"},
        )(self.cfg, self.dtype, self.train, name="layers_r")
        y, hs = inner(y0, None)
        hiddens = jnp.concatenate([y0[None], hs], axis=0)
        return y, hiddens


class Wav2Vec2Encoder(nn.Module):
    """Full XLSR front-end: wave (B, T) -> features (B, frames, 1024)."""

    cfg: Wav2Vec2Config = Wav2Vec2Config()
    dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, wave: Optional[jax.Array], *, train: bool = False,
                 return_hiddens: bool = False,
                 conv_feats: Optional[jax.Array] = None):
        """``conv_feats`` (B, frames, C) bypasses the conv front-end — the
        incremental streaming path (engine/streaming.py) computes conv
        features once over long audio and re-enters here per window."""
        cfg = self.cfg
        extractor = ConvFeatureExtractor(cfg, self.dtype,
                                         name="feature_extractor")
        if conv_feats is not None:
            feats = conv_feats
        elif cfg.conv_segments > 1:
            feats = _segmented_conv_impl(extractor, wave, cfg)
        else:
            feats = extractor(wave)
        # float32 for the normalization, as fairseq does
        x = nn.LayerNorm(epsilon=LN_EPS, name="layer_norm_pre", dtype=self.dtype)(feats)
        x = nn.Dense(cfg.encoder_embed_dim, name="post_extract_proj",
                     dtype=self.dtype)(x)
        x = nn.Dropout(cfg.dropout, deterministic=not train)(x)

        x = x + PositionalConv(cfg, self.dtype, name="pos_conv")(
            x, train=train)
        if not cfg.layer_norm_first:
            x = nn.LayerNorm(epsilon=LN_EPS, name="encoder_layer_norm", dtype=self.dtype)(x)

        policy = None
        if self.remat:
            if cfg.remat_policy == "hidden":
                policy = jax.checkpoint_policies.save_only_these_names(
                    "attn_out", "ffn_hidden")
            elif cfg.remat_policy == "dots":
                # save every matmul output (q/k/v/scores/attn/ffn), recompute
                # only elementwise ops — the max-memory/min-recompute point
                # of the save_dot family (measured verdict: PERFORMANCE.md)
                policy = jax.checkpoint_policies.dots_saveable
            elif cfg.remat_policy != "full":
                raise ValueError(
                    f"unknown remat_policy {cfg.remat_policy!r} "
                    "(have: full, hidden, dots)")
        if self.remat and cfg.remat_save_every >= 2:
            # partial remat: chunks of m layers, first saved, rest remat'd
            m = cfg.remat_save_every
            if cfg.encoder_layers % m:
                raise ValueError(
                    f"remat_save_every={m} must divide encoder_layers="
                    f"{cfg.encoder_layers}")
            stack = nn.scan(
                _MixedRematChunk,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=cfg.encoder_layers // m,
                metadata_params={nn.PARTITION_NAME: "chunks"},
            )(cfg, self.dtype, train, policy, name="layers")
            x, hiddens = stack(x, None)
            # (L/m, m, B, T, D) -> (L, B, T, D), chunk-major = layer order
            hiddens = hiddens.reshape((-1,) + hiddens.shape[2:])
        else:
            layer_cls = _ScanLayer
            if self.remat:
                layer_cls = nn.remat(
                    _ScanLayer, static_argnums=(), prevent_cse=False,
                    policy=policy)
            stack = nn.scan(
                layer_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=cfg.encoder_layers,
                unroll=min(max(cfg.scan_unroll, 1), cfg.encoder_layers),
                metadata_params={nn.PARTITION_NAME: "layers"},
            )(cfg, self.dtype, train, name="layers")
            x, hiddens = stack(x, None)

        if cfg.layer_norm_first:
            x = nn.LayerNorm(epsilon=LN_EPS, name="encoder_layer_norm", dtype=self.dtype)(x)

        # Expose per-layer hidden states (stacked (L, B, T, D)) for KD taps —
        # the functional replacement for the reference's forward hooks on
        # encoder.layers[i] (/root/reference/trainer.py:176-195).
        self.sow("intermediates", "hidden_states", hiddens)

        if return_hiddens:
            return x, hiddens
        return x


def select_layers(params, indices: Sequence[int]):
    """Build a layer-subset front-end param tree from a full one.

    Transformer layer params are stacked on axis 0 (see ``nn.scan`` above), so
    first/last/middle/custom selection (ref semantics,
    /root/reference/models/fe.py:69-90 and the KD custom-order weight copy,
    /root/reference/main_kd.py:133-141) is a single static gather per leaf.
    """
    idx = jnp.asarray(list(indices), dtype=jnp.int32)

    def maybe_take(path, leaf):
        if any(getattr(p, "key", None) == "layers" for p in path):
            if idx.size and (int(idx.min()) < 0
                             or int(idx.max()) >= leaf.shape[0]):
                raise ValueError(
                    f"layer indices {list(indices)} out of range for "
                    f"stacked axis of size {leaf.shape[0]}")
            return jnp.take(leaf, idx, axis=0)
        return leaf

    flat = jax.tree_util.tree_map_with_path(maybe_take, params)
    return flat


def subset_config(cfg: Wav2Vec2Config, num_layers: int) -> Wav2Vec2Config:
    return dataclasses.replace(cfg, encoder_layers=num_layers)
