"""Conformer classifier head, flax.

The reference builds 4 lucidrains ``ConformerBlock``s over XLSR features with
a prepended class token (``/root/reference/models/conformer_baseline.py:8-29``;
teacher ``Model`` :31-64, student ``MyModel`` :66-99). This is a from-scratch
JAX implementation matching that package's computation
(block = 0.5*FF -> MHA with Shaw relative positions -> conv module -> 0.5*FF
-> LayerNorm; conv module = pointwise->GLU->depthwise->BN->Swish->pointwise),
in NWC layout so the depthwise conv and GLU fuse on TPU.

The reference student's ``MyConformer.forward(x, device)`` two-arg call is a
snapshot bug (conformer_baseline.py:98) — not reproduced; both teacher and
student here share one working head.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from rtdsd_tpu.models.wav2vec2 import _ConvParams
from rtdsd_tpu.ops import groupedconv

Dtype = Any

# torch LayerNorm default eps, for parity with the lucidrains/torch stack
LN_EPS = 1e-5
_BN_KW = dict(momentum=0.9, epsilon=1e-5)


class ConformerFeedForward(nn.Module):
    dim: int
    mult: int = 4
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        x = nn.Dense(self.dim * self.mult, name="fc1", dtype=self.dtype)(x)
        x = jax.nn.silu(x)  # Swish
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.dim, name="fc2", dtype=self.dtype)(x)
        return nn.Dropout(self.dropout, deterministic=not train)(x)


class ConformerAttention(nn.Module):
    """MHA with Shaw-style relative positional embeddings (max_pos_emb=512)."""

    dim: int
    heads: int
    dim_head: int
    dropout: float = 0.0
    max_pos_emb: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        b, n, _ = x.shape
        h, dh = self.heads, self.dim_head
        inner = h * dh
        scale = dh ** -0.5

        q = nn.Dense(inner, use_bias=False, name="to_q", dtype=self.dtype)(x)
        kv = nn.Dense(inner * 2, use_bias=False, name="to_kv",
                      dtype=self.dtype)(x)
        k, v = jnp.split(kv, 2, axis=-1)
        q = q.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, h, dh).transpose(0, 2, 1, 3)

        dots = jnp.einsum("bhid,bhjd->bhij", q, k) * scale

        # relative positional attention (Shaw et al.), as in lucidrains
        seq = jnp.arange(n)
        dist = jnp.clip(seq[:, None] - seq[None, :],
                        -self.max_pos_emb, self.max_pos_emb) + self.max_pos_emb
        rel_emb = nn.Embed(2 * self.max_pos_emb + 1, dh, name="rel_pos_emb",
                           dtype=self.dtype)(dist)              # (n, n, dh)
        pos_attn = jnp.einsum("bhid,ijd->bhij", q, rel_emb) * scale
        dots = dots + pos_attn

        attn = jax.nn.softmax(dots, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = nn.Dense(self.dim, name="to_out", dtype=self.dtype)(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class ConformerConvModule(nn.Module):
    dim: int
    expansion_factor: int = 2
    kernel_size: int = 31
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        inner = self.dim * self.expansion_factor
        k = self.kernel_size
        # lucidrains calc_same_padding: (k//2, k//2 - (k+1)%2)
        pad = (k // 2, k // 2 - (k + 1) % 2)

        x = nn.LayerNorm(epsilon=LN_EPS, name="ln", dtype=self.dtype)(x)
        x = nn.Dense(inner * 2, name="pw1", dtype=self.dtype)(x)  # 1x1 conv
        a, g = jnp.split(x, 2, axis=-1)
        x = a * jax.nn.sigmoid(g)                                 # GLU
        # Depthwise conv: in training the k-tap shift-multiply form (same
        # math and param tree as nn.Conv(feature_group_count=inner)) works
        # around XLA's SPMD grouped-conv *gradient* corruption on
        # multi-axis meshes (ops/groupedconv.py); eval is never
        # differentiated and keeps the native fused depthwise conv —
        # mirroring PositionalConv in models/wav2vec2.py.
        dw_kernel, dw_bias = _ConvParams(inner, k, name="dw")(1)
        dw_kernel = dw_kernel.astype(self.dtype)
        dw_bias = dw_bias.astype(self.dtype)
        if train:
            x = groupedconv.depthwise_conv1d(x, dw_kernel, dw_bias,
                                             padding=pad)
        else:
            x = jax.lax.conv_general_dilated(
                x, dw_kernel, (1,), (pad,),
                dimension_numbers=("NWC", "WIO", "NWC"),
                feature_group_count=inner,
                preferred_element_type=x.dtype) + dw_bias
        x = nn.BatchNorm(use_running_average=not train, name="bn",
                         dtype=self.dtype, **_BN_KW)(x)
        x = jax.nn.silu(x)
        x = nn.Dense(self.dim, name="pw2", dtype=self.dtype)(x)
        return nn.Dropout(self.dropout, deterministic=not train)(x)


class ConformerBlock(nn.Module):
    dim: int
    heads: int = 4
    dim_head: int = 64
    ff_mult: int = 4
    conv_expansion_factor: int = 2
    conv_kernel_size: int = 31
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        h = nn.LayerNorm(epsilon=LN_EPS, name="ff1_norm", dtype=self.dtype)(x)
        x = x + 0.5 * ConformerFeedForward(
            self.dim, self.ff_mult, self.dropout, self.dtype,
            name="ff1")(h, train=train)

        h = nn.LayerNorm(epsilon=LN_EPS, name="attn_norm", dtype=self.dtype)(x)
        x = x + ConformerAttention(
            self.dim, self.heads, self.dim_head, self.dropout,
            dtype=self.dtype, name="attn")(h, train=train)

        x = x + ConformerConvModule(
            self.dim, self.conv_expansion_factor, self.conv_kernel_size,
            self.dropout, self.dtype, name="conv")(x, train=train)

        h = nn.LayerNorm(epsilon=LN_EPS, name="ff2_norm", dtype=self.dtype)(x)
        x = x + 0.5 * ConformerFeedForward(
            self.dim, self.ff_mult, self.dropout, self.dtype,
            name="ff2")(h, train=train)

        return nn.LayerNorm(epsilon=LN_EPS, name="post_norm", dtype=self.dtype)(x)


class MyConformer(nn.Module):
    """Class-token conformer classifier
    (ref: conformer_baseline.py:8-29)."""

    emb_size: int = 144
    heads: int = 4
    ffmult: int = 4
    exp_fac: int = 2
    kernel_size: int = 31
    n_encoders: int = 4
    num_classes: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        b = x.shape[0]
        # torch: nn.Parameter(torch.rand(1, emb)) — uniform [0, 1) init
        token = self.param("class_token", nn.initializers.uniform(1.0),
                           (1, self.emb_size))
        token = jnp.broadcast_to(token.astype(x.dtype)[None],
                                 (b, 1, self.emb_size))
        x = jnp.concatenate([token, x], axis=1)
        for i in range(self.n_encoders):
            x = ConformerBlock(
                dim=self.emb_size, heads=self.heads,
                dim_head=self.emb_size // self.heads, ff_mult=self.ffmult,
                conv_expansion_factor=self.exp_fac,
                conv_kernel_size=self.kernel_size, dtype=self.dtype,
                name=f"block_{i}")(x, train=train)
        embedding = x[:, 0, :]
        out = nn.Dense(self.num_classes, name="fc5", dtype=self.dtype)(embedding)
        return out, embedding


class ConformerBackend(nn.Module):
    """SSL feats -> BN -> SELU -> MyConformer -> logits
    (ref: conformer_baseline.py:54-64)."""

    emb_size: int = 144
    heads: int = 4
    kernel_size: int = 31
    n_encoders: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, *, train: bool = False):
        x = nn.Dense(self.emb_size, name="LL", dtype=self.dtype)(feats)
        # torch BatchNorm2d(1) over (B,1,T,E): per-single-channel stats ==
        # flax BatchNorm over the trailing dummy channel of (B,T,E,1).
        x = nn.BatchNorm(use_running_average=not train, name="first_bn",
                         dtype=self.dtype, **_BN_KW)(x[..., None])[..., 0]
        x = jax.nn.selu(x)
        out, _ = MyConformer(
            emb_size=self.emb_size, heads=self.heads,
            kernel_size=self.kernel_size, n_encoders=self.n_encoders,
            dtype=self.dtype, name="conformer")(x, train=train)
        return out
