"""AASIST spectro-temporal graph-attention back-end, TPU-first (flax/NHWC).

Re-implements the *behavior* of the reference's AASIST modules
(``/root/reference/models/aasist_modules.py`` — GraphAttentionLayer :17-110,
HtrgGraphAttentionLayer :112-294, GraphPool :296-338, Residual_block :340-397)
and the ``XLSR_AASIST`` composition (``/root/reference/models/xlsr_aasist.py:5-177``),
with TPU-idiomatic choices:

- NHWC layout everywhere (XLA:TPU's native conv layout); the reference's
  NCHW transposes disappear.
- Node counts are static, so graph top-k pooling lowers to ``lax.top_k`` +
  ``take_along_axis`` with compile-time k.
- The pairwise node-attention is expressed as one batched einsum chain that
  XLA fuses; node graphs are tiny (<=66 nodes) so the FLOPs live in the
  front-end, not here.

Reference quirks reproduced for checkpoint parity (each behind a flag):

- ``out_S1 = out_S1 + 1`` instead of ``+ out_S_aug``
  (``/root/reference/models/xlsr_aasist.py:138``) — shipped checkpoints were
  trained with this; set ``fix_out_s1_bug=True`` for the corrected graph.
- ``Residual_block.forward`` computes ``bn1+selu`` into ``out`` and then
  discards it, applying ``conv1`` to the raw input
  (``/root/reference/models/aasist_modules.py:374-383``). We reproduce the
  *semantics* (conv1 on raw input) without instantiating the dead bn1, so no
  dead compute and no phantom running stats.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# torch BatchNorm defaults: momentum=0.1 (new = 0.9*old + 0.1*batch) == flax
# momentum 0.9; eps 1e-5.
_BN_KW = dict(momentum=0.9, epsilon=1e-5)


def _dense(features: int, name: str, dtype: Dtype):
    return nn.Dense(features, name=name, dtype=dtype)


class _DenseParams(nn.Module):
    """Declares Dense-compatible params (kernel/bias) without applying them —
    same param-tree path as ``nn.Dense`` so checkpoints are interchangeable;
    lets the fused Pallas path consume the raw weights."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (in_features, self.features))
        b = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return k, b


class GraphAttentionLayer(nn.Module):
    """Pairwise-multiplicative node attention (ref: aasist_modules.py:17-110).

    ``fused=True`` routes the eval-mode attention+aggregation through the
    Pallas kernel (:mod:`rtdsd_tpu.ops.pallas.gat`), which keeps the
    O(N^2 D) pairwise intermediates in VMEM.
    """

    out_dim: int
    temperature: float = 1.0
    dtype: Dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        # x: (B, N, D)
        x = nn.Dropout(0.2, deterministic=not train)(x)

        att_k, att_b = _DenseParams(self.out_dim, name="att_proj")(x.shape[-1])
        att_w = self.param("att_weight", nn.initializers.xavier_normal(),
                           (self.out_dim, 1))

        if self.fused and not train:
            from rtdsd_tpu.ops.pallas.gat import fused_gat_aggregate

            agg = fused_gat_aggregate(x, att_k, att_b, att_w,
                                      self.temperature).astype(x.dtype)
        else:
            # pairwise mul -> tanh(proj) -> scalar per edge
            att = x[:, :, None, :] * x[:, None, :, :]          # (B, N, N, D)
            att = jnp.tanh(att @ att_k.astype(att.dtype)
                           + att_b.astype(att.dtype))
            att = jnp.einsum("bijd,do->bijo", att, att_w.astype(att.dtype))
            att = att / self.temperature
            # softmax over the j (aggregation) axis — torch dim=-2 of (B,i,j,1)
            att = jax.nn.softmax(att, axis=-2)
            agg = jnp.einsum("bij,bjd->bid", att[..., 0], x)

        x1 = _dense(self.out_dim, "proj_with_att", self.dtype)(agg)
        x2 = _dense(self.out_dim, "proj_without_att", self.dtype)(x)
        x = x1 + x2

        # torch reshapes (B,N,D)->(B*N,D) for BatchNorm1d; flax BatchNorm
        # reduces over all non-feature axes, which is identical.
        x = nn.BatchNorm(use_running_average=not train, name="bn",
                         dtype=self.dtype, **_BN_KW)(x)
        return jax.nn.selu(x)


class HtrgGraphAttentionLayer(nn.Module):
    """Heterogeneous S/T graph attention with master node
    (ref: aasist_modules.py:112-294).

    ``fused=True`` routes the eval-mode typed-edge attention+aggregation
    through the Pallas kernel (:mod:`rtdsd_tpu.ops.pallas.gat`)."""

    in_dim: int
    out_dim: int
    temperature: float = 1.0
    dtype: Dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x1: jax.Array, x2: jax.Array,
                 master: Optional[jax.Array] = None, *, train: bool
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        n1, n2 = x1.shape[1], x2.shape[1]
        x1 = _dense(self.in_dim, "proj_type1", self.dtype)(x1)
        x2 = _dense(self.in_dim, "proj_type2", self.dtype)(x2)
        x = jnp.concatenate([x1, x2], axis=1)                  # (B, N1+N2, D)

        if master is None:
            master = jnp.mean(x, axis=1, keepdims=True)

        x = nn.Dropout(0.2, deterministic=not train)(x)

        att_k, att_b = _DenseParams(self.out_dim, name="att_proj")(
            x.shape[-1])
        w11 = self._edge_weight("att_weight11")
        w22 = self._edge_weight("att_weight22")
        w12 = self._edge_weight("att_weight12")

        if self.fused and not train:
            from rtdsd_tpu.ops.pallas.gat import fused_htrg_gat_aggregate

            agg = fused_htrg_gat_aggregate(
                x, att_k, att_b, w11, w22, w12, n1,
                self.temperature).astype(x.dtype)
        else:
            att_map = self._derive_att_map(x, att_k, att_b, w11, w22, w12,
                                           n1)
            agg = jnp.einsum("bij,bjd->bid", att_map[..., 0], x)

        master = self._update_master(x, master)
        x = self._project(x, agg)
        x = nn.BatchNorm(use_running_average=not train, name="bn",
                         dtype=self.dtype, **_BN_KW)(x)
        x = jax.nn.selu(x)
        return x[:, :n1], x[:, n1:], master

    def _edge_weight(self, name: str):
        return self.param(name, nn.initializers.xavier_normal(),
                          (self.out_dim, 1))

    def _derive_att_map(self, x, att_k, att_b, w11, w22, w12, n1):
        att = x[:, :, None, :] * x[:, None, :, :]              # (B, N, N, D)
        att = jnp.tanh(att @ att_k.astype(att.dtype)
                       + att_b.astype(att.dtype))

        w11 = w11.astype(att.dtype)
        w22 = w22.astype(att.dtype)
        w12 = w12.astype(att.dtype)
        # Typed-edge scalar scores assembled by block concat (the reference
        # writes into a zeros att_board in place, aasist_modules.py:249-258 —
        # functionally identical, but concat is jit-friendly).
        b11 = att[:, :n1, :n1] @ w11
        b12 = att[:, :n1, n1:] @ w12
        b21 = att[:, n1:, :n1] @ w12
        b22 = att[:, n1:, n1:] @ w22
        top = jnp.concatenate([b11, b12], axis=2)
        bot = jnp.concatenate([b21, b22], axis=2)
        att = jnp.concatenate([top, bot], axis=1)              # (B, N, N, 1)

        att = att / self.temperature
        return jax.nn.softmax(att, axis=-2)

    def _update_master(self, x, master):
        att = x * master                                        # (B, N, D)
        att = jnp.tanh(_dense(self.out_dim, "att_projM", self.dtype)(att))
        wM = self._edge_weight("att_weightM").astype(att.dtype)
        att = (att @ wM) / self.temperature                     # (B, N, 1)
        att = jax.nn.softmax(att, axis=-2)
        x1 = _dense(self.out_dim, "proj_with_attM", self.dtype)(
            jnp.einsum("bn,bnd->bd", att[..., 0], x)[:, None, :])
        x2 = _dense(self.out_dim, "proj_without_attM", self.dtype)(master)
        return x1 + x2

    def _project(self, x, agg):
        x1 = _dense(self.out_dim, "proj_with_att", self.dtype)(agg)
        x2 = _dense(self.out_dim, "proj_without_att", self.dtype)(x)
        return x1 + x2


class GraphPool(nn.Module):
    """Sigmoid-scored top-k node pooling (ref: aasist_modules.py:296-338).

    k is static (node counts are compile-time constants), so this lowers to
    ``lax.top_k`` + ``take_along_axis`` — no dynamic shapes.
    """

    k: float
    p: float = 0.3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jax.Array, *, train: bool) -> jax.Array:
        z = nn.Dropout(self.p, deterministic=not train)(h)
        scores = jax.nn.sigmoid(_dense(1, "proj", self.dtype)(z))  # (B, N, 1)
        n_keep = max(int(h.shape[1] * self.k), 1)
        # top_k sorts descending, like torch.topk(sorted=True): kept nodes are
        # ordered by score, matching the reference's gather semantics.
        _, idx = jax.lax.top_k(scores[..., 0], n_keep)          # (B, k)
        h = h * scores
        return jnp.take_along_axis(h, idx[..., None], axis=1)


class ResidualBlock(nn.Module):
    """RawNet2-style 2D conv residual pair (ref: aasist_modules.py:340-397)."""

    in_ch: int
    out_ch: int
    first: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        # x: (B, H, W, C) — NHWC
        identity = x
        # Reference quirk: bn1+selu output is discarded; conv1 consumes the
        # raw input (aasist_modules.py:374-383). Reproduced without the dead
        # bn1 compute.
        out = nn.Conv(self.out_ch, (2, 3), padding=((1, 1), (1, 1)),
                      name="conv1", dtype=self.dtype)(x)
        out = nn.BatchNorm(use_running_average=not train, name="bn2",
                           dtype=self.dtype, **_BN_KW)(out)
        out = jax.nn.selu(out)
        out = nn.Conv(self.out_ch, (2, 3), padding=((0, 0), (1, 1)),
                      name="conv2", dtype=self.dtype)(out)
        if self.in_ch != self.out_ch:
            identity = nn.Conv(self.out_ch, (1, 3), padding=((0, 0), (1, 1)),
                               name="conv_downsample", dtype=self.dtype)(identity)
        return out + identity


class AASISTBackend(nn.Module):
    """Everything downstream of SSL features: (B, frames, feat_dim) -> (B, 2).

    Composition mirrors ``XLSR_AASIST.forward``
    (``/root/reference/models/xlsr_aasist.py:86-177``) in NHWC.
    """

    filts: Sequence = (128, (1, 32), (32, 32), (32, 64), (64, 64))
    gat_dims: Tuple[int, int] = (64, 32)
    pool_ratios: Tuple[float, float, float, float] = (0.5, 0.5, 0.5, 0.5)
    temperatures: Tuple[float, float, float, float] = (2.0, 2.0, 100.0, 100.0)
    num_classes: int = 2
    fix_out_s1_bug: bool = False
    fused_gat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: jax.Array, *, train: bool = False) -> jax.Array:
        g0, g1 = self.gat_dims
        ch = self.filts[-1][-1]

        x = _dense(self.filts[0], "LL", self.dtype)(feats)      # (B, T, 128)
        # torch: (B,T,128) -> (B,1,128,T) NCHW; here NHWC (B, H=128, W=T, C=1)
        x = jnp.transpose(x, (0, 2, 1))[..., None]
        x = nn.max_pool(x, (3, 3), strides=(3, 3))              # (B, 42, T//3, 1)
        x = nn.BatchNorm(use_running_average=not train, name="first_bn",
                         dtype=self.dtype, **_BN_KW)(x)
        x = jax.nn.selu(x)

        specs = list(self.filts[1:])
        specs += [specs[-1]] * (6 - len(specs))                 # 6 blocks total
        for i, (cin, cout) in enumerate(specs):
            cin = x.shape[-1]
            x = ResidualBlock(cin, cout, first=(i == 0), dtype=self.dtype,
                              name=f"encoder_{i}")(x, train=train)
        x = nn.BatchNorm(use_running_average=not train, name="first_bn1",
                         dtype=self.dtype, **_BN_KW)(x)
        x = jax.nn.selu(x)                                       # (B, 42, W, 64)

        # attention over the feature map (1x1 convs)
        w = nn.Conv(128, (1, 1), name="att_conv1", dtype=self.dtype)(x)
        w = jax.nn.selu(w)
        w = nn.BatchNorm(use_running_average=not train, name="att_bn",
                         dtype=self.dtype, **_BN_KW)(w)
        w = nn.Conv(ch, (1, 1), name="att_conv2", dtype=self.dtype)(w)

        # spectral branch: softmax over time (W axis) -> 42 nodes
        w1 = jax.nn.softmax(w, axis=2)
        e_s = jnp.sum(x * w1, axis=2)                            # (B, 42, 64)
        pos_s = self.param("pos_S", nn.initializers.normal(1.0),
                           (1, e_s.shape[1], ch))
        e_s = e_s + pos_s.astype(e_s.dtype)
        gat_s = GraphAttentionLayer(g0, self.temperatures[0], self.dtype,
                                    self.fused_gat,
                                    name="GAT_layer_S")(e_s, train=train)
        out_s = GraphPool(self.pool_ratios[0], 0.3, self.dtype,
                          name="pool_S")(gat_s, train=train)     # (B, 21, 64)

        # temporal branch: softmax over freq (H axis) -> W nodes
        w2 = jax.nn.softmax(w, axis=1)
        e_t = jnp.sum(x * w2, axis=1)                            # (B, W, 64)
        gat_t = GraphAttentionLayer(g0, self.temperatures[1], self.dtype,
                                    self.fused_gat,
                                    name="GAT_layer_T")(e_t, train=train)
        out_t = GraphPool(self.pool_ratios[1], 0.3, self.dtype,
                          name="pool_T")(gat_t, train=train)     # (B, W/2, 64)

        master1 = self.param("master1", nn.initializers.normal(1.0), (1, 1, g0))
        master2 = self.param("master2", nn.initializers.normal(1.0), (1, 1, g0))
        master1 = master1.astype(out_t.dtype)
        master2 = master2.astype(out_t.dtype)

        hs_gal = lambda i, o, name: HtrgGraphAttentionLayer(
            i, o, self.temperatures[2], self.dtype, self.fused_gat,
            name=name)

        # ---- inference branch 1 (xlsr_aasist.py:129-139) ----
        out_t1, out_s1, m1 = hs_gal(g0, g1, "HtrgGAT_layer_ST11")(
            out_t, out_s, master1, train=train)
        out_s1 = GraphPool(self.pool_ratios[2], 0.3, self.dtype,
                           name="pool_hS1")(out_s1, train=train)
        out_t1 = GraphPool(self.pool_ratios[2], 0.3, self.dtype,
                           name="pool_hT1")(out_t1, train=train)
        out_t_aug, out_s_aug, m_aug = hs_gal(g1, g1, "HtrgGAT_layer_ST12")(
            out_t1, out_s1, m1, train=train)
        out_t1 = out_t1 + out_t_aug
        if self.fix_out_s1_bug:
            out_s1 = out_s1 + out_s_aug
        else:
            # Checkpoint-parity quirk: reference adds the literal 1
            # (xlsr_aasist.py:138) instead of out_S_aug.
            out_s1 = out_s1 + 1
        m1 = m1 + m_aug

        # ---- inference branch 2 (xlsr_aasist.py:141-151) ----
        out_t2, out_s2, m2 = hs_gal(g0, g1, "HtrgGAT_layer_ST21")(
            out_t, out_s, master2, train=train)
        # reference builds pool_hS2/pool_hT2 with pool_ratios[2] — index 3
        # is unused there (xlsr_aasist.py:81-82)
        out_s2 = GraphPool(self.pool_ratios[2], 0.3, self.dtype,
                           name="pool_hS2")(out_s2, train=train)
        out_t2 = GraphPool(self.pool_ratios[2], 0.3, self.dtype,
                           name="pool_hT2")(out_t2, train=train)
        out_t_aug, out_s_aug, m_aug = hs_gal(g1, g1, "HtrgGAT_layer_ST22")(
            out_t2, out_s2, m2, train=train)
        out_t2 = out_t2 + out_t_aug
        out_s2 = out_s2 + out_s_aug
        m2 = m2 + m_aug

        drop_way = nn.Dropout(0.2, deterministic=not train)
        out_t1 = drop_way(out_t1)
        out_t2 = drop_way(out_t2)
        out_s1 = drop_way(out_s1)
        out_s2 = drop_way(out_s2)
        m1 = drop_way(m1)
        m2 = drop_way(m2)

        out_t = jnp.maximum(out_t1, out_t2)
        out_s = jnp.maximum(out_s1, out_s2)
        master = jnp.maximum(m1, m2)

        t_max = jnp.max(jnp.abs(out_t), axis=1)
        t_avg = jnp.mean(out_t, axis=1)
        s_max = jnp.max(jnp.abs(out_s), axis=1)
        s_avg = jnp.mean(out_s, axis=1)

        last_hidden = jnp.concatenate(
            [t_max, t_avg, s_max, s_avg, master[:, 0, :]], axis=1)  # (B, 160)
        last_hidden = nn.Dropout(0.5, deterministic=not train)(last_hidden)
        return _dense(self.num_classes, "out_layer", self.dtype)(last_hidden)
