"""Full model compositions matching the reference model zoo.

Reference classes -> rebuild:
  ``XLSR_AASIST``      (/root/reference/models/xlsr_aasist.py:5-177)
  ``My_XLSR_AASIST``   (:180-339, layer-pruned front-end)
  ``Model``            (/root/reference/models/conformer_baseline.py:31-64)
  ``MyModel``          (:66-99, layer-pruned front-end)

All four are one parametric flax module each: the "My_" variants are the same
graph with a smaller ``encoder_layers`` in the front-end config — layer
selection happens on the *stacked* front-end params
(:func:`rtdsd_tpu.models.wav2vec2.select_layers`), not by rebuilding modules.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from rtdsd_tpu.models.aasist import AASISTBackend
from rtdsd_tpu.models.conformer import ConformerBackend
from rtdsd_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder

Dtype = Any


def _squeeze_wave(wave: jax.Array) -> jax.Array:
    # ref fe.py:18 — accepts (B, T) or (B, T, 1)
    return wave[..., 0] if wave.ndim == 3 else wave


class XLSR_AASIST(nn.Module):
    """XLSR front-end + AASIST graph back-end -> logits (B, 2)."""

    w2v_cfg: Wav2Vec2Config = Wav2Vec2Config()
    fix_out_s1_bug: bool = False
    fused_gat: bool = False
    dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, wave: jax.Array, *, train: bool = False,
                 conv_feats: jax.Array = None) -> jax.Array:
        feats = Wav2Vec2Encoder(self.w2v_cfg, self.dtype, self.remat,
                                name="ssl_model")(
            None if wave is None else _squeeze_wave(wave), train=train,
            conv_feats=conv_feats)
        return AASISTBackend(fix_out_s1_bug=self.fix_out_s1_bug,
                             fused_gat=self.fused_gat,
                             dtype=self.dtype, name="backend")(
            feats, train=train)


class XLSR_Conformer(nn.Module):
    """XLSR front-end + Conformer head -> logits (B, 2).

    (The reference calls this class ``Model`` / ``ConformerModel``.)
    """

    w2v_cfg: Wav2Vec2Config = Wav2Vec2Config()
    emb_size: int = 144
    heads: int = 4
    kernel_size: int = 31
    n_encoders: int = 4
    dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, wave: jax.Array, *, train: bool = False,
                 conv_feats: jax.Array = None) -> jax.Array:
        feats = Wav2Vec2Encoder(self.w2v_cfg, self.dtype, self.remat,
                                name="ssl_model")(
            None if wave is None else _squeeze_wave(wave), train=train,
            conv_feats=conv_feats)
        return ConformerBackend(
            emb_size=self.emb_size, heads=self.heads,
            kernel_size=self.kernel_size, n_encoders=self.n_encoders,
            dtype=self.dtype, name="backend")(feats, train=train)


def make_w2v_cfg(num_layers: int = 24, dtype_kwargs: dict | None = None,
                 **overrides) -> Wav2Vec2Config:
    cfg = Wav2Vec2Config()
    fields = {f.name for f in dataclasses.fields(Wav2Vec2Config)}
    cfg = dataclasses.replace(
        cfg, encoder_layers=num_layers,
        **{k: v for k, v in (overrides or {}).items() if k in fields})
    return cfg
