"""Hugging Face ``transformers`` wav2vec2 checkpoints -> Wav2Vec2Encoder.

The reference framework can only load fairseq's ``xlsr2_300m.pt``
(``/root/reference/models/fe.py:11-12``), a checkpoint most users no longer
have: the same weights are distributed on the HF hub as
``facebook/wav2vec2-xls-r-300m`` in the ``transformers`` layout. This module
accepts that layout — a local snapshot directory (``config.json`` +
``model.safetensors`` / ``pytorch_model.bin``) or an in-memory state dict —
so HF-only users can run the framework without fairseq ever existing in
their environment.

Strategy: HF's ``Wav2Vec2Model`` is a faithful module-for-module port of
fairseq's (same convs, same weight-normed positional conv + SamePad, same
pre/post-LN encoder); only the parameter *names* differ. We rename
HF -> fairseq spelling and reuse :func:`convert_fairseq.convert_w2v_checkpoint`
so there is exactly one set of layout/weight-norm transforms to keep correct.
Numerical parity vs HF's own torch forward (stable-LN/XLS-R mode; the
post-LN *base* family is rejected with a clear error, see
:func:`w2v_config_from_hf`) is pinned in ``tests/test_hf_oracle.py`` — which doubles
as an *independent third-party oracle* for the SSL encoder math (the fairseq
oracle in ``tests/test_w2v_parity.py`` is hand-written; HF's is not ours).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

from rtdsd_tpu.models.wav2vec2 import Wav2Vec2Config

Array = np.ndarray

# HF module path -> fairseq module path (regex, applied in order; first
# match wins). Names on the right are exactly what convert_w2v_checkpoint
# consumes (convert_fairseq.py:127-176).
_RENAMES = [
    # conv feature extractor: Wav2Vec2(LayerNorm|GroupNorm|NoLayerNorm)ConvLayer
    (r"^feature_extractor\.conv_layers\.(\d+)\.conv\.(weight|bias)$",
     r"feature_extractor.conv_layers.\1.0.\2"),
    (r"^feature_extractor\.conv_layers\.0\.layer_norm\.(weight|bias)$:group",
     r"feature_extractor.conv_layers.0.2.\1"),
    (r"^feature_extractor\.conv_layers\.(\d+)\.layer_norm\.(weight|bias)$",
     r"feature_extractor.conv_layers.\1.2.1.\2"),
    # feature projection (HF fuses fairseq's top-level layer_norm +
    # post_extract_proj into one submodule)
    (r"^feature_projection\.layer_norm\.(weight|bias)$", r"layer_norm.\1"),
    (r"^feature_projection\.projection\.(weight|bias)$",
     r"post_extract_proj.\1"),
    # weight-normed positional conv: keep whichever weight-norm spelling the
    # checkpoint uses; convert_w2v_checkpoint resolves both
    (r"^encoder\.pos_conv_embed\.conv\.(bias|weight|weight_g|weight_v)$",
     r"encoder.pos_conv.0.\1"),
    (r"^encoder\.pos_conv_embed\.conv\.parametrizations\.weight"
     r"\.(original0|original1)$",
     r"encoder.pos_conv.0.parametrizations.weight.\1"),
    # transformer layers
    (r"^encoder\.layers\.(\d+)\.attention\.(q|k|v|out)_proj\.(weight|bias)$",
     r"encoder.layers.\1.self_attn.\2_proj.\3"),
    (r"^encoder\.layers\.(\d+)\.layer_norm\.(weight|bias)$",
     r"encoder.layers.\1.self_attn_layer_norm.\2"),
    (r"^encoder\.layers\.(\d+)\.feed_forward\.intermediate_dense"
     r"\.(weight|bias)$", r"encoder.layers.\1.fc1.\2"),
    (r"^encoder\.layers\.(\d+)\.feed_forward\.output_dense\.(weight|bias)$",
     r"encoder.layers.\1.fc2.\2"),
    (r"^encoder\.layers\.(\d+)\.final_layer_norm\.(weight|bias)$",
     r"encoder.layers.\1.final_layer_norm.\2"),
    (r"^encoder\.layer_norm\.(weight|bias)$", r"encoder.layer_norm.\1"),
]

# Pretraining-only / task-head tensors with no inference role: fairseq's
# mask_emb equivalent, the quantizer + contrastive projection heads
# (Wav2Vec2ForPreTraining), adapters, and CTC/classification heads.
_DROP = re.compile(
    r"^(masked_spec_embed|quantizer\.|project_q\.|project_hid\.|adapter\."
    r"|lm_head\.|classifier\.|projector\.)")


def hf_to_fairseq_names(sd: Mapping[str, Array],
                        feat_extract_norm: str = "layer"
                        ) -> Dict[str, Array]:
    """Rename an HF wav2vec2 state dict into fairseq spelling.

    ``feat_extract_norm``: HF config field ("layer" for XLS-R / large-LV60,
    "group" for the base models) — needed because HF names both the
    per-block LayerNorm and the layer-0 GroupNorm ``layer_norm``, while
    fairseq gives them different Sequential indices.

    Unknown keys raise (a silent drop would convert a checkpoint
    incompletely); known pretraining-head keys are skipped.
    """
    out: Dict[str, Array] = {}
    for key, val in sd.items():
        # Wav2Vec2ForPreTraining / ForCTC nest the encoder under `wav2vec2.`
        k = key[len("wav2vec2."):] if key.startswith("wav2vec2.") else key
        if _DROP.match(k):
            continue
        for pat, repl in _RENAMES:
            pat, _, tag = pat.partition(":")
            if tag == "group" and feat_extract_norm != "group":
                continue
            new, n = re.subn(pat, repl, k)
            if n:
                out[new] = np.asarray(val)
                break
        else:
            raise ValueError(f"unrecognized HF wav2vec2 key: {key!r}")
    return out


def w2v_config_from_hf(hf_cfg: Mapping[str, Any], **overrides
                       ) -> Wav2Vec2Config:
    """Build our encoder config from an HF ``config.json`` dict.

    HF `do_stable_layer_norm` == fairseq `layer_norm_first`;
    `feat_extract_norm` "layer"/"group" == extractor_mode
    "layer_norm"/"group_norm".

    Post-LN checkpoints (``do_stable_layer_norm: false`` — the wav2vec2
    *base* family) are rejected: our ``TransformerLayer`` implements the
    pre-LN layer the XLS-R/large family uses (wav2vec2.py:394-396), and a
    silent conversion would run the wrong math. The reference framework
    only ever loads XLS-R (/root/reference/models/fe.py:11-12).
    """
    if not hf_cfg.get("do_stable_layer_norm", False):
        raise ValueError(
            "post-LN wav2vec2 (do_stable_layer_norm=false, the 'base' "
            "family) is not supported — the framework implements the "
            "pre-LN XLS-R/large encoder")
    conv_layers = tuple(zip(hf_cfg["conv_dim"], hf_cfg["conv_kernel"],
                            hf_cfg["conv_stride"]))
    norm = {"layer": "layer_norm", "group": "group_norm"}[
        hf_cfg.get("feat_extract_norm", "layer")]
    kw: Dict[str, Any] = dict(
        conv_layers=conv_layers,
        extractor_mode=norm,
        conv_bias=bool(hf_cfg.get("conv_bias", False)),
        encoder_embed_dim=hf_cfg["hidden_size"],
        encoder_ffn_dim=hf_cfg["intermediate_size"],
        encoder_heads=hf_cfg["num_attention_heads"],
        encoder_layers=hf_cfg["num_hidden_layers"],
        conv_pos=hf_cfg.get("num_conv_pos_embeddings", 128),
        conv_pos_groups=hf_cfg.get("num_conv_pos_embedding_groups", 16),
        layer_norm_first=bool(hf_cfg.get("do_stable_layer_norm", False)),
    )
    kw.update(overrides)
    return Wav2Vec2Config(**kw)


def load_hf_dir(path: str) -> Tuple[Dict[str, Array], Dict[str, Any]]:
    """Load a local HF snapshot dir -> (numpy state dict, config dict).

    Accepts ``model.safetensors`` (preferred; no torch needed) or
    ``pytorch_model.bin``. This is the zero-egress path: users
    ``huggingface-cli download facebook/wav2vec2-xls-r-300m`` elsewhere and
    point the converter at the directory.
    """
    with open(os.path.join(path, "config.json")) as f:
        cfg = json.load(f)
    st_path = os.path.join(path, "model.safetensors")
    pt_path = os.path.join(path, "pytorch_model.bin")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        sd: Dict[str, Array] = dict(load_file(st_path))
    elif os.path.exists(pt_path):
        from rtdsd_tpu.models.convert_fairseq import load_torch_state_dict

        sd = load_torch_state_dict(pt_path)
    else:
        raise FileNotFoundError(
            f"no model.safetensors / pytorch_model.bin under {path}")
    return sd, cfg


def convert_hf_checkpoint(sd: Mapping[str, Array],
                          hf_cfg: Optional[Mapping[str, Any]] = None,
                          ) -> Tuple[Dict[str, Any], Optional[Wav2Vec2Config]]:
    """HF wav2vec2 state dict (+ config dict) -> (encoder params, config).

    The returned params are exactly what ``convert_w2v_checkpoint`` produces
    from the equivalent fairseq checkpoint (scan-stacked layers, resolved
    weight norm); config is None when ``hf_cfg`` wasn't given.
    """
    from rtdsd_tpu.models.convert_fairseq import convert_w2v_checkpoint

    norm = (hf_cfg or {}).get("feat_extract_norm", "layer")
    fs_sd = hf_to_fairseq_names(sd, feat_extract_norm=norm)
    extractor_mode = {"layer": "layer_norm", "group": "group_norm"}[norm]
    params = convert_w2v_checkpoint(fs_sd, extractor_mode=extractor_mode)
    cfg = w2v_config_from_hf(hf_cfg) if hf_cfg is not None else None
    return params, cfg
