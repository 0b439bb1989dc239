"""Checkpoint converters: PyTorch reference world -> JAX pytrees.

Two entry points:

- :func:`convert_w2v_checkpoint` — fairseq wav2vec2/XLS-R pretraining
  checkpoint (what the reference loads at ``/root/reference/models/fe.py:11-12``)
  -> the ``Wav2Vec2Encoder`` param tree. Handles weight-norm'd ``pos_conv``
  (``weight_g``/``weight_v`` and the newer ``parametrizations`` spelling) and
  stacks the 24 transformer layers along a leading axis for ``lax.scan``.

- :func:`convert_reference_model` — a *trained reference model* state dict
  (``torch.save(model.state_dict())`` of ``XLSR_AASIST`` / ``Model`` etc.,
  ``/root/reference/main.py:157-183``) -> full params for the corresponding
  zoo model. This is the bridge that lets reference users bring their
  checkpoints; combined with deterministic first-N cropping it turns the
  repo's shipped In-the-Wild score files into regression oracles
  (BASELINE.md).

Layout rules (torch -> flax):
  Linear   (O, I)        -> kernel (I, O)
  Conv1d   (O, I/g, K)   -> kernel (K, I/g, O)
  Conv2d   (O, I, Kh, Kw)-> kernel (Kh, Kw, I, O)
  Norm weight/bias       -> scale/bias (+ running stats -> batch_stats)

Input is a mapping name -> numpy array (use :func:`load_torch_state_dict` to
get one from a ``.pt`` file; torch is only needed for that step).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = np.ndarray
StateDict = Mapping[str, Array]


def load_torch_state_dict(path: str) -> Dict[str, Array]:
    """Load a ``.pt`` file to a flat name->numpy dict (CPU, no grad).

    Accepts both raw state dicts and fairseq checkpoint dicts (which nest the
    weights under ``'model'``). ``module.``-prefixes from D(D)P wrapping are
    stripped (reference: ``f_state_dict_wrapper``,
    ``/root/reference/utils.py:13-43``).
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"], dict):
        obj = obj["model"]
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        if not hasattr(v, "numpy"):
            continue
        if k.startswith("module."):
            k = k[len("module."):]
        # .numpy() can alias the live torch buffer (``.to(float32)`` is a
        # no-op on f32 tensors); copy so later in-place updates on the torch
        # side (e.g. train-mode BN running stats) can't mutate the pytree.
        out[k] = v.detach().to(torch.float32).numpy().copy()
    return out


# ---------------------------------------------------------------- primitives

def _lin(sd: StateDict, name: str) -> Dict[str, Array]:
    p = {"kernel": np.ascontiguousarray(sd[f"{name}.weight"].T)}
    if f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"]
    return p


def _conv1d(sd: StateDict, name: str) -> Dict[str, Array]:
    w = sd[f"{name}.weight"]  # (O, I/g, K)
    p = {"kernel": np.ascontiguousarray(np.transpose(w, (2, 1, 0)))}
    if f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"]
    return p


def _conv2d(sd: StateDict, name: str) -> Dict[str, Array]:
    w = sd[f"{name}.weight"]  # (O, I, Kh, Kw)
    p = {"kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))}
    if f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"]
    return p


def _norm(sd: StateDict, name: str) -> Dict[str, Array]:
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _bn_stats(sd: StateDict, name: str) -> Dict[str, Array]:
    return {"mean": sd[f"{name}.running_mean"], "var": sd[f"{name}.running_var"]}


def _pos_conv_weight(sd: StateDict, prefix: str) -> Array:
    """Resolve weight-norm: W = g * v / ||v||_(dims 0,1) (dim=2 kept)."""
    if f"{prefix}.weight" in sd:
        return sd[f"{prefix}.weight"]
    if f"{prefix}.weight_g" in sd:
        g, v = sd[f"{prefix}.weight_g"], sd[f"{prefix}.weight_v"]
    else:  # torch >= 2.1 parametrize spelling
        g = sd[f"{prefix}.parametrizations.weight.original0"]
        v = sd[f"{prefix}.parametrizations.weight.original1"]
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


# ------------------------------------------------------- wav2vec2 conversion

def _stack(layers: Sequence[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack a list of identical pytrees along a new leading axis."""
    out: Dict[str, Any] = {}
    for k in layers[0]:
        if isinstance(layers[0][k], dict):
            out[k] = _stack([l[k] for l in layers])
        else:
            out[k] = np.stack([l[k] for l in layers], axis=0)
    return out


def convert_w2v_checkpoint(sd: StateDict, num_conv_layers: Optional[int] = None,
                           extractor_mode: str = "layer_norm",
                           prefix: str = "") -> Dict[str, Any]:
    """fairseq wav2vec2 state dict -> Wav2Vec2Encoder params (numpy pytree).

    ``num_conv_layers`` defaults to auto-detection from the state dict."""
    P = prefix
    if num_conv_layers is None:
        num_conv_layers = 1 + max(
            int(m.group(1)) for k in sd
            if (m := re.match(re.escape(P) +
                              r"feature_extractor\.conv_layers\.(\d+)\.", k)))
    fe: Dict[str, Any] = {}
    for i in range(num_conv_layers):
        fe[f"conv_{i}"] = _conv1d(sd, f"{P}feature_extractor.conv_layers.{i}.0")
        if extractor_mode == "layer_norm":
            fe[f"ln_{i}"] = _norm(sd, f"{P}feature_extractor.conv_layers.{i}.2.1")
        elif i == 0:
            fe["gn_0"] = _norm(sd, f"{P}feature_extractor.conv_layers.0.2")

    params: Dict[str, Any] = {
        "feature_extractor": fe,
        "layer_norm_pre": _norm(sd, f"{P}layer_norm"),
        "post_extract_proj": _lin(sd, f"{P}post_extract_proj"),
        "pos_conv": {"conv": {
            "kernel": np.ascontiguousarray(np.transpose(
                _pos_conv_weight(sd, f"{P}encoder.pos_conv.0"), (2, 1, 0))),
            "bias": sd[f"{P}encoder.pos_conv.0.bias"],
        }},
        "encoder_layer_norm": _norm(sd, f"{P}encoder.layer_norm"),
    }

    layer_ids = sorted({
        int(m.group(1)) for k in sd
        if (m := re.match(re.escape(P) + r"encoder\.layers\.(\d+)\.", k))})
    layers = []
    for i in layer_ids:
        lp = f"{P}encoder.layers.{i}"
        layers.append({
            "self_attn_layer_norm": _norm(sd, f"{lp}.self_attn_layer_norm"),
            "q_proj": _lin(sd, f"{lp}.self_attn.q_proj"),
            "k_proj": _lin(sd, f"{lp}.self_attn.k_proj"),
            "v_proj": _lin(sd, f"{lp}.self_attn.v_proj"),
            "out_proj": _lin(sd, f"{lp}.self_attn.out_proj"),
            "final_layer_norm": _norm(sd, f"{lp}.final_layer_norm"),
            "fc1": _lin(sd, f"{lp}.fc1"),
            "fc2": _lin(sd, f"{lp}.fc2"),
        })
    params["layers"] = {"layer": _stack(layers)}
    return params


# ------------------------------------------------- trained reference models

def _gat_layer(sd: StateDict, p: str) -> tuple[Dict[str, Any], Dict[str, Any]]:
    params = {
        "att_proj": _lin(sd, f"{p}.att_proj"),
        "att_weight": sd[f"{p}.att_weight"],
        "proj_with_att": _lin(sd, f"{p}.proj_with_att"),
        "proj_without_att": _lin(sd, f"{p}.proj_without_att"),
        "bn": _norm(sd, f"{p}.bn"),
    }
    return params, {"bn": _bn_stats(sd, f"{p}.bn")}


def _htrg_layer(sd: StateDict, p: str) -> tuple[Dict[str, Any], Dict[str, Any]]:
    params = {
        "proj_type1": _lin(sd, f"{p}.proj_type1"),
        "proj_type2": _lin(sd, f"{p}.proj_type2"),
        "att_proj": _lin(sd, f"{p}.att_proj"),
        "att_projM": _lin(sd, f"{p}.att_projM"),
        "att_weight11": sd[f"{p}.att_weight11"],
        "att_weight22": sd[f"{p}.att_weight22"],
        "att_weight12": sd[f"{p}.att_weight12"],
        "att_weightM": sd[f"{p}.att_weightM"],
        "proj_with_att": _lin(sd, f"{p}.proj_with_att"),
        "proj_without_att": _lin(sd, f"{p}.proj_without_att"),
        "proj_with_attM": _lin(sd, f"{p}.proj_with_attM"),
        "proj_without_attM": _lin(sd, f"{p}.proj_without_attM"),
        "bn": _norm(sd, f"{p}.bn"),
    }
    return params, {"bn": _bn_stats(sd, f"{p}.bn")}


def convert_aasist_backend(sd: StateDict, prefix: str = ""
                           ) -> tuple[Dict[str, Any], Dict[str, Any]]:
    """Reference AASIST back-end weights -> AASISTBackend (params, batch_stats).

    Name source: ``XLSR_AASIST.__init__``
    (/root/reference/models/xlsr_aasist.py:28-84).
    """
    P = prefix
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["LL"] = _lin(sd, f"{P}LL")
    params["first_bn"] = _norm(sd, f"{P}first_bn")
    stats["first_bn"] = _bn_stats(sd, f"{P}first_bn")
    params["first_bn1"] = _norm(sd, f"{P}first_bn1")
    stats["first_bn1"] = _bn_stats(sd, f"{P}first_bn1")

    for i in range(6):
        ep = f"{P}encoder.{i}.0"
        blk: Dict[str, Any] = {
            "conv1": _conv2d(sd, f"{ep}.conv1"),
            "bn2": _norm(sd, f"{ep}.bn2"),
            "conv2": _conv2d(sd, f"{ep}.conv2"),
        }
        bs = {"bn2": _bn_stats(sd, f"{ep}.bn2")}
        if f"{ep}.conv_downsample.weight" in sd:
            blk["conv_downsample"] = _conv2d(sd, f"{ep}.conv_downsample")
        # NOTE: the reference's bn1 params exist in its checkpoints but are
        # dead in its forward (aasist_modules.py:374-383); we drop them.
        params[f"encoder_{i}"] = blk
        stats[f"encoder_{i}"] = bs

    params["att_conv1"] = _conv2d(sd, f"{P}attention.0")
    params["att_bn"] = _norm(sd, f"{P}attention.2")
    stats["att_bn"] = _bn_stats(sd, f"{P}attention.2")
    params["att_conv2"] = _conv2d(sd, f"{P}attention.3")

    params["pos_S"] = sd[f"{P}pos_S"]
    params["master1"] = sd[f"{P}master1"]
    params["master2"] = sd[f"{P}master2"]

    for name in ["GAT_layer_S", "GAT_layer_T"]:
        params[name], stats[name] = _gat_layer(sd, f"{P}{name}")
    for name in ["HtrgGAT_layer_ST11", "HtrgGAT_layer_ST12",
                 "HtrgGAT_layer_ST21", "HtrgGAT_layer_ST22"]:
        params[name], stats[name] = _htrg_layer(sd, f"{P}{name}")
    for name in ["pool_S", "pool_T", "pool_hS1", "pool_hT1", "pool_hS2",
                 "pool_hT2"]:
        params[name] = {"proj": _lin(sd, f"{P}{name}.proj")}

    params["out_layer"] = _lin(sd, f"{P}out_layer")
    return params, stats


def convert_conformer_backend(sd: StateDict, n_encoders: int = 4,
                              prefix: str = ""
                              ) -> tuple[Dict[str, Any], Dict[str, Any]]:
    """Reference Conformer head weights -> ConformerBackend (params, stats).

    Name source: ``Model.__init__`` + lucidrains ConformerBlock internals
    (/root/reference/models/conformer_baseline.py:31-64).
    """
    P = prefix
    params: Dict[str, Any] = {"LL": _lin(sd, f"{P}LL"),
                              "first_bn": _norm(sd, f"{P}first_bn")}
    stats: Dict[str, Any] = {"first_bn": _bn_stats(sd, f"{P}first_bn")}

    conf: Dict[str, Any] = {
        "class_token": sd[f"{P}conformer.class_token"],
        "fc5": _lin(sd, f"{P}conformer.fc5"),
    }
    conf_stats: Dict[str, Any] = {}
    for i in range(n_encoders):
        bp = f"{P}conformer.encoder_blocks.{i}"
        blk = {
            # Scale(0.5, PreNorm(FF)): .fn.norm = LN, .fn.fn.net.{0,3} = Linears
            "ff1_norm": _norm(sd, f"{bp}.ff1.fn.norm"),
            "ff1": {"fc1": _lin(sd, f"{bp}.ff1.fn.fn.net.0"),
                    "fc2": _lin(sd, f"{bp}.ff1.fn.fn.net.3")},
            "attn_norm": _norm(sd, f"{bp}.attn.norm"),
            "attn": {
                "to_q": _lin(sd, f"{bp}.attn.fn.to_q"),
                "to_kv": _lin(sd, f"{bp}.attn.fn.to_kv"),
                "to_out": _lin(sd, f"{bp}.attn.fn.to_out"),
                "rel_pos_emb": {"embedding": sd[f"{bp}.attn.fn.rel_pos_emb.weight"]},
            },
            # ConformerConvModule net indices: 0 LN, 2 pw1, 4.conv dw, 5 BN, 7 pw2
            "conv": {
                "ln": _norm(sd, f"{bp}.conv.net.0"),
                "pw1": _conv1x1_as_dense(sd, f"{bp}.conv.net.2"),
                "dw": _conv1d(sd, f"{bp}.conv.net.4.conv"),
                "bn": _norm(sd, f"{bp}.conv.net.5"),
                "pw2": _conv1x1_as_dense(sd, f"{bp}.conv.net.7"),
            },
            "ff2_norm": _norm(sd, f"{bp}.ff2.fn.norm"),
            "ff2": {"fc1": _lin(sd, f"{bp}.ff2.fn.fn.net.0"),
                    "fc2": _lin(sd, f"{bp}.ff2.fn.fn.net.3")},
            "post_norm": _norm(sd, f"{bp}.post_norm"),
        }
        conf[f"block_{i}"] = blk
        conf_stats[f"block_{i}"] = {"conv": {"bn": _bn_stats(sd, f"{bp}.conv.net.5")}}
    params["conformer"] = conf
    stats["conformer"] = conf_stats
    return params, stats


def _conv1x1_as_dense(sd: StateDict, name: str) -> Dict[str, Array]:
    """torch Conv1d with kernel 1 (O, I, 1) -> flax Dense kernel (I, O)."""
    w = sd[f"{name}.weight"][:, :, 0]
    p = {"kernel": np.ascontiguousarray(w.T)}
    if f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"]
    return p


def convert_reference_model(sd: StateDict, model_name: str,
                            n_encoders: int = 4) -> Dict[str, Any]:
    """Full trained reference model -> {'params': ..., 'batch_stats': ...}.

    ``model_name``: XLSR_AASIST / My_XLSR_AASIST / Model / ConformerModel /
    MyModel (reference registry names, /root/reference/main.py:76-84).
    """
    ssl = convert_w2v_checkpoint(sd, prefix="ssl_model.model.")
    if "AASIST" in model_name:
        be_params, be_stats = convert_aasist_backend(sd)
    else:
        be_params, be_stats = convert_conformer_backend(sd, n_encoders)
    return {
        "params": {"ssl_model": ssl, "backend": be_params},
        "batch_stats": {"backend": be_stats},
    }


def to_mixed_remat(ssl_params: Dict[str, Any], m: int) -> Dict[str, Any]:
    """Map a standard scan-stacked SSL tree into the partial-remat layout.

    ``Wav2Vec2Config.remat_save_every = m`` chunks the encoder stack: the
    standard layout stacks every transformer layer under
    ``layers/layer`` with leading axis L; the mixed layout holds the
    saved (non-remat) chunk heads under ``layers/layer_save`` (axis
    L/m) and the remat'd rest under ``layers/layers_r/layer`` (axes
    (L/m, m-1)). Chunk j covers layers [j*m, (j+1)*m): its head is layer
    j*m, so ``layer_save = leaf[0::m]`` and
    ``layers_r = leaf.reshape(L/m, m, ...)[:, 1:]``. Pure layout — the
    math is identical (pinned by
    tests/test_models.py::test_mixed_remat_matches_uniform).
    """
    out = dict(ssl_params)
    layers = ssl_params["layers"]["layer"]

    def split(leaf):
        L = leaf.shape[0]
        if L % m:
            raise ValueError(f"stacked depth {L} not divisible by m={m}")
        chunked = leaf.reshape((L // m, m) + leaf.shape[1:])
        return chunked[:, 0], chunked[:, 1:]

    saves = jax.tree_util.tree_map(lambda a: split(a)[0], layers)
    rest = jax.tree_util.tree_map(lambda a: split(a)[1], layers)
    out["layers"] = {"layer_save": saves, "layers_r": {"layer": rest}}
    return out


def from_mixed_remat(ssl_params: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse of :func:`to_mixed_remat`: interleave the chunk heads and
    remat'd layers back into the standard (L, ...) stacked layout (for
    saving checkpoints in the interchange format)."""
    out = dict(ssl_params)
    saves = ssl_params["layers"]["layer_save"]
    rest = ssl_params["layers"]["layers_r"]["layer"]

    def join(s, r):
        merged = jnp.concatenate([s[:, None], r], axis=1)
        return merged.reshape((-1,) + merged.shape[2:])

    out["layers"] = {"layer": jax.tree_util.tree_map(join, saves, rest)}
    return out
