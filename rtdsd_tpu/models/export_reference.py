"""Export framework weights as a reference-named torch state dict.

The inverse of :mod:`rtdsd_tpu.models.convert_fairseq`: produces a flat
``name -> numpy`` dict using the reference's module names
(``ssl_model.model.*`` fairseq names + ``XLSR_AASIST``/``Model`` back-end
names), so models trained here can be loaded by the PyTorch reference (and
the conversion path gets a lossless roundtrip test).

Layout rules are the exact inverses:
  Dense kernel (I, O)          -> Linear weight (O, I)
  Conv kernel (K, I/g, O)      -> Conv1d weight (O, I/g, K)
  Conv kernel (Kh, Kw, I, O)   -> Conv2d weight (O, I, Kh, Kw)
  scale/bias (+ batch stats)   -> weight/bias (+ running_mean/var)

The reference's dead ``bn1`` params in Residual_blocks
(aasist_modules.py:374-383) are emitted as identity BN so ``strict=True``
torch loads succeed.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _t(x):
    return np.ascontiguousarray(np.asarray(x, np.float32))


def _lin(out: Dict, name: str, p: Dict):
    out[f"{name}.weight"] = _t(p["kernel"]).T.copy()
    if "bias" in p:
        out[f"{name}.bias"] = _t(p["bias"])


def _conv1d(out: Dict, name: str, p: Dict):
    out[f"{name}.weight"] = np.transpose(_t(p["kernel"]), (2, 1, 0)).copy()
    if "bias" in p:
        out[f"{name}.bias"] = _t(p["bias"])


def _conv2d(out: Dict, name: str, p: Dict):
    out[f"{name}.weight"] = np.transpose(_t(p["kernel"]), (3, 2, 0, 1)).copy()
    if "bias" in p:
        out[f"{name}.bias"] = _t(p["bias"])


def _norm(out: Dict, name: str, p: Dict, stats: Dict | None = None):
    out[f"{name}.weight"] = _t(p["scale"])
    out[f"{name}.bias"] = _t(p["bias"])
    if stats is not None:
        out[f"{name}.running_mean"] = _t(stats["mean"])
        out[f"{name}.running_var"] = _t(stats["var"])
        out[f"{name}.num_batches_tracked"] = np.asarray(0, np.int64)


def export_w2v(params: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    """Wav2Vec2Encoder params -> fairseq-named state dict (features path)."""
    P = prefix
    out: Dict[str, np.ndarray] = {}
    fe = params["feature_extractor"]
    n_conv = len([k for k in fe if k.startswith("conv_")])
    for i in range(n_conv):
        _conv1d(out, f"{P}feature_extractor.conv_layers.{i}.0", fe[f"conv_{i}"])
        if f"ln_{i}" in fe:
            _norm(out, f"{P}feature_extractor.conv_layers.{i}.2.1",
                  fe[f"ln_{i}"])
    _norm(out, f"{P}layer_norm", params["layer_norm_pre"])
    _lin(out, f"{P}post_extract_proj", params["post_extract_proj"])

    # pos conv: re-split the plain kernel into weight_g / weight_v
    k = np.transpose(_t(params["pos_conv"]["conv"]["kernel"]), (2, 1, 0))
    g = np.sqrt((k ** 2).sum(axis=(0, 1), keepdims=True))
    out[f"{P}encoder.pos_conv.0.weight_g"] = g
    out[f"{P}encoder.pos_conv.0.weight_v"] = k.copy()
    out[f"{P}encoder.pos_conv.0.bias"] = _t(params["pos_conv"]["conv"]["bias"])
    _norm(out, f"{P}encoder.layer_norm", params["encoder_layer_norm"])

    stacked = params["layers"]["layer"]
    n_layers = int(np.asarray(stacked["fc1"]["kernel"]).shape[0])
    names = [("self_attn_layer_norm", "norm"), ("q_proj", "lin"),
             ("k_proj", "lin"), ("v_proj", "lin"), ("out_proj", "lin"),
             ("final_layer_norm", "norm"), ("fc1", "lin"), ("fc2", "lin")]
    torch_name = {"q_proj": "self_attn.q_proj", "k_proj": "self_attn.k_proj",
                  "v_proj": "self_attn.v_proj",
                  "out_proj": "self_attn.out_proj"}
    for i in range(n_layers):
        lp = f"{P}encoder.layers.{i}"
        for nm, kind in names:
            sub = {kk: np.asarray(vv)[i] for kk, vv in stacked[nm].items()}
            tn = f"{lp}.{torch_name.get(nm, nm)}"
            if kind == "lin":
                _lin(out, tn, sub)
            else:
                _norm(out, tn, sub)
    return out


def _identity_bn(out: Dict, name: str, n: int):
    out[f"{name}.weight"] = np.ones(n, np.float32)
    out[f"{name}.bias"] = np.zeros(n, np.float32)
    out[f"{name}.running_mean"] = np.zeros(n, np.float32)
    out[f"{name}.running_var"] = np.ones(n, np.float32)
    out[f"{name}.num_batches_tracked"] = np.asarray(0, np.int64)


def export_aasist_backend(params: Dict, stats: Dict) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    _lin(out, "LL", params["LL"])
    _norm(out, "first_bn", params["first_bn"], stats["first_bn"])
    _norm(out, "first_bn1", params["first_bn1"], stats["first_bn1"])
    for i in range(6):
        blk, bs = params[f"encoder_{i}"], stats[f"encoder_{i}"]
        base = f"encoder.{i}.0"
        _conv2d(out, f"{base}.conv1", blk["conv1"])
        _norm(out, f"{base}.bn2", blk["bn2"], bs["bn2"])
        _conv2d(out, f"{base}.conv2", blk["conv2"])
        if "conv_downsample" in blk:
            _conv2d(out, f"{base}.conv_downsample", blk["conv_downsample"])
        if i > 0:  # dead bn1 for reference strict-load compat
            in_ch = np.asarray(blk["conv1"]["kernel"]).shape[2]
            _identity_bn(out, f"{base}.bn1", in_ch)
    _conv2d(out, "attention.0", params["att_conv1"])
    _norm(out, "attention.2", params["att_bn"], stats["att_bn"])
    _conv2d(out, "attention.3", params["att_conv2"])
    out["pos_S"] = _t(params["pos_S"])
    out["master1"] = _t(params["master1"])
    out["master2"] = _t(params["master2"])
    for name in ["GAT_layer_S", "GAT_layer_T"]:
        p, s = params[name], stats[name]
        _lin(out, f"{name}.att_proj", p["att_proj"])
        out[f"{name}.att_weight"] = _t(p["att_weight"])
        _lin(out, f"{name}.proj_with_att", p["proj_with_att"])
        _lin(out, f"{name}.proj_without_att", p["proj_without_att"])
        _norm(out, f"{name}.bn", p["bn"], s["bn"])
    for name in ["HtrgGAT_layer_ST11", "HtrgGAT_layer_ST12",
                 "HtrgGAT_layer_ST21", "HtrgGAT_layer_ST22"]:
        p, s = params[name], stats[name]
        for ln in ["proj_type1", "proj_type2", "att_proj", "att_projM",
                   "proj_with_att", "proj_without_att", "proj_with_attM",
                   "proj_without_attM"]:
            _lin(out, f"{name}.{ln}", p[ln])
        for w in ["att_weight11", "att_weight22", "att_weight12",
                  "att_weightM"]:
            out[f"{name}.{w}"] = _t(p[w])
        _norm(out, f"{name}.bn", p["bn"], s["bn"])
    for name in ["pool_S", "pool_T", "pool_hS1", "pool_hT1", "pool_hS2",
                 "pool_hT2"]:
        _lin(out, f"{name}.proj", params[name]["proj"])
    _lin(out, "out_layer", params["out_layer"])
    return out


def _dense_as_conv1x1(out: Dict, name: str, p: Dict):
    """flax Dense (I, O) -> torch Conv1d weight (O, I, 1)."""
    out[f"{name}.weight"] = _t(p["kernel"]).T[..., None].copy()
    if "bias" in p:
        out[f"{name}.bias"] = _t(p["bias"])


def export_conformer_backend(params: Dict, stats: Dict
                             ) -> Dict[str, np.ndarray]:
    """ConformerBackend -> reference 'Model' names (lucidrains internals)."""
    out: Dict[str, np.ndarray] = {}
    _lin(out, "LL", params["LL"])
    _norm(out, "first_bn", params["first_bn"], stats["first_bn"])
    conf = params["conformer"]
    cstats = stats["conformer"]
    out["conformer.class_token"] = _t(conf["class_token"])
    _lin(out, "conformer.fc5", conf["fc5"])
    blocks = sorted(k for k in conf if k.startswith("block_"))
    for bname in blocks:
        i = bname.split("_")[1]
        bp = f"conformer.encoder_blocks.{i}"
        blk = conf[bname]
        _norm(out, f"{bp}.ff1.fn.norm", blk["ff1_norm"])
        _lin(out, f"{bp}.ff1.fn.fn.net.0", blk["ff1"]["fc1"])
        _lin(out, f"{bp}.ff1.fn.fn.net.3", blk["ff1"]["fc2"])
        _norm(out, f"{bp}.attn.norm", blk["attn_norm"])
        _lin(out, f"{bp}.attn.fn.to_q", blk["attn"]["to_q"])
        _lin(out, f"{bp}.attn.fn.to_kv", blk["attn"]["to_kv"])
        _lin(out, f"{bp}.attn.fn.to_out", blk["attn"]["to_out"])
        out[f"{bp}.attn.fn.rel_pos_emb.weight"] = _t(
            blk["attn"]["rel_pos_emb"]["embedding"])
        _norm(out, f"{bp}.conv.net.0", blk["conv"]["ln"])
        _dense_as_conv1x1(out, f"{bp}.conv.net.2", blk["conv"]["pw1"])
        _conv1d(out, f"{bp}.conv.net.4.conv", blk["conv"]["dw"])
        _norm(out, f"{bp}.conv.net.5", blk["conv"]["bn"],
              cstats[bname]["conv"]["bn"])
        _dense_as_conv1x1(out, f"{bp}.conv.net.7", blk["conv"]["pw2"])
        _norm(out, f"{bp}.ff2.fn.norm", blk["ff2_norm"])
        _lin(out, f"{bp}.ff2.fn.fn.net.0", blk["ff2"]["fc1"])
        _lin(out, f"{bp}.ff2.fn.fn.net.3", blk["ff2"]["fc2"])
        _norm(out, f"{bp}.post_norm", blk["post_norm"])
    return out


def export_reference_model(variables: Dict[str, Any], model_name: str,
                           source_sd: Dict[str, np.ndarray] | None = None
                           ) -> Dict[str, np.ndarray]:
    """{'params', 'batch_stats'} of a zoo model -> reference state dict.

    The features-only inference path covers every parameter this framework
    trains, but fairseq's full Wav2Vec2Model also carries pretraining-only
    parameters (``mask_emb``, ``quantizer.*``, ``project_q.*``,
    ``final_proj.*``) that a ``strict=True`` torch load of the reference
    expects. Pass ``source_sd`` (e.g. the original fairseq/reference state
    dict the run started from, via ``load_torch_state_dict``) and any key it
    has that the export does not is carried through verbatim — making the
    roundtrip strict-load complete. Without it, load with ``strict=False``
    (only inference-irrelevant keys are missing).
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out = export_w2v(params["ssl_model"], prefix="ssl_model.model.")
    if "AASIST" in model_name:
        out.update(export_aasist_backend(params["backend"],
                                         stats["backend"]))
    else:
        out.update(export_conformer_backend(params["backend"],
                                            stats["backend"]))
    if source_sd:
        for k, v in source_sd.items():
            if k not in out:
                out[k] = np.asarray(v)
    return out
