"""Checkpoint-conversion tests: torch-op oracles vs converted flax modules.

These tests verify the layout transforms (Linear/Conv1d/Conv2d/Norm) and the
attention math by building small *torch* references (torch is the oracle — we
never import reference code) and comparing outputs after conversion.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import linen as nn  # noqa: E402

from rtdsd_tpu.models.convert_fairseq import (  # noqa: E402
    _conv1d, _conv2d, _lin, _norm, _bn_stats, _pos_conv_weight,
    convert_w2v_checkpoint)
from rtdsd_tpu.models.wav2vec2 import (TransformerLayer, Wav2Vec2Config,  # noqa: E402
                                       Wav2Vec2Encoder)


def _sd(module, prefix=""):
    return {f"{prefix}{k}": v.detach().numpy()
            for k, v in module.state_dict().items()}


def test_linear_conversion():
    torch.manual_seed(0)
    lin = torch.nn.Linear(6, 4)
    x = torch.randn(3, 6)
    want = lin(x).detach().numpy()

    p = _lin(_sd(lin, "m."), "m")
    p = {"kernel": p["kernel"], "bias": p["bias"]}
    got = nn.Dense(4).apply({"params": p}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_conv1d_strided_conversion():
    torch.manual_seed(0)
    conv = torch.nn.Conv1d(3, 8, kernel_size=5, stride=2)
    x = torch.randn(2, 3, 40)
    want = conv(x).detach().numpy()  # (2, 8, 18)

    p = _conv1d(_sd(conv, "m."), "m")
    got = nn.Conv(8, (5,), strides=(2,), padding="VALID").apply(
        {"params": p}, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               rtol=1e-4, atol=1e-5)


def test_grouped_conv1d_conversion():
    torch.manual_seed(0)
    conv = torch.nn.Conv1d(8, 8, kernel_size=4, padding=2, groups=4)
    x = torch.randn(2, 8, 16)
    want = conv(x).detach().numpy()

    p = _conv1d(_sd(conv, "m."), "m")
    got = nn.Conv(8, (4,), padding=((2, 2),), feature_group_count=4).apply(
        {"params": p}, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               rtol=1e-4, atol=1e-5)


def test_conv2d_asymmetric_padding_conversion():
    torch.manual_seed(0)
    conv = torch.nn.Conv2d(3, 5, kernel_size=(2, 3), padding=(1, 1))
    x = torch.randn(2, 3, 10, 12)
    want = conv(x).detach().numpy()

    p = _conv2d(_sd(conv, "m."), "m")
    got = nn.Conv(5, (2, 3), padding=((1, 1), (1, 1))).apply(
        {"params": p}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-5)


def test_batchnorm_eval_conversion():
    torch.manual_seed(0)
    bn = torch.nn.BatchNorm1d(6)
    bn.train()
    for _ in range(3):  # give it non-trivial running stats
        bn(torch.randn(32, 6) * 2 + 1)
    bn.eval()
    x = torch.randn(8, 6)
    want = bn(x).detach().numpy()

    sd = _sd(bn, "m.")
    variables = {"params": _norm(sd, "m"), "batch_stats": _bn_stats(sd, "m")}
    got = nn.BatchNorm(use_running_average=True, momentum=0.9,
                       epsilon=1e-5).apply(variables, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_weight_norm_resolution():
    torch.manual_seed(0)
    conv = torch.nn.Conv1d(8, 8, kernel_size=4, groups=2)
    wn = torch.nn.utils.weight_norm(conv, name="weight", dim=2)
    x = torch.randn(1, 8, 16)
    want = wn(x).detach().numpy()

    sd = _sd(wn, "m.")
    w = _pos_conv_weight(sd, "m")  # (O, I/g, K)
    got = nn.Conv(8, (4,), padding="VALID", feature_group_count=2).apply(
        {"params": {"kernel": np.transpose(w, (2, 1, 0)),
                    "bias": sd["m.bias"]}},
        jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               rtol=1e-4, atol=1e-5)


def test_transformer_layer_vs_torch_mha():
    """Pre-LN layer with torch.nn.MultiheadAttention as the attention oracle
    (same math as fairseq MultiheadAttention at inference)."""
    torch.manual_seed(0)
    d, h, t, b = 32, 4, 9, 2
    mha = torch.nn.MultiheadAttention(d, h, batch_first=True)
    ln1 = torch.nn.LayerNorm(d)
    ln2 = torch.nn.LayerNorm(d)
    fc1 = torch.nn.Linear(d, 64)
    fc2 = torch.nn.Linear(64, d)

    x = torch.randn(b, t, d)
    with torch.no_grad():
        hsa = ln1(x)
        attn_out, _ = mha(hsa, hsa, hsa, need_weights=False)
        y = x + attn_out
        hff = ln2(y)
        want = (y + fc2(torch.nn.functional.gelu(fc1(hff)))).numpy()

    # assemble a fairseq-style state dict from torch's packed qkv
    qw, kw, vw = mha.in_proj_weight.detach().numpy().reshape(3, d, d)
    qb, kb, vb = mha.in_proj_bias.detach().numpy().reshape(3, d)
    sd = {
        "l.self_attn.q_proj.weight": qw, "l.self_attn.q_proj.bias": qb,
        "l.self_attn.k_proj.weight": kw, "l.self_attn.k_proj.bias": kb,
        "l.self_attn.v_proj.weight": vw, "l.self_attn.v_proj.bias": vb,
        "l.self_attn.out_proj.weight": mha.out_proj.weight.detach().numpy(),
        "l.self_attn.out_proj.bias": mha.out_proj.bias.detach().numpy(),
    }
    params = {
        "self_attn_layer_norm": _norm(_sd(ln1, "m."), "m"),
        "final_layer_norm": _norm(_sd(ln2, "m."), "m"),
        "q_proj": _lin(sd, "l.self_attn.q_proj"),
        "k_proj": _lin(sd, "l.self_attn.k_proj"),
        "v_proj": _lin(sd, "l.self_attn.v_proj"),
        "out_proj": _lin(sd, "l.self_attn.out_proj"),
        "fc1": _lin(_sd(fc1, "m."), "m"),
        "fc2": _lin(_sd(fc2, "m."), "m"),
    }
    cfg = Wav2Vec2Config(encoder_embed_dim=d, encoder_ffn_dim=64,
                         encoder_heads=h, encoder_layers=1,
                         fast_gelu=False)  # exact erf for the torch oracle
    got = TransformerLayer(cfg).apply({"params": params},
                                      jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def _tiny_fairseq_sd(cfg: Wav2Vec2Config, seed=0):
    """Synthetic fairseq-named state dict for a tiny config."""
    rng = np.random.default_rng(seed)
    sd = {}
    cin = 1
    for i, (dim, k, _s) in enumerate(cfg.conv_layers):
        sd[f"feature_extractor.conv_layers.{i}.0.weight"] = \
            rng.standard_normal((dim, cin, k)).astype(np.float32) * 0.1
        sd[f"feature_extractor.conv_layers.{i}.0.bias"] = \
            np.zeros(dim, np.float32)
        sd[f"feature_extractor.conv_layers.{i}.2.1.weight"] = \
            np.ones(dim, np.float32)
        sd[f"feature_extractor.conv_layers.{i}.2.1.bias"] = \
            np.zeros(dim, np.float32)
        cin = dim
    d = cfg.encoder_embed_dim
    sd["layer_norm.weight"] = np.ones(cin, np.float32)
    sd["layer_norm.bias"] = np.zeros(cin, np.float32)
    sd["post_extract_proj.weight"] = rng.standard_normal(
        (d, cin)).astype(np.float32) * 0.1
    sd["post_extract_proj.bias"] = np.zeros(d, np.float32)
    g = cfg.conv_pos_groups
    sd["encoder.pos_conv.0.weight_g"] = np.ones(
        (1, 1, cfg.conv_pos), np.float32)
    sd["encoder.pos_conv.0.weight_v"] = rng.standard_normal(
        (d, d // g, cfg.conv_pos)).astype(np.float32) * 0.1
    sd["encoder.pos_conv.0.bias"] = np.zeros(d, np.float32)
    sd["encoder.layer_norm.weight"] = np.ones(d, np.float32)
    sd["encoder.layer_norm.bias"] = np.zeros(d, np.float32)
    for i in range(cfg.encoder_layers):
        p = f"encoder.layers.{i}"
        for nm, (o, ii) in [("self_attn.q_proj", (d, d)),
                            ("self_attn.k_proj", (d, d)),
                            ("self_attn.v_proj", (d, d)),
                            ("self_attn.out_proj", (d, d)),
                            ("fc1", (cfg.encoder_ffn_dim, d)),
                            ("fc2", (d, cfg.encoder_ffn_dim))]:
            sd[f"{p}.{nm}.weight"] = rng.standard_normal(
                (o, ii)).astype(np.float32) * 0.05
            sd[f"{p}.{nm}.bias"] = np.zeros(o, np.float32)
        for nm in ["self_attn_layer_norm", "final_layer_norm"]:
            sd[f"{p}.{nm}.weight"] = np.ones(d, np.float32)
            sd[f"{p}.{nm}.bias"] = np.zeros(d, np.float32)
    return sd


def test_convert_w2v_end_to_end_runs():
    cfg = Wav2Vec2Config(
        conv_layers=((16, 10, 5), (16, 3, 2)), encoder_embed_dim=16,
        encoder_ffn_dim=32, encoder_heads=2, encoder_layers=2,
        conv_pos=8, conv_pos_groups=2)
    sd = _tiny_fairseq_sd(cfg)
    params = convert_w2v_checkpoint(sd, num_conv_layers=len(cfg.conv_layers))
    # stacked layers
    assert params["layers"]["layer"]["fc1"]["kernel"].shape == (2, 16, 32)
    enc = Wav2Vec2Encoder(cfg)
    wave = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 800)).astype(np.float32))
    out = enc.apply({"params": params}, wave)
    assert out.shape == (2, cfg.num_frames(800), 16)
    # shape-compatibility with a fresh init tree
    ref = enc.init(jax.random.key(0), wave)["params"]
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref)
    got_shapes = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, params)
    assert ref_shapes == got_shapes
