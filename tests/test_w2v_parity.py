"""End-to-end wav2vec2 numerical parity vs a torch oracle.

The oracle implements the fairseq wav2vec2 ``features_only`` forward
semantics (layer-norm extractor mode, post-extract projection, weight-normed
grouped positional conv with SamePad, pre-LN transformer layers, final
layer norm) directly with torch ops from a fairseq-named state dict. Our
encoder must match after :func:`convert_w2v_checkpoint` — this is the
conversion-parity gate (SURVEY.md §7 hard part #1) minus the real
xlsr2_300m.pt (not available in this environment).
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rtdsd_tpu.models.convert_fairseq import convert_w2v_checkpoint  # noqa: E402
from rtdsd_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder  # noqa: E402

CFG = Wav2Vec2Config(
    conv_layers=((24, 10, 5), (24, 3, 2), (24, 2, 2)),
    encoder_embed_dim=32, encoder_ffn_dim=64, encoder_heads=4,
    encoder_layers=3, conv_pos=8, conv_pos_groups=4,
    fast_gelu=False)  # oracle parity checks the exact-erf semantics


def _fairseq_sd(cfg: Wav2Vec2Config, seed=0, mode="layer_norm"):
    g = torch.Generator().manual_seed(seed)
    sd = {}
    rnd = lambda *shape: (torch.randn(*shape, generator=g) * 0.2)
    cin = 1
    for i, (dim, k, _s) in enumerate(cfg.conv_layers):
        sd[f"feature_extractor.conv_layers.{i}.0.weight"] = rnd(dim, cin, k)
        if mode == "layer_norm":
            # fairseq layer_norm mode: conv bias + per-block LN (Sequential
            # index .2.1 = LayerNorm inside TransposeLast wrapper)
            sd[f"feature_extractor.conv_layers.{i}.0.bias"] = rnd(dim)
            sd[f"feature_extractor.conv_layers.{i}.2.1.weight"] = \
                1 + rnd(dim) * 0.1
            sd[f"feature_extractor.conv_layers.{i}.2.1.bias"] = rnd(dim) * 0.1
        elif i == 0:
            # fairseq "default" mode: no conv bias; GroupNorm(dim, dim) on
            # layer 0 only (Sequential index .2)
            sd["feature_extractor.conv_layers.0.2.weight"] = 1 + rnd(dim) * 0.1
            sd["feature_extractor.conv_layers.0.2.bias"] = rnd(dim) * 0.1
        cin = dim
    d = cfg.encoder_embed_dim
    sd["layer_norm.weight"] = 1 + rnd(cin) * 0.1
    sd["layer_norm.bias"] = rnd(cin) * 0.1
    sd["post_extract_proj.weight"] = rnd(d, cin)
    sd["post_extract_proj.bias"] = rnd(d)
    sd["encoder.pos_conv.0.weight_g"] = torch.ones(1, 1, cfg.conv_pos)
    sd["encoder.pos_conv.0.weight_v"] = rnd(d, d // cfg.conv_pos_groups,
                                            cfg.conv_pos)
    sd["encoder.pos_conv.0.bias"] = rnd(d)
    sd["encoder.layer_norm.weight"] = 1 + rnd(d) * 0.1
    sd["encoder.layer_norm.bias"] = rnd(d) * 0.1
    for i in range(cfg.encoder_layers):
        p = f"encoder.layers.{i}"
        for nm, (o, ii) in [("self_attn.q_proj", (d, d)),
                            ("self_attn.k_proj", (d, d)),
                            ("self_attn.v_proj", (d, d)),
                            ("self_attn.out_proj", (d, d)),
                            ("fc1", (cfg.encoder_ffn_dim, d)),
                            ("fc2", (d, cfg.encoder_ffn_dim))]:
            sd[f"{p}.{nm}.weight"] = rnd(o, ii)
            sd[f"{p}.{nm}.bias"] = rnd(o) * 0.1
        for nm in ["self_attn_layer_norm", "final_layer_norm"]:
            sd[f"{p}.{nm}.weight"] = 1 + rnd(d) * 0.1
            sd[f"{p}.{nm}.bias"] = rnd(d) * 0.1
    return {k: v.float() for k, v in sd.items()}


def _torch_oracle(sd, wave: torch.Tensor, cfg: Wav2Vec2Config,
                  mode="layer_norm"):
    """fairseq Wav2Vec2Model(..., features_only=True)['x'] semantics."""
    x = wave.unsqueeze(1)                                    # (B, 1, T)
    for i, (dim, _k, s) in enumerate(cfg.conv_layers):
        x = F.conv1d(x, sd[f"feature_extractor.conv_layers.{i}.0.weight"],
                     sd.get(f"feature_extractor.conv_layers.{i}.0.bias"),
                     stride=s)
        if mode == "layer_norm":
            x = F.layer_norm(x.transpose(1, 2), (dim,),
                             sd[f"feature_extractor.conv_layers.{i}.2.1.weight"],
                             sd[f"feature_extractor.conv_layers.{i}.2.1.bias"]
                             ).transpose(1, 2)
        elif i == 0:  # fairseq default mode: GroupNorm(dim, dim), layer 0
            x = F.group_norm(x, dim,
                             sd["feature_extractor.conv_layers.0.2.weight"],
                             sd["feature_extractor.conv_layers.0.2.bias"],
                             eps=1e-5)
        x = F.gelu(x)
    x = x.transpose(1, 2)                                    # (B, T', C)
    c = x.shape[-1]
    x = F.layer_norm(x, (c,), sd["layer_norm.weight"], sd["layer_norm.bias"])
    x = F.linear(x, sd["post_extract_proj.weight"],
                 sd["post_extract_proj.bias"])

    # weight-normed grouped pos conv + SamePad + GELU
    g_w = sd["encoder.pos_conv.0.weight_g"]
    v_w = sd["encoder.pos_conv.0.weight_v"]
    norm = v_w.pow(2).sum(dim=(0, 1), keepdim=True).sqrt()
    w = g_w * v_w / norm
    pc = F.conv1d(x.transpose(1, 2), w, sd["encoder.pos_conv.0.bias"],
                  padding=cfg.conv_pos // 2, groups=cfg.conv_pos_groups)
    if cfg.conv_pos % 2 == 0:
        pc = pc[..., :-1]
    x = x + F.gelu(pc).transpose(1, 2)

    d, h = cfg.encoder_embed_dim, cfg.encoder_heads
    dh = d // h
    for i in range(cfg.encoder_layers):
        p = f"encoder.layers.{i}"
        res = x
        hdn = F.layer_norm(x, (d,), sd[f"{p}.self_attn_layer_norm.weight"],
                           sd[f"{p}.self_attn_layer_norm.bias"])
        b, t, _ = hdn.shape
        q = F.linear(hdn, sd[f"{p}.self_attn.q_proj.weight"],
                     sd[f"{p}.self_attn.q_proj.bias"])
        k = F.linear(hdn, sd[f"{p}.self_attn.k_proj.weight"],
                     sd[f"{p}.self_attn.k_proj.bias"])
        v = F.linear(hdn, sd[f"{p}.self_attn.v_proj.weight"],
                     sd[f"{p}.self_attn.v_proj.bias"])
        q = q.view(b, t, h, dh).transpose(1, 2) / math.sqrt(dh)
        k = k.view(b, t, h, dh).transpose(1, 2)
        v = v.view(b, t, h, dh).transpose(1, 2)
        attn = torch.softmax(q @ k.transpose(-1, -2), dim=-1) @ v
        attn = attn.transpose(1, 2).reshape(b, t, d)
        x = res + F.linear(attn, sd[f"{p}.self_attn.out_proj.weight"],
                           sd[f"{p}.self_attn.out_proj.bias"])
        res = x
        hdn = F.layer_norm(x, (d,), sd[f"{p}.final_layer_norm.weight"],
                           sd[f"{p}.final_layer_norm.bias"])
        hdn = F.gelu(F.linear(hdn, sd[f"{p}.fc1.weight"], sd[f"{p}.fc1.bias"]))
        x = res + F.linear(hdn, sd[f"{p}.fc2.weight"], sd[f"{p}.fc2.bias"])

    return F.layer_norm(x, (d,), sd["encoder.layer_norm.weight"],
                        sd["encoder.layer_norm.bias"])


def test_full_encoder_matches_torch_oracle():
    sd = _fairseq_sd(CFG)
    wave = torch.randn(2, 800, generator=torch.Generator().manual_seed(7))
    with torch.no_grad():
        want = _torch_oracle(sd, wave, CFG).numpy()

    np_sd = {k: v.numpy() for k, v in sd.items()}
    params = convert_w2v_checkpoint(np_sd,
                                    num_conv_layers=len(CFG.conv_layers))
    enc = Wav2Vec2Encoder(CFG)
    got = enc.apply({"params": params}, jnp.asarray(wave.numpy()))
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=5e-5)


def test_layer_subset_matches_oracle_sliced():
    """first-n pruning == oracle run with only the first n layers."""
    import dataclasses

    sd = _fairseq_sd(CFG)
    wave = torch.randn(1, 800, generator=torch.Generator().manual_seed(9))
    cfg2 = dataclasses.replace(CFG, encoder_layers=2)
    with torch.no_grad():
        want = _torch_oracle(sd, wave, cfg2).numpy()

    from rtdsd_tpu.models.wav2vec2 import select_layers

    np_sd = {k: v.numpy() for k, v in sd.items()}
    params = convert_w2v_checkpoint(np_sd,
                                    num_conv_layers=len(CFG.conv_layers))
    params = select_layers(params, [0, 1])
    enc = Wav2Vec2Encoder(cfg2)
    got = enc.apply({"params": params}, jnp.asarray(wave.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=5e-5)


def test_group_norm_extractor_matches_torch_oracle():
    """fairseq "default" extractor mode (GroupNorm on conv layer 0, no conv
    bias, no per-block LN) — the base-model family's front end
    (wav2vec2.py:230-233 / convert_fairseq.py:141-142)."""
    import dataclasses

    cfg = dataclasses.replace(CFG, extractor_mode="group_norm",
                              conv_bias=False)
    sd = _fairseq_sd(cfg, mode="group_norm")
    wave = torch.randn(2, 800, generator=torch.Generator().manual_seed(13))
    with torch.no_grad():
        want = _torch_oracle(sd, wave, cfg, mode="group_norm").numpy()

    np_sd = {k: v.numpy() for k, v in sd.items()}
    params = convert_w2v_checkpoint(np_sd,
                                    num_conv_layers=len(cfg.conv_layers),
                                    extractor_mode="group_norm")
    enc = Wav2Vec2Encoder(cfg)
    got = enc.apply({"params": params}, jnp.asarray(wave.numpy()))
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=5e-5)


def test_convert_handles_fp16_and_extra_keys(tmp_path):
    """Real fairseq checkpoints may store fp16 weights and carry extra
    pretraining-only tensors (quantizer codebooks, label_embs_concat, ...);
    conversion must upcast and ignore them (VERDICT r1 item 8)."""
    from rtdsd_tpu.models.convert_fairseq import load_torch_state_dict

    sd = _fairseq_sd(CFG)
    wave = torch.randn(1, 800, generator=torch.Generator().manual_seed(3))
    with torch.no_grad():
        want = _torch_oracle(sd, wave, CFG).numpy()

    # fp16-stored checkpoint with fairseq-style nesting + extra keys
    half = {k: v.to(torch.float16) for k, v in sd.items()}
    half["label_embs_concat"] = torch.randn(4, 8).half()
    half["quantizer.vars"] = torch.randn(1, 8, 4).half()
    half["_ema"] = 3  # non-tensor entries must be skipped
    path = tmp_path / "ckpt_fp16.pt"
    torch.save({"model": half}, str(path))

    np_sd = load_torch_state_dict(str(path))
    assert np_sd["layer_norm.weight"].dtype == np.float32
    params = convert_w2v_checkpoint(np_sd,
                                    num_conv_layers=len(CFG.conv_layers))
    enc = Wav2Vec2Encoder(CFG)
    got = enc.apply({"params": params}, jnp.asarray(wave.numpy()))
    # fp16 storage quantizes the weights; parity is at half precision
    np.testing.assert_allclose(np.asarray(got), want, rtol=0.05, atol=0.05)
