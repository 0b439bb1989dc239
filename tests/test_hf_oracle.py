"""HF ``transformers`` wav2vec2 as a third-party numerical oracle.

``tests/test_w2v_parity.py`` pins the encoder against a *hand-written*
fairseq-semantics oracle; this file pins it against code we did not write:
HuggingFace's ``Wav2Vec2Model`` (a faithful port of fairseq's, and the form
in which the XLS-R weights are actually distributed today —
``facebook/wav2vec2-xls-r-300m``). A tiny randomly-initialised HF model is
converted through :mod:`rtdsd_tpu.models.convert_hf` and the flax forward
must equal HF's own torch forward.

This simultaneously validates the HF->fairseq rename table (the user-facing
converter path for HF-only environments, replacing the reference's
fairseq-only load at /root/reference/models/fe.py:11-12) and gives the SSL
encoder math an oracle with no shared ancestry with our implementation.
"""

import dataclasses
import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from rtdsd_tpu.models.convert_hf import (convert_hf_checkpoint,  # noqa: E402
                                         hf_to_fairseq_names, load_hf_dir,
                                         w2v_config_from_hf)
from rtdsd_tpu.models.wav2vec2 import Wav2Vec2Encoder  # noqa: E402

# Tiny XLS-R-shaped config: stable (pre-) LN, per-block LayerNorm extractor,
# conv bias — exactly the structural family of facebook/wav2vec2-xls-r-300m.
HF_KW = dict(
    conv_dim=[24, 24, 24], conv_kernel=[10, 3, 2], conv_stride=[5, 2, 2],
    num_feat_extract_layers=3, hidden_size=32, intermediate_size=64,
    num_attention_heads=4, num_hidden_layers=3,
    num_conv_pos_embeddings=8, num_conv_pos_embedding_groups=4,
    do_stable_layer_norm=True, feat_extract_norm="layer", conv_bias=True,
    layerdrop=0.0, apply_spec_augment=False,
)


def _hf_model(seed=0):
    torch.manual_seed(seed)
    cfg = transformers.Wav2Vec2Config(**HF_KW)
    return transformers.Wav2Vec2Model(cfg).eval(), cfg


def _np_sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _flax_forward(params, cfg, wave: np.ndarray) -> np.ndarray:
    enc = Wav2Vec2Encoder(dataclasses.replace(cfg, fast_gelu=False))
    return np.asarray(enc.apply({"params": params}, jnp.asarray(wave)))


def test_hf_forward_parity():
    """Converted flax forward == HF's own torch forward (eval, f32)."""
    model, hf_cfg = _hf_model()
    wave = torch.randn(2, 800, generator=torch.Generator().manual_seed(7))
    with torch.no_grad():
        want = model(wave).last_hidden_state.numpy()

    params, cfg = convert_hf_checkpoint(_np_sd(model), hf_cfg.to_dict())
    got = _flax_forward(params, cfg, wave.numpy())
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=5e-5)


def test_hf_pretraining_state_dict_converts_identically():
    """Wav2Vec2ForPreTraining sd (``wav2vec2.``-prefixed, + quantizer /
    projection heads / masked_spec_embed) -> same params as the bare model;
    the pretraining-only heads are dropped, not rejected."""
    torch.manual_seed(1)
    cfg = transformers.Wav2Vec2Config(**HF_KW)
    pre = transformers.Wav2Vec2ForPreTraining(cfg).eval()
    sd_pre = _np_sd(pre)
    assert any(k.startswith("wav2vec2.") for k in sd_pre)
    assert any(k.startswith("quantizer.") for k in sd_pre)

    params_pre, _ = convert_hf_checkpoint(sd_pre, cfg.to_dict())
    params_bare, _ = convert_hf_checkpoint(_np_sd(pre.wav2vec2),
                                           cfg.to_dict())
    flat_a = {"/".join(map(str, p)): v for p, v in
              _flatten(params_pre).items()}
    flat_b = {"/".join(map(str, p)): v for p, v in
              _flatten(params_bare).items()}
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]),
                                      np.asarray(flat_b[k]), err_msg=k)


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def test_post_ln_base_family_rejected():
    kw = dict(HF_KW, do_stable_layer_norm=False, feat_extract_norm="group")
    with pytest.raises(ValueError, match="post-LN"):
        w2v_config_from_hf(kw)


def test_unknown_hf_key_raises():
    with pytest.raises(ValueError, match="unrecognized"):
        hf_to_fairseq_names({"encoder.layers.0.totally_new.weight":
                             np.zeros(3)})


def test_group_norm_rename_targets_layer0_groupnorm():
    """In group mode HF names the layer-0 GroupNorm ``layer_norm`` too; it
    must land on fairseq Sequential index .2 (not the per-block .2.1)."""
    sd = {"feature_extractor.conv_layers.0.layer_norm.weight": np.ones(4)}
    out = hf_to_fairseq_names(sd, feat_extract_norm="group")
    assert list(out) == ["feature_extractor.conv_layers.0.2.weight"]
    out = hf_to_fairseq_names(sd, feat_extract_norm="layer")
    assert list(out) == ["feature_extractor.conv_layers.0.2.1.weight"]


def test_load_hf_dir_safetensors(tmp_path):
    """End-to-end snapshot-dir path: config.json + model.safetensors on disk
    -> identical forward to the in-memory conversion."""
    safetensors = pytest.importorskip("safetensors")
    from safetensors.numpy import save_file

    model, hf_cfg = _hf_model(seed=2)
    snap = tmp_path / "hf_snapshot"
    os.makedirs(snap)
    with open(snap / "config.json", "w") as f:
        json.dump(hf_cfg.to_dict(), f)
    save_file({k: np.ascontiguousarray(v) for k, v in _np_sd(model).items()},
              str(snap / "model.safetensors"))

    sd, cfg_dict = load_hf_dir(str(snap))
    params, cfg = convert_hf_checkpoint(sd, cfg_dict)
    wave = np.random.default_rng(3).standard_normal((1, 800)).astype("f4")
    got = _flax_forward(params, cfg, wave)
    with torch.no_grad():
        want = model(torch.from_numpy(wave)).last_hidden_state.numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=5e-5)

    # the CLI SSL loader dispatches on config.json presence -> same params
    from rtdsd_tpu.cli.common import load_ssl_params

    via_loader = load_ssl_params(str(snap))
    for k, v in _flatten(params).items():
        np.testing.assert_array_equal(np.asarray(v),
                                      np.asarray(_flatten(via_loader)[k]))

    # and `cli.convert --hf` caches it as a msgpack pytree dir the loader
    # also accepts
    from rtdsd_tpu.cli.convert import main as convert_main

    out = tmp_path / "xlsr_jax"
    convert_main(["--hf", str(snap), "--out", str(out)])
    cached = load_ssl_params(str(out))
    for k, v in _flatten(params).items():
        np.testing.assert_array_equal(np.asarray(v),
                                      np.asarray(_flatten(cached)[k]))


def test_load_ssl_params_rejects_shape_invisible_config_mismatch(tmp_path):
    """An HF snapshot whose heads count disagrees with the model's w2v
    config must be rejected: every attention projection is (D, D), so the
    shape pre-flight cannot see a wrong head split — the math would run
    and score garbage (cli.common.load_ssl_params expect_cfg check)."""
    safetensors = pytest.importorskip("safetensors")
    from safetensors.numpy import save_file

    from rtdsd_tpu.cli.common import load_ssl_params

    model, hf_cfg = _hf_model(seed=4)
    snap = tmp_path / "hf_snapshot"
    os.makedirs(snap)
    with open(snap / "config.json", "w") as f:
        json.dump(hf_cfg.to_dict(), f)
    save_file({k: np.ascontiguousarray(v) for k, v in _np_sd(model).items()},
              str(snap / "model.safetensors"))

    good = w2v_config_from_hf(hf_cfg.to_dict())
    load_ssl_params(str(snap), expect_cfg=good)  # matching: no raise

    bad = dataclasses.replace(good, encoder_heads=good.encoder_heads * 2)
    with pytest.raises(ValueError, match="encoder_heads"):
        load_ssl_params(str(snap), expect_cfg=bad)
