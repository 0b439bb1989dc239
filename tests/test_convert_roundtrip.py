"""Export -> convert roundtrip for the full XLSR_AASIST model.

Exercises ``convert_reference_model`` (the trained-reference-checkpoint
bridge) against ``export_reference_model`` (the inverse): a zoo model's
weights exported to a reference-named torch-layout state dict must convert
back to the identical pytree, and the converted model must produce identical
logits.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rtdsd_tpu.models.convert_fairseq import convert_reference_model
from rtdsd_tpu.models.export_reference import export_reference_model
from rtdsd_tpu.models.wav2vec2 import Wav2Vec2Config
from rtdsd_tpu.models.zoo import XLSR_AASIST

TINY = Wav2Vec2Config(
    conv_layers=((16, 10, 5), (16, 3, 2), (16, 2, 2)),
    encoder_embed_dim=16, encoder_ffn_dim=32, encoder_heads=2,
    encoder_layers=2, conv_pos=8, conv_pos_groups=2)


def _tree_equal(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), f"{path}: keys {set(a) ^ set(b)}"
        for k in a:
            _tree_equal(a[k], b[k], f"{path}/{k}")
    else:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6, err_msg=path)


def test_xlsr_aasist_export_convert_roundtrip():
    model = XLSR_AASIST(w2v_cfg=TINY)
    wave = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 800)).astype(np.float32) * 0.1)
    variables = model.init(jax.random.key(0), wave, train=False)

    sd = export_reference_model(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, "XLSR_AASIST")
    # reference-style names present
    for expected in ["ssl_model.model.encoder.layers.1.fc1.weight",
                     "ssl_model.model.feature_extractor.conv_layers.0.0.weight",
                     "ssl_model.model.encoder.pos_conv.0.weight_g",
                     "LL.weight", "encoder.3.0.bn1.running_mean",
                     "GAT_layer_S.att_weight",
                     "HtrgGAT_layer_ST12.att_weightM",
                     "pool_hS2.proj.weight", "pos_S", "out_layer.bias"]:
        assert expected in sd, expected

    back = convert_reference_model(sd, "XLSR_AASIST")
    _tree_equal(variables["params"]["ssl_model"],
                back["params"]["ssl_model"], "ssl")
    _tree_equal(variables["params"]["backend"],
                back["params"]["backend"], "backend")
    _tree_equal(variables["batch_stats"]["backend"],
                back["batch_stats"]["backend"], "stats")

    # converted weights produce identical logits
    a = model.apply(variables, wave, train=False)
    b = model.apply({"params": back["params"],
                     "batch_stats": back["batch_stats"]}, wave, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-6)


def test_export_loads_into_torch_strictly():
    """The exported dict is a complete torch-compatible state dict: every
    tensor converts to torch and dead-bn1 identities are present."""
    torch = __import__("torch")
    model = XLSR_AASIST(w2v_cfg=TINY)
    wave = jnp.zeros((1, 800), jnp.float32)
    variables = model.init(jax.random.key(0), wave, train=False)
    sd = export_reference_model(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, "XLSR_AASIST")
    tsd = {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()}
    assert tsd["encoder.1.0.bn1.weight"].shape == (32,)
    assert all(v.dtype in (torch.float32, torch.int64) for v in tsd.values())


def test_conformer_export_convert_roundtrip():
    from rtdsd_tpu.models.zoo import XLSR_Conformer

    model = XLSR_Conformer(w2v_cfg=TINY, emb_size=16, heads=2, kernel_size=5,
                           n_encoders=2)
    wave = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 800)).astype(np.float32) * 0.1)
    variables = model.init(jax.random.key(0), wave, train=False)
    sd = export_reference_model(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, "Model")
    for expected in ["conformer.class_token", "conformer.fc5.weight",
                     "conformer.encoder_blocks.1.attn.fn.rel_pos_emb.weight",
                     "conformer.encoder_blocks.0.conv.net.4.conv.weight",
                     "conformer.encoder_blocks.0.conv.net.5.running_mean"]:
        assert expected in sd, expected
    # torch Conv1d-1x1 layout check
    assert sd["conformer.encoder_blocks.0.conv.net.2.weight"].ndim == 3

    back = convert_reference_model(sd, "Model", n_encoders=2)
    _tree_equal(variables["params"]["backend"],
                back["params"]["backend"], "backend")
    a = model.apply(variables, wave, train=False)
    b = model.apply({"params": back["params"],
                     "batch_stats": back["batch_stats"]}, wave, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-6)


def test_export_carries_pretraining_only_keys():
    """source_sd pass-through makes the export strict-load complete even for
    fairseq pretraining-only params absent from the inference pytree."""
    import numpy as np

    from rtdsd_tpu.models.export_reference import export_reference_model
    from rtdsd_tpu.models.zoo import XLSR_AASIST

    import jax

    model = XLSR_AASIST(w2v_cfg=TINY)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 3200), jnp.float32), train=False)
    extras = {"ssl_model.model.mask_emb": np.ones(16, np.float32),
              "ssl_model.model.quantizer.vars": np.ones((1, 4, 2),
                                                        np.float32)}
    out = export_reference_model(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, "XLSR_AASIST",
        source_sd=extras)
    for k, v in extras.items():
        np.testing.assert_array_equal(out[k], v)
    # converted keys win over source keys of the same name
    assert out["ssl_model.model.post_extract_proj.weight"].shape[0] == \
        variables["params"]["ssl_model"]["post_extract_proj"]["kernel"].shape[1]


def test_ssl_shape_mismatch_raises_readably():
    """Loading an SSL checkpoint whose dims don't match the model's w2v
    config must fail with a named-leaf error, not a deep tree_map/jit
    shape error (the realistic failure: pointing ssl_pytree_path at an HF
    snapshot of a different-sized model). Lives here, torch-free, so the
    guard stays covered in environments without torch/transformers."""
    import pytest

    from rtdsd_tpu.cli.common import _check_ssl_shapes

    model = {"encoder": {"w": np.zeros((4, 8)), "b": np.zeros(8)},
             "proj": {"w": np.zeros((8, 2))}}
    okay = {"encoder": {"w": np.ones((4, 8)), "b": np.ones(8)},
            "proj": {"w": np.ones((8, 2))}}
    _check_ssl_shapes(model, okay, "ok")  # no raise

    bad = {"encoder": {"w": np.ones((4, 16)), "b": np.ones(16)},
           "proj": {"w": np.ones((16, 2))}}
    with pytest.raises(ValueError, match="does not match the model's w2v"):
        _check_ssl_shapes(model, bad, "snap")
    missing = {"encoder": {"w": np.ones((4, 8))},
               "proj": {"w": np.ones((8, 2)), "extra": np.ones(3)}}
    with pytest.raises(ValueError, match="missing in checkpoint"):
        _check_ssl_shapes(model, missing, "snap")
