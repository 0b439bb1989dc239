"""Shape / numerics / mode tests for the model zoo."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtdsd_tpu.models.aasist import (AASISTBackend, GraphAttentionLayer,
                                     GraphPool, HtrgGraphAttentionLayer,
                                     ResidualBlock)
from rtdsd_tpu.models.conformer import ConformerBackend, MyConformer
from rtdsd_tpu.models.wav2vec2 import (Wav2Vec2Config, Wav2Vec2Encoder,
                                       middle_indices, resolve_layer_indices,
                                       select_layers)

TINY_W2V = Wav2Vec2Config(
    conv_layers=((64, 10, 5), (64, 3, 2), (64, 2, 2)),
    encoder_embed_dim=64, encoder_ffn_dim=128, encoder_heads=4,
    encoder_layers=3, conv_pos=16, conv_pos_groups=4)


def test_w2v_num_frames():
    cfg = Wav2Vec2Config()
    # 4 s @ 16 kHz -> 199 frames (SURVEY.md §3.4); 1 s -> 49
    assert cfg.num_frames(64000) == 199
    assert cfg.num_frames(16000) == 49
    assert cfg.total_stride == 320


def test_layer_indices():
    assert resolve_layer_indices(24, 6, "first") == [0, 1, 2, 3, 4, 5]
    assert resolve_layer_indices(24, 6, "last") == [18, 19, 20, 21, 22, 23]
    assert resolve_layer_indices(24, 6, "middle") == middle_indices(24, 6)
    assert middle_indices(24, 6) == [9, 10, 11, 12, 13, 14]
    assert resolve_layer_indices(24, 3, "custom", [0, 11, 23]) == [0, 11, 23]
    with pytest.raises(ValueError):
        resolve_layer_indices(24, 0, "first")
    with pytest.raises(ValueError):
        resolve_layer_indices(24, 3, "custom", None)


def test_w2v_encoder_shapes():
    enc = Wav2Vec2Encoder(TINY_W2V)
    wave = jnp.zeros((2, 3200))
    variables = enc.init(jax.random.key(0), wave)
    out = enc.apply(variables, wave)
    assert out.shape == (2, TINY_W2V.num_frames(3200), 64)
    out2, hiddens = enc.apply(variables, wave, return_hiddens=True)
    assert hiddens.shape == (3, 2, TINY_W2V.num_frames(3200), 64)
    np.testing.assert_allclose(out2, out, rtol=1e-6)


def test_w2v_layers_stacked_and_selectable():
    enc = Wav2Vec2Encoder(TINY_W2V)
    wave = jnp.zeros((1, 3200))
    variables = enc.init(jax.random.key(0), wave)
    leaf = variables["params"]["layers"]["layer"]["fc1"]["kernel"]
    assert leaf.shape[0] == 3  # stacked layer axis

    sub = select_layers(variables["params"], [0, 2])
    sub_leaf = sub["layers"]["layer"]["fc1"]["kernel"]
    assert sub_leaf.shape[0] == 2
    np.testing.assert_array_equal(sub_leaf[1], leaf[2])

    # the 2-layer model runs with the selected params
    import dataclasses
    enc2 = Wav2Vec2Encoder(dataclasses.replace(TINY_W2V, encoder_layers=2))
    out = enc2.apply({"params": sub}, wave)
    assert out.shape == (1, TINY_W2V.num_frames(3200), 64)


def test_graph_attention_layer():
    layer = GraphAttentionLayer(out_dim=32, temperature=2.0)
    x = jax.random.normal(jax.random.key(1), (2, 12, 24))
    variables = layer.init(jax.random.key(0), x, train=False)
    y = layer.apply(variables, x, train=False)
    assert y.shape == (2, 12, 32)
    # eval mode is deterministic
    y2 = layer.apply(variables, x, train=False)
    np.testing.assert_array_equal(y, y2)


def test_htrg_layer_shapes_and_master():
    layer = HtrgGraphAttentionLayer(in_dim=16, out_dim=8, temperature=100.0)
    x1 = jax.random.normal(jax.random.key(1), (2, 6, 16))
    x2 = jax.random.normal(jax.random.key(2), (2, 4, 16))
    master = jnp.ones((1, 1, 16))
    variables = layer.init(jax.random.key(0), x1, x2, master, train=False)
    o1, o2, m = layer.apply(variables, x1, x2, master, train=False)
    assert o1.shape == (2, 6, 8)
    assert o2.shape == (2, 4, 8)
    assert m.shape == (2, 1, 8)
    # master=None derives the mean master (ref aasist_modules.py:167-168)
    o1, o2, m = layer.apply(variables, x1, x2, None, train=False)
    assert m.shape == (2, 1, 8)


def test_graph_pool_topk_semantics():
    pool = GraphPool(k=0.5, p=0.0)
    x = jax.random.normal(jax.random.key(1), (3, 10, 8))
    variables = pool.init(jax.random.key(0), x, train=False)
    y = pool.apply(variables, x, train=False)
    assert y.shape == (3, 5, 8)
    # nodes must be score-scaled rows of the input, in descending score order
    w = variables["params"]["proj"]["kernel"]
    b = variables["params"]["proj"]["bias"]
    scores = jax.nn.sigmoid(x @ w + b)
    scored = np.asarray(x * scores)
    order = np.argsort(-np.asarray(scores)[..., 0], axis=1, kind="stable")
    expected = np.take_along_axis(scored, order[:, :5, None], axis=1)
    np.testing.assert_allclose(y, expected, rtol=1e-6)


def test_residual_block_preserves_hw():
    x = jax.random.normal(jax.random.key(1), (2, 42, 66, 1))
    blk = ResidualBlock(1, 32, first=True)
    variables = blk.init(jax.random.key(0), x, train=False)
    y = blk.apply(variables, x, train=False)
    assert y.shape == (2, 42, 66, 32)
    blk2 = ResidualBlock(32, 32)
    v2 = blk2.init(jax.random.key(0), y, train=False)
    y2 = blk2.apply(v2, y, train=False)
    assert y2.shape == y.shape


@pytest.mark.parametrize("frames", [199, 49])
def test_aasist_backend_shapes(frames):
    model = AASISTBackend()
    feats = jax.random.normal(jax.random.key(1), (2, frames, 1024)) * 0.1
    variables = model.init(jax.random.key(0), feats, train=False)
    logits = model.apply(variables, feats, train=False)
    assert logits.shape == (2, 2)
    assert np.isfinite(np.asarray(logits)).all()


def test_aasist_backend_train_mode_updates_batch_stats():
    model = AASISTBackend()
    feats = jax.random.normal(jax.random.key(1), (4, 199, 1024)) * 0.1
    variables = model.init(jax.random.key(0), feats, train=False)
    logits, mutated = model.apply(
        variables, feats, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(2)})
    assert logits.shape == (4, 2)
    old = variables["batch_stats"]["first_bn"]["mean"]
    new = mutated["batch_stats"]["first_bn"]["mean"]
    assert not np.allclose(old, new)


def test_aasist_out_s1_bug_flag_changes_output():
    feats = jax.random.normal(jax.random.key(1), (1, 199, 1024)) * 0.1
    buggy = AASISTBackend(fix_out_s1_bug=False)
    fixed = AASISTBackend(fix_out_s1_bug=True)
    variables = buggy.init(jax.random.key(0), feats, train=False)
    a = buggy.apply(variables, feats, train=False)
    b = fixed.apply(variables, feats, train=False)
    assert not np.allclose(a, b)


def test_conformer_shapes():
    model = MyConformer(emb_size=144, n_encoders=2)
    x = jax.random.normal(jax.random.key(1), (2, 50, 144))
    variables = model.init(jax.random.key(0), x, train=False)
    out, emb = model.apply(variables, x, train=False)
    assert out.shape == (2, 2)
    assert emb.shape == (2, 144)


def test_conformer_backend_shapes():
    model = ConformerBackend(n_encoders=1)
    feats = jax.random.normal(jax.random.key(1), (2, 49, 256))
    variables = model.init(jax.random.key(0), feats, train=False)
    out = model.apply(variables, feats, train=False)
    assert out.shape == (2, 2)


def test_registry():
    from rtdsd_tpu.models.registry import get_model, list_models

    names = list_models()
    for expected in ["XLSR_AASIST", "My_XLSR_AASIST", "Model",
                     "ConformerModel", "MyModel"]:
        assert expected in names
    spec = get_model("My_XLSR_AASIST", num_layers=3, order="custom",
                     custom_order=[0, 11, 23])
    assert spec.layer_indices == [0, 11, 23]
    assert spec.module.w2v_cfg.encoder_layers == 3
    spec = get_model("XLSR_AASIST", partial_freeze_layers={
        "target_layers": ["feature_extractor"], "non_target_layers": ["ln"]})
    assert spec.freeze_patterns == ["feature_extractor"]


def test_conv_dots_matches_xla_conv():
    """dots-decomposed strided conv == XLA conv (same params)."""
    import dataclasses

    cfg_conv = dataclasses.replace(TINY_W2V, conv_impl="conv")
    cfg_dots = dataclasses.replace(TINY_W2V, conv_impl="dots")
    from rtdsd_tpu.models.wav2vec2 import ConvFeatureExtractor

    fe_conv = ConvFeatureExtractor(cfg_conv)
    fe_dots = ConvFeatureExtractor(cfg_dots)
    wave = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 3200)).astype(np.float32))
    variables = fe_conv.init(jax.random.key(0), wave)
    a = fe_conv.apply(variables, wave)
    b = fe_dots.apply(variables, wave)  # identical param tree
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-5)


def test_custom_order_out_of_range_rejected():
    with pytest.raises(ValueError):
        resolve_layer_indices(24, 3, "custom", [0, 5, 24])
    with pytest.raises(ValueError):
        resolve_layer_indices(24, 2, "custom", [-1, 3])


def test_pos_conv_train_eval_paths_identical():
    """PositionalConv uses the partitioner-safe per-group form in training
    and the native grouped conv at eval — same math, same params
    (ops/groupedconv.py). With all dropout at 0 the whole encoder must
    produce identical features either way."""
    cfg = TINY_W2V
    enc = Wav2Vec2Encoder(cfg)
    wave = jnp.asarray(np.random.default_rng(3).standard_normal(
        (2, 1600)).astype(np.float32) * 0.1)
    v = enc.init(jax.random.key(0), wave)
    out_eval = enc.apply(v, wave, train=False)
    out_train = enc.apply(v, wave, train=True,
                          rngs={"dropout": jax.random.key(1)})
    np.testing.assert_allclose(np.asarray(out_train), np.asarray(out_eval),
                               atol=2e-5)


def test_fast_softmax_bf16_close_to_f32_softmax():
    """bf16-softmax attention (fast_softmax, bf16 models only) must track
    the f32-softmax path within the bf16 compute dtype's noise; f32 models
    must be unaffected by the flag."""
    import dataclasses

    cfg = dataclasses.replace(TINY_W2V, fast_softmax=True)
    wave = jnp.asarray(np.random.default_rng(4).standard_normal(
        (2, 1600)).astype(np.float32) * 0.1)
    v = Wav2Vec2Encoder(cfg).init(jax.random.key(0), wave)
    # f32: flag is inert (same graph either way)
    a = Wav2Vec2Encoder(cfg).apply(v, wave)
    b = Wav2Vec2Encoder(dataclasses.replace(cfg, fast_softmax=False)).apply(
        v, wave)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # bf16: fast vs exact softmax differ only at bf16-noise scale
    fast = Wav2Vec2Encoder(dataclasses.replace(cfg), jnp.bfloat16).apply(
        v, wave)
    exact = Wav2Vec2Encoder(dataclasses.replace(cfg, fast_softmax=False),
                            jnp.bfloat16).apply(v, wave)
    d = np.abs(np.asarray(fast, np.float32) - np.asarray(exact, np.float32))
    scale = np.abs(np.asarray(exact, np.float32)).max()
    assert d.max() < 0.05 * max(scale, 1.0), (d.max(), scale)


def test_segmented_conv_matches_default():
    """conv_segments (B=1 latency knob) is exact for layer_norm extractors:
    segment frames are an exact slice of the full-wave conv frames."""
    import dataclasses

    from rtdsd_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder

    base = Wav2Vec2Config(conv_layers=((16, 10, 5), (16, 4, 4), (16, 2, 2)),
                          encoder_embed_dim=16, encoder_ffn_dim=32,
                          encoder_heads=2, encoder_layers=2, conv_pos=4,
                          conv_pos_groups=2)
    seg = dataclasses.replace(base, conv_segments=4)
    wave = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 4000)).astype(np.float32))
    enc_a, enc_b = Wav2Vec2Encoder(base), Wav2Vec2Encoder(seg)
    v = enc_a.init(jax.random.key(0), wave)
    a = enc_a.apply(v, wave)
    b = enc_b.apply(v, wave)  # same param tree: same extractor submodule
    assert a.shape == b.shape
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_segmented_conv_rejects_group_norm():
    import dataclasses

    import pytest

    from rtdsd_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder

    cfg = Wav2Vec2Config(conv_layers=((16, 10, 5), (16, 4, 4)),
                         encoder_embed_dim=16, encoder_ffn_dim=32,
                         encoder_heads=2, encoder_layers=1, conv_pos=4,
                         conv_pos_groups=2, extractor_mode="group_norm",
                         conv_bias=False, conv_segments=4)
    wave = jnp.zeros((1, 2000), jnp.float32)
    with pytest.raises(ValueError, match="layer_norm"):
        Wav2Vec2Encoder(cfg).init(jax.random.key(0), wave)


def test_mixed_remat_matches_uniform():
    """r5 partial remat (remat_save_every=m): a pure scheduling/layout
    change — forward outputs, per-layer hiddens, AND parameter gradients
    must equal the uniform per-layer-remat stack once params are mapped
    through the layout converter. Also pins the converter roundtrip and
    the divisibility guard."""
    import dataclasses

    import numpy as np

    from rtdsd_tpu.models.convert_fairseq import (from_mixed_remat,
                                                  to_mixed_remat)
    from rtdsd_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder

    cfg = Wav2Vec2Config(conv_layers=((8, 10, 5), (8, 4, 4)),
                         encoder_embed_dim=8, encoder_ffn_dim=16,
                         encoder_heads=2, encoder_layers=4, conv_pos=4,
                         conv_pos_groups=2)
    enc = Wav2Vec2Encoder(cfg, remat=True)
    wave = jnp.asarray(np.random.default_rng(5).standard_normal(
        (2, 2000)).astype(np.float32) * 0.1)
    params = enc.init(jax.random.key(0), wave, train=False)["params"]

    cfg_m = dataclasses.replace(cfg, remat_save_every=2)
    enc_m = Wav2Vec2Encoder(cfg_m, remat=True)
    params_m = to_mixed_remat(params, 2)
    # shapes line up with what the mixed module would initialize
    init_m = enc_m.init(jax.random.key(0), wave, train=False)["params"]
    jax.tree_util.tree_map(lambda a, b: None if a.shape == b.shape
                           else (_ for _ in ()).throw(AssertionError(
                               (a.shape, b.shape))), params_m, init_m)

    out, hid = enc.apply({"params": params}, wave, train=False,
                         return_hiddens=True)
    out_m, hid_m = enc_m.apply({"params": params_m}, wave, train=False,
                               return_hiddens=True)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out),
                               rtol=1e-5, atol=1e-6)
    assert hid_m.shape == hid.shape  # (L, B, T, D), layer order preserved
    np.testing.assert_allclose(np.asarray(hid_m), np.asarray(hid),
                               rtol=1e-5, atol=1e-6)

    def loss(p, module):
        return jnp.sum(module.apply({"params": p}, wave, train=False) ** 2)

    g = jax.grad(lambda p: loss(p, enc))(params)
    g_m = jax.grad(lambda p: loss(p, enc_m))(params_m)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5),
        to_mixed_remat(g, 2), g_m)

    # converter roundtrip is exact
    rt = from_mixed_remat(params_m)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, rt)

    import pytest

    with pytest.raises(ValueError, match="divide"):
        Wav2Vec2Encoder(dataclasses.replace(cfg, remat_save_every=3),
                        remat=True).init(jax.random.key(0), wave,
                                         train=False)
