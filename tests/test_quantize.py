"""Weight-only int8 (w8) serving path: W8Dense math + full-tree conversion."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rtdsd_tpu.models.quantize import (quantize_encoder_params,
                                       quantize_variables, w8_bytes_saved)
from rtdsd_tpu.models.wav2vec2 import W8Dense, Wav2Vec2Config, Wav2Vec2Encoder

TINY = Wav2Vec2Config(
    conv_layers=((64, 10, 5), (64, 3, 2), (64, 2, 2)),
    encoder_embed_dim=64, encoder_ffn_dim=128, encoder_heads=4,
    encoder_layers=3, conv_pos=16, conv_pos_groups=4)


def test_w8dense_matches_dequant_oracle():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((5, 16)), jnp.float32)
    vals = jnp.asarray(rng.integers(-128, 128, (16, 8)), jnp.int8)
    scales = jnp.asarray(rng.uniform(0.01, 0.1, (1, 8)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(8), jnp.float32)
    out = W8Dense(8).apply(
        {"params": {"vals": vals, "scales": scales, "bias": bias}}, x)
    oracle = x @ (vals.astype(jnp.float32) * scales) + bias
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle),
                               rtol=1e-5, atol=1e-5)


def test_w8_encoder_close_to_f32():
    wave = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 3200)) * 0.2,
        jnp.float32)
    f32 = Wav2Vec2Encoder(TINY)
    variables = f32.init(jax.random.key(0), wave)
    ref = f32.apply(variables, wave)

    w8_model = Wav2Vec2Encoder(dataclasses.replace(TINY, w8=True))
    qvars = quantize_variables(variables)
    out = w8_model.apply(qvars, wave)

    assert out.shape == ref.shape
    ref_n, out_n = np.asarray(ref), np.asarray(out)
    # weight-only per-column int8 keeps activations close; compare rel error
    rel = np.linalg.norm(out_n - ref_n) / np.linalg.norm(ref_n)
    assert rel < 0.05, f"w8 rel error {rel:.4f}"
    # and the quantized tree actually stores int8 stacked kernels
    lyr = qvars["params"]["layers"]["layer"]
    assert lyr["fc1"]["vals"].dtype == jnp.int8
    assert lyr["fc1"]["vals"].shape == (3, 64, 128)
    assert lyr["fc1"]["scales"].shape == (3, 1, 128)
    assert "kernel" not in lyr["fc1"]


def test_w8_param_structure_matches_model_init():
    """The converted tree must be apply-able: same structure as w8 init."""
    wave = jnp.zeros((1, 3200), jnp.float32)
    f32 = Wav2Vec2Encoder(TINY)
    variables = f32.init(jax.random.key(0), wave)
    qparams = quantize_encoder_params(variables["params"])

    w8_model = Wav2Vec2Encoder(dataclasses.replace(TINY, w8=True))
    w8_init = w8_model.init(jax.random.key(0), wave)["params"]
    paths_q = {jax.tree_util.keystr(p)
               for p, _ in jax.tree_util.tree_flatten_with_path(qparams)[0]}
    paths_i = {jax.tree_util.keystr(p)
               for p, _ in jax.tree_util.tree_flatten_with_path(w8_init)[0]}
    assert paths_q == paths_i


def test_w8_bytes_saved_counts_only_transformer_matmuls():
    wave = jnp.zeros((1, 3200), jnp.float32)
    variables = Wav2Vec2Encoder(TINY).init(jax.random.key(0), wave)
    saved = w8_bytes_saved(variables["params"])
    # 3 layers x (4 * 64*64 + 2 * 64*128) params
    assert saved == 3 * (4 * 64 * 64 + 2 * 64 * 128)


def test_quantize_rejects_tree_without_matmuls():
    import pytest

    with pytest.raises(ValueError):
        quantize_encoder_params({"backend": {"fc1": {"kernel":
                                 jnp.zeros((4, 4))}}})


def test_quantize_handles_frozendict():
    import flax.core

    wave = jnp.zeros((1, 3200), jnp.float32)
    variables = Wav2Vec2Encoder(TINY).init(jax.random.key(0), wave)
    frozen = flax.core.freeze(variables["params"])
    q = quantize_encoder_params(frozen)
    assert q["layers"]["layer"]["fc1"]["vals"].dtype == jnp.int8


def test_w8a8dense_matches_dequant_oracle():
    from rtdsd_tpu.models.wav2vec2 import W8A8Dense

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((5, 16)), jnp.float32)
    vals = jnp.asarray(rng.integers(-128, 128, (16, 8)), jnp.int8)
    scales = jnp.asarray(rng.uniform(0.01, 0.1, (1, 8)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(8), jnp.float32)
    out = W8A8Dense(8).apply(
        {"params": {"vals": vals, "scales": scales, "bias": bias}}, x)
    amax = np.abs(np.asarray(x)).max(-1, keepdims=True)
    xq = np.round(np.asarray(x) * 127.0 / amax)
    oracle = (xq @ np.asarray(vals, np.float32)) * (amax / 127.0) \
        * np.asarray(scales) + np.asarray(bias)
    np.testing.assert_allclose(np.asarray(out), oracle, rtol=1e-5, atol=1e-5)


def test_w8a8_encoder_close_to_f32():
    """Full dynamic-quant path: output drift bounded and score-usable."""
    wave = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 3200)) * 0.2,
        jnp.float32)
    model = Wav2Vec2Encoder(TINY)
    variables = model.init(jax.random.key(0), wave)
    ref = model.apply(variables, wave)
    qvars = quantize_variables(variables)
    a8_model = Wav2Vec2Encoder(dataclasses.replace(TINY, w8=True, a8=True))
    out = a8_model.apply(qvars, wave)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.10, f"w8a8 rel error {rel:.4f}"


def test_w8a8_uses_same_tree_as_w8():
    wave = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 1600)) * 0.2,
        jnp.float32)
    model = Wav2Vec2Encoder(TINY)
    qvars = quantize_variables(model.init(jax.random.key(0), wave))
    a8_init = Wav2Vec2Encoder(
        dataclasses.replace(TINY, w8=True, a8=True)).init(
        jax.random.key(0), wave)["params"]
    got = {p for p, _ in
           jax.tree_util.tree_flatten_with_path(qvars["params"])[0]}
    want = {p for p, _ in jax.tree_util.tree_flatten_with_path(a8_init)[0]}
    assert got == want
