"""Pallas kernel equivalence tests (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from rtdsd_tpu.models.aasist import AASISTBackend, GraphAttentionLayer
from rtdsd_tpu.ops.pallas.gat import fused_gat_aggregate




def test_fused_gat_matches_einsum(rng):
    b, n, d, do = 3, 11, 16, 8
    x = rng.standard_normal((b, n, d)).astype(np.float32)
    k = (rng.standard_normal((d, do)) * 0.3).astype(np.float32)
    bias = (rng.standard_normal(do) * 0.1).astype(np.float32)
    a = (rng.standard_normal((do, 1)) * 0.3).astype(np.float32)
    temp = 2.0

    got = np.asarray(fused_gat_aggregate(
        jnp.asarray(x), jnp.asarray(k), jnp.asarray(bias), jnp.asarray(a),
        temperature=temp, interpret=True))

    # oracle: the layer's einsum path semantics (softmax over torch dim=-2)
    att = np.tanh(x[:, :, None, :] * x[:, None, :, :] @ k + bias)
    s = (att @ a) / temp                              # (B, i, j, 1)
    e = np.exp(s - s.max(axis=-2, keepdims=True))
    soft = (e / e.sum(axis=-2, keepdims=True))[..., 0]
    want = np.einsum("bij,bjd->bid", soft, x)

    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gat_layer_fused_matches_unfused(rng):
    x = jnp.asarray(rng.standard_normal((2, 12, 24)).astype(np.float32))
    plain = GraphAttentionLayer(out_dim=16, temperature=2.0, fused=False)
    fused = GraphAttentionLayer(out_dim=16, temperature=2.0, fused=True)
    variables = plain.init(jax.random.key(0), x, train=False)
    a = plain.apply(variables, x, train=False)
    b = fused.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                               atol=1e-5)


def test_backend_fused_matches_unfused(rng):
    feats = jnp.asarray(rng.standard_normal((2, 60, 64)).astype(np.float32)
                        * 0.1)
    plain = AASISTBackend(fused_gat=False)
    fused = AASISTBackend(fused_gat=True)
    variables = plain.init(jax.random.key(0), feats, train=False)
    a = plain.apply(variables, feats, train=False)
    b = fused.apply(variables, feats, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                               atol=2e-4)


def test_fused_htrg_matches_einsum(rng):
    from rtdsd_tpu.models.aasist import HtrgGraphAttentionLayer

    x1 = jnp.asarray(rng.standard_normal((2, 9, 16)).astype(np.float32))
    x2 = jnp.asarray(rng.standard_normal((2, 5, 16)).astype(np.float32))
    master = jnp.ones((1, 1, 16))
    plain = HtrgGraphAttentionLayer(16, 8, temperature=100.0, fused=False)
    fused = HtrgGraphAttentionLayer(16, 8, temperature=100.0, fused=True)
    variables = plain.init(jax.random.key(0), x1, x2, master, train=False)
    a1, a2, am = plain.apply(variables, x1, x2, master, train=False)
    b1, b2, bm = fused.apply(variables, x1, x2, master, train=False)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(b1), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(b2), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(am), np.asarray(bm), rtol=1e-4,
                               atol=1e-5)


def test_int8_quantize_roundtrip(rng):
    from rtdsd_tpu.ops.pallas.quant import (dequantize_int8, quantize_int8,
                                            quantized_matmul)

    w = rng.standard_normal((64, 32)).astype(np.float32) * 0.1
    vals, scales = quantize_int8(jnp.asarray(w), interpret=True)
    assert np.asarray(vals).dtype == np.int8
    assert scales.shape == (1, 32)
    back = np.asarray(dequantize_int8(vals, scales))
    # round-to-nearest error bound: half a quantization step per element
    # (tiny slack for float32 divide/round at the half-step boundary)
    assert np.all(np.abs(back - w) <= np.asarray(scales) / 2 * 1.01 + 1e-6)

    x = rng.standard_normal((4, 64)).astype(np.float32)
    got = np.asarray(quantized_matmul(jnp.asarray(x), vals, scales))
    want = x @ back
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # and close to the unquantized matmul
    rel = np.abs(got - x @ w).max() / (np.abs(x @ w).max() + 1e-9)
    assert rel < 0.05


class TestSmallTAttention:
    """ops/pallas/attention.py — fused small-T MHA (interpret mode on CPU).

    TPU measurement (tools, b128/T199/H16/D64): 20.2 us/clip vs XLA
    dot_product_attention's 17.7 — both are softmax-exp-bound at this tiny
    sequence length, so the kernel ships as an option but is not the
    encoder default.
    """

    def test_matches_xla_dpa(self):
        import numpy as np

        from rtdsd_tpu.ops.pallas.attention import mha_small_t

        rng = np.random.default_rng(0)
        for (b, t, h, d) in [(2, 199, 16, 64), (3, 50, 4, 32), (1, 16, 2, 8)]:
            q, k, v = (jnp.asarray(rng.standard_normal((b, t, h, d)),
                                   jnp.float32) * 0.3 for _ in range(3))
            want = jax.nn.dot_product_attention(q, k, v)
            got = mha_small_t(q, k, v, interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-6)

    def test_custom_scale(self):
        import numpy as np

        from rtdsd_tpu.ops.pallas.attention import mha_small_t

        rng = np.random.default_rng(1)
        q, k, v = (jnp.asarray(rng.standard_normal((2, 24, 2, 16)),
                               jnp.float32) for _ in range(3))
        want = jax.nn.dot_product_attention(q, k, v, scale=0.5)
        got = mha_small_t(q, k, v, scale=0.5, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-6)


class TestConvStack:
    """ops/pallas/convstack.py — fused conv+LN+GELU (interpret mode).

    TPU verdict: XLA wins at batch on this toolchain (see module
    docstring); the kernels stay as a tested stencil reference and are
    not wired into the encoder.
    """

    def _frontend(self, cfg, wave_n, seed=0):
        from rtdsd_tpu.models.wav2vec2 import ConvFeatureExtractor

        model = ConvFeatureExtractor(cfg, jnp.float32)
        rng = np.random.default_rng(seed)
        wave = jnp.asarray(rng.standard_normal((2, wave_n)) * 0.3,
                           jnp.float32)
        v = model.init(jax.random.key(0), wave)
        lp = [{"conv": v["params"][f"conv_{i}"], "ln": v["params"][f"ln_{i}"]}
              for i in range(len(cfg.conv_layers))]
        return model, v, lp, wave

    def test_full_xlsr_geometry_matches_module(self):
        from rtdsd_tpu.models.wav2vec2 import Wav2Vec2Config
        from rtdsd_tpu.ops.pallas.convstack import (fused_conv_frontend,
                                                    supports_fused)

        cfg = Wav2Vec2Config()
        assert supports_fused(cfg.conv_layers, cfg.extractor_mode)
        model, v, lp, wave = self._frontend(cfg, 8000)
        want = model.apply(v, wave)
        got = fused_conv_frontend(wave, lp, cfg.conv_layers,
                                  dtype=jnp.float32, interpret=True)
        assert got.shape == want.shape
        # the kernel keeps the rational-erf GELU (its point is speed) while
        # the f32 module path now uses exact erf (fast GELU is gated to
        # (b)f16, ADVICE r1); ~4e-6 per-GELU error compounds over 7 layers
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-4)

    def test_three_layer_geometry(self):
        from rtdsd_tpu.models.wav2vec2 import Wav2Vec2Config
        from rtdsd_tpu.ops.pallas.convstack import fused_conv_frontend

        cfg = Wav2Vec2Config(
            conv_layers=((128, 10, 5), (128, 3, 2), (128, 2, 2)))
        model, v, lp, wave = self._frontend(cfg, 4000)
        want = model.apply(v, wave)
        got = fused_conv_frontend(wave, lp, cfg.conv_layers,
                                  dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-4)  # rational-erf vs exact erf

    def test_supports_fused_gates(self):
        from rtdsd_tpu.ops.pallas.convstack import supports_fused

        ok = ((512, 10, 5), (512, 3, 2))
        assert supports_fused(ok, "layer_norm")
        assert not supports_fused(ok, "group_norm")
        # k > 2s after layer 0
        assert not supports_fused(((512, 10, 5), (512, 5, 2)), "layer_norm")
        # cin not lane-aligned
        assert not supports_fused(((100, 10, 5), (100, 3, 2)), "layer_norm")


def test_convstack_supports_fused_gates_stride_and_bias():
    """Geometry/feature gating of the fused front-end path."""
    import dataclasses

    from rtdsd_tpu.models.wav2vec2 import ConvFeatureExtractor, Wav2Vec2Config
    from rtdsd_tpu.ops.pallas.convstack import (fused_conv_frontend,
                                                supports_fused)

    # mid-stack stride that does not divide 8 is rejected (chained array
    # lengths are multiples of 8, so T % s would fail at runtime)
    assert not supports_fused(((640, 10, 5), (640, 5, 5)), "layer_norm")
    assert supports_fused(((512, 10, 5), (512, 3, 2)), "layer_norm")

    # bias-less front-end runs (zeros substituted)
    cfg = Wav2Vec2Config(
        conv_layers=((128, 10, 5), (128, 3, 2)), conv_bias=False)
    assert supports_fused(cfg.conv_layers, cfg.extractor_mode)
    model = ConvFeatureExtractor(cfg, jnp.float32)
    wave = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 2000)).astype(np.float32) * 0.3)
    v = model.init(jax.random.key(0), wave)
    lp = [{"conv": v["params"][f"conv_{i}"], "ln": v["params"][f"ln_{i}"]}
          for i in range(2)]
    want = model.apply(v, wave)
    got = fused_conv_frontend(wave, lp, cfg.conv_layers, dtype=jnp.float32,
                              interpret=True)
    # rational-erf (kernel) vs exact erf (f32 module path, ADVICE r1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4)
