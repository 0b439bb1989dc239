"""KD engine tests: tap resolution, criteria, weight copy, fused KD step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from rtdsd_tpu.engine.kd import (KD_CRITERIA, copy_teacher_weights,
                                 kl_div_loss, make_kd_train_step,
                                 normalize_tap_path)
from rtdsd_tpu.engine.steps import create_train_state, make_optimizer


def test_normalize_tap_path():
    assert normalize_tap_path("ssl_model.model.encoder.layers.5") == "ssl_hidden:5"
    assert normalize_tap_path("module.ssl_model.model.encoder.layers.11") == \
        "ssl_hidden:11"
    assert normalize_tap_path("ssl_model.model") == "ssl_model"
    assert normalize_tap_path("logits") == "logits"
    # bare reference AASIST/Conformer submodule names resolve under backend/
    assert normalize_tap_path("LL") == "backend/LL"
    assert normalize_tap_path("GAT_layer_S") == "backend/GAT_layer_S"
    assert normalize_tap_path("pool_hT2") == "backend/pool_hT2"
    assert normalize_tap_path("HtrgGAT_layer_ST21") == \
        "backend/HtrgGAT_layer_ST21"
    assert normalize_tap_path("out_layer") == "logits"
    assert normalize_tap_path("conformer.fc5") == "logits"
    assert normalize_tap_path("conformer.encoder_blocks.2") == \
        "backend/conformer/block_2"
    assert normalize_tap_path("encoder.3") == "backend/encoder_3"
    assert normalize_tap_path("encoder") == "backend/encoder_5"
    assert normalize_tap_path("attention") == "backend/att_conv2"
    # framework-native slash paths pass through
    assert normalize_tap_path("backend/pool_S") == "backend/pool_S"


def test_kl_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    s = rng.standard_normal((4, 2)).astype(np.float32)
    t = rng.standard_normal((4, 2)).astype(np.float32)
    T = 2.0
    want = (torch.nn.functional.kl_div(
        torch.log_softmax(torch.tensor(s) / T, dim=-1),
        torch.softmax(torch.tensor(t) / T, dim=-1),
        reduction="batchmean") * T * T).item()
    got = float(kl_div_loss(jnp.asarray(s), jnp.asarray(t), None,
                            temperature=T))
    assert abs(got - want) < 1e-5


def test_smooth_l1_matches_torch():
    torch = pytest.importorskip("torch")
    from rtdsd_tpu.engine.kd import smooth_l1_loss

    rng = np.random.default_rng(1)
    s = rng.standard_normal((4, 8)).astype(np.float32) * 2
    t = rng.standard_normal((4, 8)).astype(np.float32) * 2
    for beta in (1.0, 0.5):
        want = torch.nn.functional.smooth_l1_loss(
            torch.tensor(s), torch.tensor(t), beta=beta).item()
        got = float(smooth_l1_loss(jnp.asarray(s), jnp.asarray(t), None,
                                   beta=beta))
        assert abs(got - want) < 1e-6


def test_soft_ce_matches_torch():
    torch = pytest.importorskip("torch")
    from rtdsd_tpu.engine.kd import soft_ce_loss

    rng = np.random.default_rng(2)
    s = rng.standard_normal((4, 2)).astype(np.float32)
    t = rng.standard_normal((4, 2)).astype(np.float32)
    T = 3.0
    want = (torch.nn.functional.cross_entropy(
        torch.tensor(s) / T,
        torch.softmax(torch.tensor(t) / T, dim=-1)) * T * T).item()
    got = float(soft_ce_loss(jnp.asarray(s), jnp.asarray(t), None,
                             temperature=T))
    assert abs(got - want) < 1e-5


def test_attention_transfer_loss_properties():
    """AT loss: zero iff the normalized activation-energy maps agree
    (incl. scale invariance), positive otherwise; registry-dispatched."""
    from rtdsd_tpu.engine.kd import attention_transfer_loss, \
        get_mid_level_loss

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 9, 16)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((2, 9, 16)).astype(np.float32))
    assert float(attention_transfer_loss(x, x, None)) < 1e-12
    # per-position energy maps are L2-normalized -> scale invariant
    assert float(attention_transfer_loss(2.5 * x, x, None)) < 1e-10
    assert float(attention_transfer_loss(x, y, None)) > 1e-3
    fn, kwargs = get_mid_level_loss({"key": "ATLoss"})
    assert fn is attention_transfer_loss and kwargs == {}


def test_copy_teacher_weights_with_layer_subset():
    teacher = {
        "ssl_model": {"layers": {"layer": {
            "fc1": {"kernel": np.arange(24, dtype=np.float32).reshape(4, 3, 2)}}}},
        "backend": {"LL": {"kernel": np.ones((3, 2), np.float32)},
                    "other": {"kernel": np.ones((5, 5), np.float32)}},
    }
    student = {
        "ssl_model": {"layers": {"layer": {
            "fc1": {"kernel": np.zeros((2, 3, 2), np.float32)}}}},
        "backend": {"LL": {"kernel": np.zeros((3, 2), np.float32)},
                    "other": {"kernel": np.zeros((4, 4), np.float32)}},
    }
    out = copy_teacher_weights(student, teacher, layer_indices=[1, 3])
    np.testing.assert_array_equal(
        np.asarray(out["ssl_model"]["layers"]["layer"]["fc1"]["kernel"]),
        teacher["ssl_model"]["layers"]["layer"]["fc1"]["kernel"][[1, 3]])
    np.testing.assert_array_equal(out["backend"]["LL"]["kernel"],
                                  np.ones((3, 2)))
    # shape-mismatched leaf stays student-initialized (strict=False)
    np.testing.assert_array_equal(out["backend"]["other"]["kernel"],
                                  np.zeros((4, 4)))


def test_copy_teacher_weights_never_aliases_teacher_buffers():
    """Regression: the fused KD step donates the student state while the
    teacher params remain a live argument; a copied leaf that ALIASES a
    teacher buffer makes TPU execution fail with 'buffer previously
    donated in the same call' (donation is a no-op on CPU, which is why
    only device runs saw it). Every teacher-sourced leaf must be a fresh
    buffer."""
    teacher = {"backend": {"LL": {"kernel": jnp.ones((3, 2), jnp.float32)}}}
    student = {"backend": {"LL": {"kernel": jnp.zeros((3, 2), jnp.float32)}}}
    out = copy_teacher_weights(student, teacher)
    src = teacher["backend"]["LL"]["kernel"]
    dst = out["backend"]["LL"]["kernel"]
    np.testing.assert_array_equal(np.asarray(dst), np.asarray(src))
    assert dst is not src
    assert (dst.unsafe_buffer_pointer()
            != src.unsafe_buffer_pointer()), "copied leaf aliases teacher"


class _TinyNet(nn.Module):
    width: int = 8

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        f = x.reshape(x.shape[0], 10, -1).mean(-1)
        h = nn.Dense(self.width, name="LL")(f)
        h = jax.nn.selu(h)
        return nn.Dense(2, name="out_layer")(h)


def test_kd_step_trains_student_only():
    teacher = _TinyNet(width=16)
    student = _TinyNet(width=8)
    waves = jnp.asarray(np.random.default_rng(0).standard_normal(
        (4, 400)).astype(np.float32))
    labels = jnp.asarray([0, 1, 1, 0])

    t_vars = teacher.init(jax.random.key(0), waves)
    t_before = jax.tree_util.tree_map(np.asarray, t_vars["params"])
    tx = make_optimizer(1e-2, 0.0)
    state = create_train_state(student, jax.random.key(1), waves, tx)
    s_before = jax.tree_util.tree_map(np.asarray, state.params)

    kd_kwargs = {
        "ce_loss_weight": 1.0,
        "kd_criterions": [
            {"key": "KDLoss", "kwargs": {"student_module_path": "logits",
                                         "teacher_module_path": "logits",
                                         "temperature": 2.0}},
            {"key": "MSELoss", "kwargs": {"student_module_path": "out_layer",
                                          "teacher_module_path": "out_layer"}},
        ],
        "kd_criterion_weights": [0.5, 0.1],
    }
    step = make_kd_train_step(teacher, student, tx, kd_kwargs,
                              preemph=0.97, rawboost_algo=None)
    metrics = None
    for _ in range(3):
        state, metrics = step(state, t_vars, waves, labels, jax.random.key(2))

    assert np.isfinite(float(metrics["total_loss"]))
    assert "ce_loss" in metrics
    kd_keys = [k for k in metrics if k.startswith(("KDLoss", "MSELoss"))]
    assert len(kd_keys) == 2
    # student moved, teacher untouched
    assert not np.allclose(s_before["LL"]["kernel"],
                           np.asarray(state.params["LL"]["kernel"]))
    np.testing.assert_array_equal(t_before["LL"]["kernel"],
                                  np.asarray(t_vars["params"]["LL"]["kernel"]))


def test_kd_ssl_hidden_tap_end_to_end():
    """KD on XLSR per-layer hidden states through the scanned encoder."""
    from rtdsd_tpu.models.wav2vec2 import Wav2Vec2Config
    from rtdsd_tpu.models.zoo import XLSR_Conformer

    cfg_t = Wav2Vec2Config(conv_layers=((8, 10, 5), (8, 2, 2)),
                           encoder_embed_dim=8, encoder_ffn_dim=16,
                           encoder_heads=2, encoder_layers=3, conv_pos=4,
                           conv_pos_groups=2)
    cfg_s = Wav2Vec2Config(conv_layers=((8, 10, 5), (8, 2, 2)),
                           encoder_embed_dim=8, encoder_ffn_dim=16,
                           encoder_heads=2, encoder_layers=2, conv_pos=4,
                           conv_pos_groups=2)
    teacher = XLSR_Conformer(w2v_cfg=cfg_t, emb_size=8, heads=2,
                             kernel_size=5, n_encoders=1)
    student = XLSR_Conformer(w2v_cfg=cfg_s, emb_size=8, heads=2,
                             kernel_size=5, n_encoders=1)
    waves = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 400)).astype(np.float32))
    labels = jnp.asarray([0, 1])

    t_vars = teacher.init(jax.random.key(0), waves)
    tx = make_optimizer(1e-3, 0.0)
    state = create_train_state(student, jax.random.key(1), waves, tx)

    kd_kwargs = {
        "ce_loss_weight": 1.0,
        "kd_criterions": [{"key": "MSELoss", "kwargs": {
            # reference-style torch module paths (main_kd.py kd_kwargs)
            "student_module_path": "ssl_model.model.encoder.layers.1",
            "teacher_module_path": "ssl_model.model.encoder.layers.2"}}],
        "kd_criterion_weights": [1.0],
    }
    step = make_kd_train_step(teacher, student, tx, kd_kwargs, preemph=None)
    state, metrics = step(state, t_vars, waves, labels, jax.random.key(3))
    assert np.isfinite(float(metrics["total_loss"]))
    assert any(k.startswith("MSELoss_ssl_hidden:1") for k in metrics)


def test_kd_aasist_submodule_taps_reference_paths():
    """A reference-shaped kd_kwargs tapping AASIST graph modules by their
    bare torch attribute names (the ref KDTrainer hook schema,
    /root/reference/trainer.py:176-195) resolves and trains."""
    from rtdsd_tpu.models.wav2vec2 import Wav2Vec2Config
    from rtdsd_tpu.models.zoo import XLSR_AASIST

    cfg = Wav2Vec2Config(conv_layers=((8, 10, 5), (8, 2, 2)),
                         encoder_embed_dim=8, encoder_ffn_dim=16,
                         encoder_heads=2, encoder_layers=2, conv_pos=4,
                         conv_pos_groups=2)
    teacher = XLSR_AASIST(w2v_cfg=cfg)
    student = XLSR_AASIST(w2v_cfg=cfg)
    # enough samples that the AASIST pools keep >= 1 node
    waves = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 4000)).astype(np.float32))
    labels = jnp.asarray([0, 1])

    t_vars = teacher.init(jax.random.key(0), waves)
    tx = make_optimizer(1e-3, 0.0)
    state = create_train_state(student, jax.random.key(1), waves, tx)
    s_before = jax.tree_util.tree_map(np.asarray, state.params)

    kd_kwargs = {
        "ce_loss_weight": 1.0,
        "kd_criterions": [
            {"key": "MSELoss", "kwargs": {
                "student_module_path": "GAT_layer_S",
                "teacher_module_path": "GAT_layer_S"}},
            {"key": "L1Loss", "kwargs": {
                "student_module_path": "pool_hT2",
                "teacher_module_path": "pool_hT2"}},
            {"key": "CosineLoss", "kwargs": {
                "student_module_path": "LL",
                "teacher_module_path": "LL"}},
        ],
        "kd_criterion_weights": [1.0, 0.5, 0.2],
    }
    step = make_kd_train_step(teacher, student, tx, kd_kwargs, preemph=None)
    state, metrics = step(state, t_vars, waves, labels, jax.random.key(3))
    assert np.isfinite(float(metrics["total_loss"]))
    assert any(k.startswith("MSELoss_backend/GAT_layer_S") for k in metrics)
    assert any(k.startswith("L1Loss_backend/pool_hT2") for k in metrics)
    assert any(k.startswith("CosineLoss_backend/LL") for k in metrics)
    # the KD gradient actually reached the student's graph modules
    assert not np.allclose(
        s_before["backend"]["GAT_layer_S"]["att_proj"]["kernel"],
        np.asarray(state.params["backend"]["GAT_layer_S"]["att_proj"]["kernel"]))


def test_kd_criteria_torch_names_stay_registered():
    """The reference dispatches criteria by torchdistill/torch class name
    (``/root/reference/trainer.py:263``); a rename here would silently break
    every reference KD YAML. Pin the torch-compatible names AND that each
    alias resolves to the same callable as its canonical name."""
    torch_names = ["MSELoss", "L1Loss", "SmoothL1Loss", "HuberLoss",
                   "CosineLoss", "KDLoss", "KLDivLoss", "CrossEntropyLoss"]
    for name in torch_names:
        assert name in KD_CRITERIA, f"torch-name criterion {name} missing"
    assert KD_CRITERIA["mse"] is KD_CRITERIA["MSELoss"]
    assert KD_CRITERIA["HuberLoss"] is KD_CRITERIA["SmoothL1Loss"]
    assert KD_CRITERIA["logits_kd"] is KD_CRITERIA["KDLoss"]
    assert KD_CRITERIA["KLDivLoss"] is KD_CRITERIA["KDLoss"]
    assert KD_CRITERIA["soft_ce"] is KD_CRITERIA["CrossEntropyLoss"]
    assert KD_CRITERIA["attention_transfer"] is KD_CRITERIA["ATLoss"]
