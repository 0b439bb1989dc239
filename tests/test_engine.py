"""Engine tests: loss parity, train/eval/score steps, checkpointing, sharding.

Runs on a tiny stand-in model (small XLSR + AASIST back-end would be too slow
to compile per-test on this box, so steps are exercised with a minimal flax
model; full-model integration is covered by test_integration.py)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import linen as nn

from rtdsd_tpu.engine.checkpoint import (restore_checkpoint, save_checkpoint,
                                         save_params_only, load_params_only)
from rtdsd_tpu.engine.steps import (create_train_state, make_eval_step,
                                    make_optimizer, make_score_step,
                                    make_train_step, pick_rawboost_algo,
                                    post_device_augs,
                                    weighted_cross_entropy)


class TinyModel(nn.Module):
    """Waveform (B, T) -> logits (B, 2), with BN + dropout to exercise modes."""

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        f = x.reshape(x.shape[0], 10, -1).mean(-1)
        h = nn.Dense(8)(f)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        h = jax.nn.selu(h)
        h = nn.Dropout(0.1, deterministic=not train)(h)
        return nn.Dense(2)(h)


def test_weighted_ce_matches_torch_semantics():
    torch = pytest.importorskip("torch")
    logits = np.random.default_rng(0).standard_normal((6, 2)).astype(np.float32)
    labels = np.array([0, 1, 1, 0, 1, 0])
    want = torch.nn.CrossEntropyLoss(
        weight=torch.tensor([0.9, 0.1]))(torch.tensor(logits),
                                         torch.tensor(labels)).item()
    got = float(weighted_cross_entropy(jnp.asarray(logits),
                                       jnp.asarray(labels), (0.9, 0.1)))
    assert abs(got - want) < 1e-5


def test_rawboost_algo_selection():
    # first match in 1..8 wins (ref train_set.py:114-115)
    assert pick_rawboost_algo(["ACN", "RawBoost4"]) == 4
    assert pick_rawboost_algo(["RawBoost3", "RawBoost1"]) == 1
    assert pick_rawboost_algo(["ACN"]) is None
    assert post_device_augs(["ACN", "RawBoost4", "HPF"], True) == \
        ("ACN", "HPF")


@pytest.fixture(scope="module")
def tiny_setup():
    model = TinyModel()
    tx = make_optimizer(1e-3, 1e-4)
    waves = jnp.asarray(np.random.default_rng(0).standard_normal(
        (4, 400)).astype(np.float32))
    state = create_train_state(model, jax.random.key(0), waves, tx)
    return model, tx, state, waves


def test_train_step_learns(tiny_setup):
    model, tx, state, waves = tiny_setup
    labels = jnp.asarray([0, 1, 0, 1])
    tx = make_optimizer(1e-2, 0.0)
    state = create_train_state(model, jax.random.key(0), waves, tx)
    step = make_train_step(model, tx, preemph=0.97, rawboost_algo=None,
                           aug_list=(), donate=False)
    losses = []
    for i in range(20):
        state, metrics = step(state, waves, labels, jax.random.key(1))
        losses.append(float(metrics["loss"]))
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
    assert int(state.step) == 20


def test_train_step_with_full_aug_pipeline(tiny_setup):
    model, tx, state, waves = tiny_setup
    labels = jnp.asarray([0, 1, 0, 1])
    step = make_train_step(model, tx, preemph=0.97, rawboost_algo=4,
                           aug_list=("ACN", "GAN"), donate=False)
    state2, metrics = step(state, waves, labels, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))


def test_eval_and_score_steps(tiny_setup):
    model, _tx, state, waves = tiny_setup
    labels = jnp.asarray([0, 1, 0, 1])
    ev = make_eval_step(model, preemph=0.97)
    out = ev(state.params, state.batch_stats, waves, labels)
    assert out["correct"].shape == (4,)
    assert out["scores"].shape == (4,)

    sc = make_score_step(model)
    scores = sc(state.params, state.batch_stats, waves)
    # score step skips pre-emphasis => differs from eval scores
    assert scores.shape == (4,)
    assert not np.allclose(np.asarray(scores), np.asarray(out["scores"]))


def test_freeze_patterns(tiny_setup):
    model, _, _, waves = tiny_setup
    tx = make_optimizer(1e-2, 0.0, freeze_patterns=["Dense_0"])
    state = create_train_state(model, jax.random.key(0), waves, tx)
    before = jax.tree_util.tree_map(np.asarray, state.params)
    step = make_train_step(model, tx, preemph=None, donate=False)
    state, _ = step(state, waves, jnp.asarray([0, 1, 0, 1]), jax.random.key(2))
    after = state.params
    np.testing.assert_array_equal(before["Dense_0"]["kernel"],
                                  np.asarray(after["Dense_0"]["kernel"]))
    assert not np.allclose(before["Dense_1"]["kernel"],
                           np.asarray(after["Dense_1"]["kernel"]))


def test_checkpoint_roundtrip(tmp_path, tiny_setup):
    model, tx, state, waves = tiny_setup
    step = make_train_step(model, tx, preemph=None, donate=False)
    state, _ = step(state, waves, jnp.asarray([0, 1, 0, 1]), jax.random.key(3))

    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, meta={"epoch": 3, "dev_loss": 0.5})
    fresh = create_train_state(model, jax.random.key(42), waves, tx)
    restored = restore_checkpoint(path, fresh)
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state restored too (full resume, unlike reference)
    for a, b in zip(jax.tree_util.tree_leaves(restored.opt_state),
                    jax.tree_util.tree_leaves(state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    wpath = str(tmp_path / "weights")
    save_params_only(wpath, state.params, state.batch_stats)
    p, bs = load_params_only(wpath, fresh.params, fresh.batch_stats)
    np.testing.assert_array_equal(
        np.asarray(p["Dense_1"]["kernel"]),
        np.asarray(state.params["Dense_1"]["kernel"]))


def test_multi_device_dp_sharding(tiny_setup):
    """Data-parallel SPMD on the 8-device CPU mesh: sharded batch in,
    replicated grads out — same result as single device."""
    from rtdsd_tpu.parallel.mesh import batch_sharding, make_mesh, shard_params

    model, tx, state, waves = tiny_setup
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import optax

    mesh = make_mesh(data=8)
    bs = batch_sharding(mesh)
    labels = jnp.asarray([0, 1, 0, 1] * 2)
    waves8 = jnp.concatenate([waves, waves])
    # plain SGD: Adam's first-step normalization amplifies epsilon-level
    # reduction-order differences to +-lr, which is not what we're testing
    tx = optax.sgd(1e-2)
    state = create_train_state(model, jax.random.key(0), waves, tx)
    step = make_train_step(model, tx, preemph=0.97, donate=False)

    # single-device result
    s1, m1 = step(state, waves8, labels, jax.random.key(1))
    # sharded result
    params_sh = shard_params(state.params, mesh, "dp")
    state_sh = state.replace(params=params_sh)
    waves_sh = jax.device_put(waves8, bs)
    labels_sh = jax.device_put(labels, bs)
    s2, m2 = step(state_sh, waves_sh, labels_sh, jax.random.key(1))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_sharding_rules():
    from jax.sharding import PartitionSpec as P

    from rtdsd_tpu.parallel.mesh import make_mesh, sharding_for_tree

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(data=2, model=4)
    tree = {
        "layers": {"layer": {
            "fc1": {"kernel": np.zeros((4, 64, 128), np.float32)},
            "fc2": {"kernel": np.zeros((4, 128, 64), np.float32)},
        }},
        "small": {"bias": np.zeros((8,), np.float32)},
        "big": {"kernel": np.zeros((512, 512), np.float32)},
    }
    sh = sharding_for_tree(tree, mesh, "tp")
    assert sh["layers"]["layer"]["fc1"]["kernel"].spec == P(None, None, "model")
    assert sh["layers"]["layer"]["fc2"]["kernel"].spec == P(None, "model", None)
    assert sh["small"]["bias"].spec == P()
    sh = sharding_for_tree(tree, mesh, "fsdp+tp")
    assert sh["big"]["kernel"].spec == P("data", None)


def test_async_checkpoint_roundtrip(tmp_path, tiny_setup):
    from rtdsd_tpu.engine.checkpoint import (restore_checkpoint_any,
                                             save_checkpoint_async)

    model, tx, state, waves = tiny_setup
    path = str(tmp_path / "async_ckpt")
    handle = save_checkpoint_async(path, state, meta={"epoch": 1})
    handle.wait_until_finished()
    fresh = create_train_state(model, jax.random.key(9), waves, tx)
    restored = restore_checkpoint_any(path, fresh)
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ------------------------------------------- partial freeze / re-init (ref
# fe.py:26-40 + xlsr_aasist.py:10-21: freeze target-not-nontarget, Xavier
# re-init non_target + partial_freeze_init_layers after SSL load)

def _sgd_with_masks(freeze, unfreeze):
    from rtdsd_tpu.engine.steps import make_optimizer

    return make_optimizer(1.0, 0.0, freeze, unfreeze)


def test_partial_freeze_plain_and_exception():
    params = {"feature_extractor": {"conv_0": {"kernel": jnp.ones((2, 2))}},
              "post_extract_proj": {"kernel": jnp.ones((2, 2))}}
    tx = _sgd_with_masks(["feature_extractor"], ["conv_0"])
    st = tx.init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    up, _ = tx.update(g, st, params)
    # conv_0 matches the freeze pattern but also the unfreeze exception
    assert float(jnp.abs(up["feature_extractor"]["conv_0"]["kernel"]).sum()) > 0
    assert float(jnp.abs(up["post_extract_proj"]["kernel"]).sum()) > 0


def test_partial_freeze_layer_indexed_on_stacked_leaf():
    # stacked (L=4, in, out) leaf like the scanned transformer params
    params = {"layers": {"layer": {"fc1": {"kernel": jnp.ones((4, 3, 3))}}}}
    g = jax.tree_util.tree_map(jnp.ones_like, params)

    # freeze layers.1 and layers.3 only
    tx = _sgd_with_masks(["layers.1", "layers.3"], [])
    up, _ = tx.update(g, tx.init(params), params)
    k = np.asarray(up["layers"]["layer"]["fc1"]["kernel"])
    assert np.abs(k[0]).sum() > 0 and np.abs(k[2]).sum() > 0
    assert np.abs(k[1]).sum() == 0 and np.abs(k[3]).sum() == 0

    # freeze ALL layers except layers.2 (plain freeze + indexed unfreeze)
    tx = _sgd_with_masks(["layers"], ["layers.2"])
    up, _ = tx.update(g, tx.init(params), params)
    k = np.asarray(up["layers"]["layer"]["fc1"]["kernel"])
    assert np.abs(k[2]).sum() > 0
    assert np.abs(k[0]).sum() == np.abs(k[1]).sum() == np.abs(k[3]).sum() == 0


def test_reinit_params_plain_and_indexed():
    from rtdsd_tpu.engine.steps import reinit_params

    params = {"pos_conv": {"conv": {"kernel": jnp.zeros((2, 4)),
                                    "bias": jnp.zeros((4,))}},
              "layers": {"layer": {"fc1": {"kernel": jnp.zeros((4, 3, 3))}}}}
    out = reinit_params(params, ["pos_conv", "layers.2"], jax.random.key(0))
    # matched >=2-D param re-inited; 1-D bias untouched (ref dim>=2 guard)
    assert float(jnp.abs(out["pos_conv"]["conv"]["kernel"]).sum()) > 0
    assert float(jnp.abs(out["pos_conv"]["conv"]["bias"]).sum()) == 0
    k = np.asarray(out["layers"]["layer"]["fc1"]["kernel"])
    assert np.abs(k[2]).sum() > 0  # only the indexed slice
    assert np.abs(k[0]).sum() == np.abs(k[1]).sum() == np.abs(k[3]).sum() == 0


def test_async_checkpoint_prev_fallback(tmp_path, tiny_setup):
    """A crash between dir-swap and commit must leave .prev restorable."""
    import shutil

    from rtdsd_tpu.engine.checkpoint import (restore_checkpoint_any,
                                             save_checkpoint_async)

    model, tx, state, waves = tiny_setup
    path = str(tmp_path / "ck")
    save_checkpoint_async(path, state, meta={"epoch": 1}).wait_until_finished()
    s2 = state.replace(step=state.step + 7)
    save_checkpoint_async(path, s2, meta={"epoch": 2}).wait_until_finished()
    orbax_dir = os.path.join(path, "orbax")
    if not os.path.isdir(orbax_dir):
        import pytest

        pytest.skip("orbax fallback path (msgpack) in use")
    # second save must have preserved the first as .prev until commit;
    # simulate the crash window: new save vanished, .prev remains
    assert os.path.isdir(orbax_dir + ".prev")
    shutil.rmtree(orbax_dir)
    fresh = create_train_state(model, jax.random.key(9), waves, tx)
    restored = restore_checkpoint_any(path, fresh)
    assert int(restored.step) == int(state.step)  # epoch-1 state recovered


def test_shard_state_preserves_optimizer_moments():
    """fsdp/tp placement must NOT reset restored Adam moments (exact
    resume); moments get the param shardings, count stays replicated."""
    import optax

    from rtdsd_tpu.cli.common import shard_state
    from rtdsd_tpu.engine.steps import TrainState, make_optimizer
    from rtdsd_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    params = {"big": {"kernel": jnp.ones((1024, 256))}, "b": jnp.ones((3,))}
    tx = make_optimizer(1e-3, 1e-4)
    opt = optax.tree_map_params(tx, lambda x: x + 1.0, tx.init(params))
    st = TrainState(step=jnp.int32(5), params=params, batch_stats={},
                    opt_state=opt)
    mesh = make_mesh(data=8)
    out = shard_state(st, mesh, tx, "fsdp")
    mu = out.opt_state[0].mu
    assert float(mu["big"]["kernel"][0, 0]) == 1.0  # warm moment kept
    assert mu["big"]["kernel"].sharding.spec == \
        out.params["big"]["kernel"].sharding.spec
    # dp mode: fully replicated, state values unchanged
    out_dp = shard_state(st, mesh, tx, "dp")
    assert float(out_dp.opt_state[0].mu["big"]["kernel"][0, 0]) == 1.0
