"""Multi-host utility behavior in the single-process degenerate case.

(`parallel/distributed.py` wraps jax multihost_utils; on one process the
contracts below are what callers rely on. Multi-process behavior runs only
on a real multi-host pod — the 8-virtual-device CPU mesh is still one
process.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtdsd_tpu.parallel.distributed import (all_gather_objects,
                                            broadcast_object,
                                            maybe_initialize_distributed,
                                            shared_random_seed)


def test_all_gather_single_process_identity():
    obj = {"names": ["a", "b"], "arr": np.arange(3)}
    out = all_gather_objects(obj)
    assert len(out) == 1 and out[0] is obj


def test_broadcast_single_process_identity():
    obj = ("x", 1)
    assert broadcast_object(obj) is obj


def test_shared_random_seed_is_int_in_range():
    s = shared_random_seed()
    assert isinstance(s, int) and 0 <= s < 2 ** 31


def test_maybe_initialize_distributed_no_env(monkeypatch):
    for var in ("JAX_COORDINATOR", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert maybe_initialize_distributed() is False


def test_grouped_conv_grad_multiaxis_mesh():
    """Regression for the XLA SPMD grouped-conv gradient bug.

    On a mesh with >1 axis (batch over 'data', a 'model' axis present),
    the partitioner multiplies a feature-grouped conv's kernel gradient
    by the model-axis size (forward stays correct, so losses match while
    training silently diverges). ops/groupedconv.py's per-group-loop and
    shift-multiply forms compute the identical math through partitioner-
    safe plain convolutions; this test pins both:
      1. the safe forms' gradients are correct on the multi-axis mesh;
      2. the model modules (pos_conv, conformer dw) use them.
    """
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from rtdsd_tpu.ops.groupedconv import depthwise_conv1d, grouped_conv1d

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(0)
    B, T, C, G, K = 8, 32, 16, 4, 8
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    wg = jnp.asarray(rng.standard_normal((K, C // G, C)) * 0.2, jnp.float32)
    wd = jnp.asarray(rng.standard_normal((K, 1, C)) * 0.2, jnp.float32)

    def loss_grouped(w, x):
        return jnp.sum(grouped_conv1d(x, w, None, groups=G,
                                      padding=((K // 2, K // 2 - 1),)) ** 2)

    def loss_dw(w, x):
        return jnp.sum(depthwise_conv1d(x, w, None,
                                        padding=(K // 2, K // 2 - 1)) ** 2)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "model"))
    for loss, w in [(loss_grouped, wg), (loss_dw, wd)]:
        g_ref = jax.jit(jax.grad(loss))(w, x)
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        ws = jax.device_put(w, NamedSharding(mesh, P()))
        g_sh = jax.jit(jax.grad(loss))(ws, xs)
        scale = float(jnp.abs(g_ref).max())
        np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                                   atol=2e-5 * max(scale, 1.0))

    # the equivalent-math check: safe forms == native grouped conv (fwd)
    native = jax.lax.conv_general_dilated(
        x, wg, (1,), ((K // 2, K // 2 - 1),),
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=G)
    safe = grouped_conv1d(x, wg, None, groups=G,
                          padding=((K // 2, K // 2 - 1),))
    np.testing.assert_allclose(np.asarray(safe), np.asarray(native),
                               atol=1e-5)
    native_dw = jax.lax.conv_general_dilated(
        x, wd, (1,), ((K // 2, K // 2 - 1),),
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=C)
    safe_dw = depthwise_conv1d(x, wd, None, padding=(K // 2, K // 2 - 1))
    np.testing.assert_allclose(np.asarray(safe_dw), np.asarray(native_dw),
                               atol=1e-5)
