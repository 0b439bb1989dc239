"""Forward parity vs the REFERENCE'S OWN torch modules as oracles.

Unlike the re-derived oracles elsewhere in the suite, these tests import
``/root/reference/models/aasist_modules.py`` (torch-only, no fairseq needed)
and ``/root/reference/models/xlsr_aasist.py`` (with ``fe`` stubbed out at the
package level) and assert that the converted flax modules reproduce the
reference's actual forward pass:

- each AASIST graph module (GraphAttentionLayer, HtrgGraphAttentionLayer,
  GraphPool, Residual_block) randomly initialized, state_dict converted via
  :mod:`rtdsd_tpu.models.convert_fairseq` primitives, eval-mode forward
  compared to ~1e-5;
- the FULL ``XLSR_AASIST`` backend composition
  (/root/reference/models/xlsr_aasist.py:86-177) with a fixed-feature SSL
  stub, including the ``out_S1 + 1`` quirk (:138), ``pos_S`` placement
  (:107-110), and the BatchNorm1d reshape semantics
  (aasist_modules.py:99-105);
- train-mode BatchNorm statistics updates (dropout disabled on both sides):
  flax tracks the *biased* batch variance while torch tracks the unbiased
  one — the exact n/(n-1) relationship is asserted, which pins the only
  intentional train-mode divergence.

This is the executable stand-in for real-checkpoint EER closure (the blobs
are absent in this environment — see docs/PARITY_RUNBOOK.md): everything
downstream of the SSL front-end is verified against reference code, and the
front-end itself against the hand-written fairseq oracle in
``test_w2v_parity.py``.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import linen as fnn  # noqa: E402

from rtdsd_tpu.models.aasist import (AASISTBackend, GraphAttentionLayer,  # noqa: E402
                                     GraphPool, HtrgGraphAttentionLayer,
                                     ResidualBlock)
from rtdsd_tpu.models.convert_fairseq import (_bn_stats, _conv2d, _lin,  # noqa: E402
                                              _norm, convert_aasist_backend)

REF_DIR = "/root/reference/models"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_DIR, "aasist_modules.py")),
    reason="reference snapshot not present")

FRAMES, FEAT_DIM = 24, 96  # stub SSL features: small but exercises all paths


def _load_reference():
    """Import the reference's aasist_modules + xlsr_aasist with ``fe`` stubbed.

    ``xlsr_aasist.py`` does ``from .fe import *`` and fe needs fairseq, which
    is absent; per the parity plan we monkeypatch the package module with a
    deterministic fixed-feature stub so the *backend* composition
    (xlsr_aasist.py:86-177) runs unmodified.
    """
    if "refmodels.xlsr_aasist" in sys.modules:
        return (sys.modules["refmodels.aasist_modules"],
                sys.modules["refmodels.xlsr_aasist"])

    pkg = types.ModuleType("refmodels")
    pkg.__path__ = [REF_DIR]
    sys.modules["refmodels"] = pkg

    class _StubFE(torch.nn.Module):
        """Deterministic SSL stand-in: reshapes the wave into features."""

        out_dim = FEAT_DIM

        def __init__(self, device=None, **kwargs):
            super().__init__()

        def extract_feat(self, x):
            return x.reshape(x.shape[0], FRAMES, FEAT_DIM)

    fe_stub = types.ModuleType("refmodels.fe")
    fe_stub.XLSR_FE = _StubFE
    fe_stub.My_XLSR_FE = _StubFE
    fe_stub.__all__ = ["XLSR_FE", "My_XLSR_FE"]
    sys.modules["refmodels.fe"] = fe_stub

    mods = {}
    for name in ["aasist_modules", "xlsr_aasist"]:
        spec = importlib.util.spec_from_file_location(
            f"refmodels.{name}", os.path.join(REF_DIR, f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refmodels.{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods["aasist_modules"], mods["xlsr_aasist"]


def _randomize(module: "torch.nn.Module", seed: int):
    """Random nontrivial params AND BatchNorm running stats."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.2)
        for name, b in module.named_buffers():
            if b.dtype.is_floating_point:
                if name.endswith("running_var"):
                    b.copy_(torch.rand(b.shape, generator=g) + 0.5)
                else:
                    b.copy_(torch.randn(b.shape, generator=g) * 0.1)


def _sd(module: "torch.nn.Module", prefix: str = "m"):
    # .numpy() returns a VIEW of the torch buffer; train-mode BN updates
    # mutate running stats in place, so copy to decouple the converted tree.
    return {f"{prefix}.{k}": v.detach().numpy().copy()
            for k, v in module.state_dict().items()}


def _assert_close(ours, theirs, atol=2e-5, rtol=1e-5):
    np.testing.assert_allclose(np.asarray(ours),
                               theirs.detach().numpy(), atol=atol, rtol=rtol)


# ----------------------------------------------------------- module oracles

def test_graph_attention_layer_oracle():
    ref, _ = _load_reference()
    t = ref.GraphAttentionLayer(24, 32, temperature=2.0)
    _randomize(t, 11)
    t.eval()
    x = torch.randn(3, 12, 24, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        want = t(x.clone())

    sd = _sd(t)
    params = {
        "att_proj": _lin(sd, "m.att_proj"),
        "att_weight": sd["m.att_weight"],
        "proj_with_att": _lin(sd, "m.proj_with_att"),
        "proj_without_att": _lin(sd, "m.proj_without_att"),
        "bn": _norm(sd, "m.bn"),
    }
    stats = {"bn": _bn_stats(sd, "m.bn")}
    layer = GraphAttentionLayer(out_dim=32, temperature=2.0)
    got = layer.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x.numpy()), train=False)
    _assert_close(got, want)


@pytest.mark.parametrize("with_master", [True, False])
def test_htrg_graph_attention_layer_oracle(with_master):
    ref, _ = _load_reference()
    t = ref.HtrgGraphAttentionLayer(16, 8, temperature=100.0)
    _randomize(t, 12)
    t.eval()
    g = torch.Generator().manual_seed(2)
    x1 = torch.randn(2, 6, 16, generator=g)
    x2 = torch.randn(2, 4, 16, generator=g)
    master = torch.randn(1, 1, 16, generator=g) if with_master else None
    with torch.no_grad():
        w1, w2, wm = t(x1.clone(), x2.clone(), master=master)

    sd = _sd(t)
    params = {
        "proj_type1": _lin(sd, "m.proj_type1"),
        "proj_type2": _lin(sd, "m.proj_type2"),
        "att_proj": _lin(sd, "m.att_proj"),
        "att_projM": _lin(sd, "m.att_projM"),
        "att_weight11": sd["m.att_weight11"],
        "att_weight22": sd["m.att_weight22"],
        "att_weight12": sd["m.att_weight12"],
        "att_weightM": sd["m.att_weightM"],
        "proj_with_att": _lin(sd, "m.proj_with_att"),
        "proj_without_att": _lin(sd, "m.proj_without_att"),
        "proj_with_attM": _lin(sd, "m.proj_with_attM"),
        "proj_without_attM": _lin(sd, "m.proj_without_attM"),
        "bn": _norm(sd, "m.bn"),
    }
    stats = {"bn": _bn_stats(sd, "m.bn")}
    layer = HtrgGraphAttentionLayer(in_dim=16, out_dim=8, temperature=100.0)
    jm = None if master is None else jnp.asarray(master.numpy())
    o1, o2, om = layer.apply({"params": params, "batch_stats": stats},
                             jnp.asarray(x1.numpy()), jnp.asarray(x2.numpy()),
                             jm, train=False)
    _assert_close(o1, w1)
    _assert_close(o2, w2)
    _assert_close(om, wm)


def test_graph_pool_oracle():
    ref, _ = _load_reference()
    t = ref.GraphPool(0.5, 8, 0.3)
    _randomize(t, 13)
    t.eval()
    h = torch.randn(3, 10, 8, generator=torch.Generator().manual_seed(3))
    with torch.no_grad():
        want = t(h.clone())

    sd = _sd(t)
    pool = GraphPool(k=0.5, p=0.3)
    got = pool.apply({"params": {"proj": _lin(sd, "m.proj")}},
                     jnp.asarray(h.numpy()), train=False)
    assert got.shape == tuple(want.shape)
    _assert_close(got, want)


@pytest.mark.parametrize("cin,cout,first", [(1, 32, True), (32, 32, False),
                                            (32, 64, False)])
def test_residual_block_oracle(cin, cout, first):
    ref, _ = _load_reference()
    t = ref.Residual_block([cin, cout], first=first)
    _randomize(t, 14 + cin + cout)
    t.eval()
    x = torch.randn(2, cin, 9, 11,
                    generator=torch.Generator().manual_seed(4))
    with torch.no_grad():
        want = t(x.clone())

    sd = _sd(t)
    params = {"conv1": _conv2d(sd, "m.conv1"), "bn2": _norm(sd, "m.bn2"),
              "conv2": _conv2d(sd, "m.conv2")}
    if "m.conv_downsample.weight" in sd:
        params["conv_downsample"] = _conv2d(sd, "m.conv_downsample")
    blk = ResidualBlock(cin, cout, first=first)
    got = blk.apply({"params": params,
                     "batch_stats": {"bn2": _bn_stats(sd, "m.bn2")}},
                    jnp.asarray(x.numpy()).transpose(0, 2, 3, 1), train=False)
    _assert_close(jnp.transpose(got, (0, 3, 1, 2)), want)


# ------------------------------------------------- full backend composition

def _build_reference_model(seed=21):
    _, ref_x = _load_reference()
    torch.manual_seed(seed)
    model = ref_x.XLSR_AASIST(device="cpu")
    _randomize(model, seed)
    return model


def _backend_variables(model):
    sd = {k: v.detach().numpy().copy()
          for k, v in model.state_dict().items()}
    params, stats = convert_aasist_backend(sd)
    return {"params": params, "batch_stats": stats}


def test_full_xlsr_aasist_backend_oracle_eval():
    """The entire reference XLSR_AASIST.forward downstream of extract_feat
    (xlsr_aasist.py:86-177), eval mode, incl. the out_S1+1 quirk (:138)."""
    model = _build_reference_model()
    model.eval()
    g = torch.Generator().manual_seed(5)
    wave = torch.randn(4, FRAMES * FEAT_DIM, generator=g)
    with torch.no_grad():
        want = model(wave.clone())

    feats = wave.reshape(4, FRAMES, FEAT_DIM).numpy()  # what the stub FE made
    backend = AASISTBackend(fix_out_s1_bug=False)
    got = backend.apply(_backend_variables(model), jnp.asarray(feats),
                        train=False)
    assert got.shape == (4, 2)
    _assert_close(got, want, atol=5e-5)


def test_full_backend_oracle_train_mode(monkeypatch):
    """Train-mode forward + BN running-stat updates vs the reference model.

    Dropout is disabled on both sides (torch: p=0; flax: identity) so the
    only train/eval difference left is BatchNorm batch statistics. Checks:

    - train-mode logits match (both frameworks normalize by the *biased*
      batch variance);
    - running_mean updates match exactly;
    - running_var: torch tracks the unbiased variance
      (``n/(n-1) * biased``), flax tracks the biased one — the exact
      relationship is asserted on a representative BN (GAT_layer_S.bn,
      reshape semantics of aasist_modules.py:99-105, n = B*num_nodes) and
      all other BNs agree within the corresponding loose bound.
    """
    model = _build_reference_model(seed=22)
    model.train()
    for m in model.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    monkeypatch.setattr(
        fnn.Dropout, "__call__",
        lambda self, x, deterministic=None, rng=None: x)

    g = torch.Generator().manual_seed(6)
    wave = torch.randn(4, FRAMES * FEAT_DIM, generator=g)
    variables = _backend_variables(model)  # convert BEFORE torch updates

    with torch.no_grad():
        want = model(wave.clone())
    feats = wave.reshape(4, FRAMES, FEAT_DIM).numpy()
    backend = AASISTBackend(fix_out_s1_bug=False)
    got, updates = backend.apply(variables, jnp.asarray(feats), train=True,
                                 mutable=["batch_stats"])
    _assert_close(got, want, atol=5e-5)

    sd_after = {k: v.detach().numpy().copy()
                for k, v in model.state_dict().items()}
    new = updates["batch_stats"]

    # exact relationship on GAT_layer_S.bn: nodes flattened to (B*42, 64)
    n = 4 * 42
    ours_mean = np.asarray(new["GAT_layer_S"]["bn"]["mean"])
    ours_var = np.asarray(new["GAT_layer_S"]["bn"]["var"])
    theirs_mean = sd_after["GAT_layer_S.bn.running_mean"]
    theirs_var = sd_after["GAT_layer_S.bn.running_var"]
    old_var = np.asarray(variables["batch_stats"]["GAT_layer_S"]["bn"]["var"])
    np.testing.assert_allclose(ours_mean, theirs_mean, atol=1e-5, rtol=1e-5)
    # torch: new = 0.9*old + 0.1*unbiased; flax: new = 0.9*old + 0.1*biased
    unbiased_contrib = theirs_var - 0.9 * old_var
    expected_ours_var = 0.9 * old_var + unbiased_contrib * (n - 1) / n
    np.testing.assert_allclose(ours_var, expected_ours_var,
                               atol=1e-5, rtol=1e-5)

    # all remaining BNs: means exact, vars within the n/(n-1) envelope
    _, stats_after = convert_aasist_backend(sd_after)
    flat_ours = jax.tree_util.tree_leaves_with_path(new)
    flat_theirs = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(stats_after))
    # 15 BatchNorms: first_bn, first_bn1, att_bn, 6x encoder bn2, 2x GAT bn,
    # 4x HtrgGAT bn (the reference's dead per-block bn1 is not instantiated)
    assert len(flat_ours) == 2 * 15
    for path, ours in flat_ours:
        key = jax.tree_util.keystr(path)
        theirs = flat_theirs[key]
        if key.endswith("'mean']"):
            np.testing.assert_allclose(np.asarray(ours), theirs,
                                       atol=2e-5, rtol=1e-5, err_msg=key)
        else:
            # smallest reduction count in the graph is ~B*5 nodes ->
            # unbiased/biased ratio <= 1.06 on the 0.1-weighted contribution
            np.testing.assert_allclose(np.asarray(ours), theirs,
                                       rtol=8e-3, err_msg=key)


def test_full_backend_oracle_batch_invariance():
    """Scoring one clip alone equals scoring it inside a batch (eval mode) —
    guards against any accidental cross-batch state in the flax backend."""
    model = _build_reference_model(seed=23)
    model.eval()
    variables = _backend_variables(model)
    g = torch.Generator().manual_seed(7)
    feats = torch.randn(3, FRAMES, FEAT_DIM, generator=g).numpy()
    backend = AASISTBackend(fix_out_s1_bug=False)
    full = backend.apply(variables, jnp.asarray(feats), train=False)
    one = backend.apply(variables, jnp.asarray(feats[1:2]), train=False)
    np.testing.assert_allclose(np.asarray(full[1:2]), np.asarray(one),
                               atol=1e-5, rtol=1e-5)


def test_graph_pool_tie_behavior_documented():
    """GraphPool top-k tie-breaking (VERDICT r2 weak #7): ``lax.top_k``
    breaks ties by LOWEST index (deterministic); CPU ``torch.topk`` picks
    heap-order indices (for an all-zero vector: [3, 5, 4] vs our [0, 1, 2]).
    Consequences, pinned here:

    - ties between IDENTICAL node rows are output-invariant — either
      framework's selection yields the same pooled tensor (asserted);
    - a fully-degenerate tie (all scores equal, distinct features) selects
      DIFFERENT nodes — converted-checkpoint parity holds only when the
      top-k scores are distinct, which the eval-mode oracle tests above
      cover with continuous random scores. bf16 near-ties on real
      checkpoints fall under the 'AASIST gradients are chaotic' doctrine
      (CLAUDE.md): compare losses/EER across layouts, never elementwise.
    """
    ref, _ = _load_reference()
    t = ref.GraphPool(0.5, 8, 0.0)
    _randomize(t, 100)
    t.eval()
    g = torch.Generator().manual_seed(6)
    h = torch.randn(2, 6, 8, generator=g)
    h[:, 3] = h[:, 1]
    h[:, 5] = h[:, 1]  # three byte-identical nodes -> exactly tied scores
    with torch.no_grad():
        want = t(h.clone())
    sd = _sd(t)
    pool = GraphPool(k=0.5, p=0.0)
    got = pool.apply({"params": {"proj": _lin(sd, "m.proj")}},
                     jnp.asarray(h.numpy()), train=False)
    _assert_close(got, want)

    # the divergent primitive itself, pinned so a toolchain change that
    # alters either side's tie order is caught and this doc re-checked
    assert jax.lax.top_k(jnp.zeros(6), 3)[1].tolist() == [0, 1, 2]
