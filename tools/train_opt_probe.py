"""One-process training-efficiency probe (VERDICT r3 #5): upload params
ONCE, then sweep (remat_policy, optimizer, donation) variants in-process —
each fresh process would re-upload ~4 GB of state through the relay.

    python tools/train_opt_probe.py [B[,B2,...]] [variant ...]
variants: base mu16 hidden_mu16 dots af dbatch dots_mu16 combo
(default: all; every variant donates the TrainState like the production
trainer — the batch list shares one param upload across the whole sweep)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rtdsd_tpu.utils.cache import enable_persistent_compile_cache

enable_persistent_compile_cache()


def log(msg):
    print(msg, file=sys.stderr, flush=True)


import jax
import jax.numpy as jnp
import numpy as np

from rtdsd_tpu.engine.steps import (TrainState, make_optimizer,
                                    make_train_step)
from rtdsd_tpu.models.registry import get_model
from rtdsd_tpu.utils.init_host import init_variables_host

BATCHES = ([int(b) for b in sys.argv[1].split(",")] if len(sys.argv) > 1
           else [192])
VARIANTS = sys.argv[2:] or ["base", "mu16", "hidden_mu16", "dots", "af",
                            "dbatch", "dots_mu16", "combo"]

# params are policy/optimizer-independent: build once from the plain model
base_spec = get_model("XLSR_AASIST", dtype=jnp.bfloat16, remat=True,
                      w2v={"fast_softmax_train": True})
variables = init_variables_host(base_spec.module,
                                jnp.zeros((2, 64000), jnp.float32),
                                train=False)
t0 = time.time()
params = jax.device_put(variables["params"])
stats = jax.device_put(variables.get("batch_stats", {}))
# force the upload now so per-variant timings never pay it
log(f"params uploaded: {float(jax.tree_util.tree_leaves(params)[0].reshape(-1)[0].astype(jnp.float32)):.3f} "
    f"in {time.time() - t0:.0f}s")

key = jax.random.key(0)

CFG = {
    "base":        dict(w2v={}, opt="adamw", mu=None, dbatch=False),
    "mu16":        dict(w2v={}, opt="adamw", mu="bfloat16", dbatch=False),
    "hidden_mu16": dict(w2v={"remat_policy": "hidden"}, opt="adamw",
                        mu="bfloat16", dbatch=False),
    "dots":        dict(w2v={"remat_policy": "dots"}, opt="adamw", mu=None,
                        dbatch=False),
    "af":          dict(w2v={}, opt="adafactor", mu=None, dbatch=False),
    "dbatch":      dict(w2v={}, opt="adamw", mu=None, dbatch=True),
    # cross-products of the single levers above
    "dots_mu16":   dict(w2v={"remat_policy": "dots"}, opt="adamw",
                        mu="bfloat16", dbatch=False),
    "combo":       dict(w2v={"remat_policy": "dots"}, opt="adamw",
                        mu="bfloat16", dbatch=True),
}

for B in BATCHES:
  waves = jax.device_put(jnp.asarray(
      (np.random.default_rng(0).standard_normal((B, 64000)) * 0.1)
      .astype(np.float32)))
  labels = jax.device_put(jnp.asarray(np.arange(B) % 2, jnp.int32))
  gen = jax.jit(
      lambda k, n=B: jax.random.normal(k, (n, 64000), jnp.float32) * 0.1)
  for name in VARIANTS:
    c = CFG[name]
    w2v = dict(c["w2v"], fast_softmax_train=True)
    spec = get_model("XLSR_AASIST", dtype=jnp.bfloat16, remat=True, w2v=w2v)
    tx = make_optimizer(1e-6, 1e-4, optimizer=c["opt"], mu_dtype=c["mu"])
    # Every variant donates the TrainState (matches the production trainer,
    # engine/steps.py donate=True default) — running non-donated doubles
    # the ~3.8 GB state's footprint during the step and OOMs b192 given the
    # extra shared pristine copy this probe retains. Give each variant
    # device-side COPIES so the uploaded params/stats survive donation.
    copy = jax.jit(lambda t: jax.tree_util.tree_map(lambda x: x + 0, t))
    p, st = copy(params), copy(stats)
    opt_state = jax.jit(tx.init)(p)  # built on device, no upload
    state = TrainState(step=jnp.zeros((), jnp.int32), params=p,
                       batch_stats=st, opt_state=opt_state)
    step = make_train_step(spec.module, tx, preemph=0.97, rawboost_algo=4,
                           aug_list=("ACN", "GAN"), donate=True,
                           donate_batch=c["dbatch"])
    fresh_lab = lambda: jax.device_put(
        jnp.asarray(np.arange(B) % 2, jnp.int32))
    try:
        t0 = time.time()
        w = gen(jax.random.key(1)) if c["dbatch"] else waves
        # dbatch donates its batch args: never hand it the shared buffers
        state, metrics = step(state, w,
                              fresh_lab() if c["dbatch"] else labels, key)
        log(f"{name}: compile+first {time.time() - t0:.0f}s "
            f"loss={float(metrics['loss']):.4f}")
        ts = []
        for i in range(6):
            w = gen(jax.random.key(2 + i)) if c["dbatch"] else waves
            lab = fresh_lab() if c["dbatch"] else labels
            if c["dbatch"]:
                # block_until_ready does NOT block through the relay
                # (CLAUDE.md): force gen()'s work out of the timed region
                float(w[0, 0])
            t0 = time.perf_counter()
            state, metrics = step(state, w, lab, key)
            float(metrics["loss"])  # host sync (relay-safe)
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        log(f"{name}: b{B} {med * 1000:.1f} ms/step  {B / med:.1f} utt/s  "
            f"({med / B * 1000:.2f} ms/utt)")
    except Exception as e:
        log(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
    # free this variant's optimizer state before the next
    del state, opt_state, step
