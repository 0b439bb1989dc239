"""Partial/mixed-remat training probe (VERDICT r4 item 5): the untried
angle between 46% MFU full-recompute remat and the toolchain's HTTP-500
wall on the whole-program `hidden`/`dots` policies.

`remat_save_every=m` keeps every m-th scanned layer's activations (no
remat) and recomputes the other (m-1)/m — backward recompute drops by
1/m for (24/m) layers' worth of extra activation memory (the attention
softmax output B*H*T*T dominates: ~2.5 GB/saved-layer at b192 bf16).

One process, params uploaded once (each fresh process re-uploads ~GBs
through the relay); the standard stacked tree maps into each variant's
mixed layout ON DEVICE via a jitted to_mixed_remat (reshape/slice only).

    python tools/train_remat_probe.py [B[,B2,...]] [variant ...]
variants: base m8 m6 m4 m3 m2   (default: base m8 m6 m4)
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

from rtdsd_tpu.engine.steps import TrainState, make_optimizer, make_train_step
from rtdsd_tpu.models.convert_fairseq import to_mixed_remat
from rtdsd_tpu.models.registry import get_model
from rtdsd_tpu.utils.init_host import init_variables_host

BATCHES = ([int(b) for b in sys.argv[1].split(",")] if len(sys.argv) > 1
           else [192])
VARIANTS = sys.argv[2:] or ["base", "m8", "m6", "m4"]

base_spec = get_model("XLSR_AASIST", dtype=jnp.bfloat16, remat=True,
                      w2v={"fast_softmax_train": True})
variables = init_variables_host(base_spec.module,
                                jnp.zeros((2, 64000), jnp.float32),
                                train=False)
t0 = time.time()
params = jax.device_put(variables["params"])
stats = jax.device_put(variables.get("batch_stats", {}))
log(f"params uploaded: "
    f"{float(jax.tree_util.tree_leaves(params)[0].reshape(-1)[0].astype(jnp.float32)):.3f} "
    f"in {time.time() - t0:.0f}s")

key = jax.random.key(0)

for B in BATCHES:
  waves = jax.device_put(jnp.asarray(
      (np.random.default_rng(0).standard_normal((B, 64000)) * 0.1)
      .astype(np.float32)))
  labels = jax.device_put(jnp.asarray(np.arange(B) % 2, jnp.int32))
  for name in VARIANTS:
    m = 0 if name == "base" else int(name[1:])
    w2v = {"fast_softmax_train": True}
    if m:
        w2v["remat_save_every"] = m
    spec = get_model("XLSR_AASIST", dtype=jnp.bfloat16, remat=True, w2v=w2v)
    tx = make_optimizer(1e-6, 1e-4)

    # device-side copy (donation-safe) + layout map, no host roundtrip
    def to_layout(t, m=m):
        p = jax.tree_util.tree_map(lambda x: x + 0, t)
        if m:
            ssl = to_mixed_remat(p["ssl_model"], m)
            p = dict(p, ssl_model=ssl)
        return p

    p = jax.jit(to_layout)(params)
    st = jax.jit(lambda t: jax.tree_util.tree_map(lambda x: x + 0, t))(stats)
    opt_state = jax.jit(tx.init)(p)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=p,
                       batch_stats=st, opt_state=opt_state)
    step = make_train_step(spec.module, tx, preemph=0.97, rawboost_algo=4,
                           aug_list=("ACN", "GAN"), donate=True)
    try:
        t0 = time.time()
        state, metrics = step(state, waves, labels, key)
        log(f"{name}: compile+first {time.time() - t0:.0f}s "
            f"loss={float(metrics['loss']):.4f}")
        ts = []
        for i in range(6):
            t0 = time.perf_counter()
            state, metrics = step(state, waves, labels, key)
            float(metrics["loss"])  # host sync (relay-safe)
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        log(f"{name}: b{B} {med * 1000:.1f} ms/step  {B / med:.1f} utt/s  "
            f"({med / B * 1000:.2f} ms/utt)")
    except Exception as e:
        log(f"{name}: b{B} FAILED {type(e).__name__}: {str(e)[:300]}")
    del state, opt_state, step, p, st
