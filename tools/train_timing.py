"""Full train-step timing on TPU: fwd+bwd+AdamW+BN+dropout+device DSP."""

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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
# mode tokens (underscore-joined): remat | hidden | dots (remat policy),
# fsm (train-mode bf16 fast softmax), mu16 (bf16 AdamW first moment),
# af (adafactor), dbatch (donate waves+labels, fresh device batch per step)
mode = sys.argv[2] if len(sys.argv) > 2 else ""
tokens = set(mode.split("_")) if mode else set()
remat = "remat" in tokens
w2v = {}
if "hidden" in tokens:
    w2v["remat_policy"] = "hidden"
if "dots" in tokens:
    w2v["remat_policy"] = "dots"
if "fsm" in tokens:
    w2v["fast_softmax_train"] = True
opt_kind = "adafactor" if "af" in tokens else "adamw"
mu_dtype = "bfloat16" if "mu16" in tokens else None
donate_batch = "dbatch" in tokens
spec = get_model("XLSR_AASIST", dtype=jnp.bfloat16, remat=remat, w2v=w2v)
model = spec.module
log(f"batch={B} mode={mode or 'none'}")

waves_np = (np.random.default_rng(0).standard_normal((B, 64000)) * 0.1
            ).astype(np.float32)
variables = init_variables_host(model, jnp.zeros((2, 64000), jnp.float32),
                                train=False)
tx = make_optimizer(1e-6, 1e-4, optimizer=opt_kind, mu_dtype=mu_dtype)
state = TrainState(step=jnp.zeros((), jnp.int32),
                   params=variables["params"],
                   batch_stats=variables.get("batch_stats", {}),
                   opt_state=tx.init(variables["params"]))
state = jax.device_put(state)
jax.block_until_ready(state.params)
log("state on device")

waves = jax.device_put(jnp.asarray(waves_np))
labels = jax.device_put(jnp.asarray(np.arange(B) % 2, jnp.int32))
key = jax.random.key(0)

step = make_train_step(model, tx, preemph=0.97, rawboost_algo=4,
                       aug_list=("ACN", "GAN"), donate=donate_batch,
                       donate_batch=donate_batch)
# donated batches must be fresh device buffers every step; generate them
# on device (uploading 49 MB of waves through the relay per step would
# swamp the timing)
gen = jax.jit(lambda k: jax.random.normal(k, (B, 64000), jnp.float32) * 0.1)
t0 = time.time()
state, metrics = step(state, gen(jax.random.key(1)) if donate_batch
                      else waves, labels, key)
log(f"compile+first: {time.time() - t0:.1f}s loss={float(metrics['loss']):.4f}")

ts = []
for i in range(6):
    w = gen(jax.random.key(2 + i)) if donate_batch else waves
    lab = (jax.device_put(jnp.asarray(np.arange(B) % 2, jnp.int32))
           if donate_batch else labels)
    if donate_batch:
        # block_until_ready does NOT block through the relay (CLAUDE.md):
        # a one-element readback forces gen() out of the timed region
        float(w[0, 0])
    t0 = time.perf_counter()
    state, metrics = step(state, w, lab, key)
    float(metrics["loss"])  # host sync
    ts.append(time.perf_counter() - t0)
med = float(np.median(ts))
log(f"train step: {med * 1000:.1f} ms/step  {B / med:.1f} utt/s  "
    f"({med / B * 1000:.2f} ms/utt)")
