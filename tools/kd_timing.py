"""KD train-step timing on TPU: flagship teacher -> XLSR-6 student.

One fused step = on-device DSP + teacher forward (no grad, hidden-state
taps) + student forward/backward + CE + weighted mid-level KD losses +
AdamW. Mirrors the reference's KD recipe (last-teacher-layer MSE tap +
logit KL), ``configs/kd_xlsr6_aasist.yaml``-style kd_kwargs.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rtdsd_tpu.utils.cache import enable_persistent_compile_cache

enable_persistent_compile_cache()


def log(m):
    print(m, file=sys.stderr, flush=True)


import jax
import jax.numpy as jnp
import numpy as np

from rtdsd_tpu.engine.kd import make_kd_train_step
from rtdsd_tpu.engine.steps import TrainState, make_optimizer
from rtdsd_tpu.models.registry import get_model
from rtdsd_tpu.utils.init_host import init_variables_host

BS = [int(a) for a in sys.argv[1:]] or [32]
T = 64000

teacher_spec = get_model("XLSR_AASIST", dtype=jnp.bfloat16)
student_spec = get_model("My_XLSR_AASIST", dtype=jnp.bfloat16, remat=True,
                         num_layers=6)
teacher, student = teacher_spec.module, student_spec.module

kd_kwargs = {
    "ce_loss_weight": 1.0,
    "kd_criterions": [
        {"key": "MSELoss", "kwargs": {
            "student_module_path": "ssl_model.model.encoder.layers.5",
            "teacher_module_path": "ssl_model.model.encoder.layers.23"}},
        {"key": "KLDivLoss", "kwargs": {
            "student_module_path": "logits",
            "teacher_module_path": "logits", "temperature": 2.0}},
    ],
    "kd_criterion_weights": [1.0, 1.0],
}

log("init on host...")
t_vars = init_variables_host(teacher, jnp.zeros((2, T), jnp.float32),
                             train=False)
s_vars = init_variables_host(student, jnp.zeros((2, T), jnp.float32),
                             train=False)
tx = make_optimizer(1e-6, 1e-4)
state = TrainState(step=jnp.zeros((), jnp.int32), params=s_vars["params"],
                   batch_stats=s_vars.get("batch_stats", {}),
                   opt_state=tx.init(s_vars["params"]))
state = jax.device_put(state)
t_vars = jax.device_put(t_vars)
# force the upload with a host readback — block_until_ready is a no-op
# through the axon relay (CLAUDE.md)
float(jnp.sum(jax.tree_util.tree_leaves(state.params)[0]
              .astype(jnp.float32)))

step = make_kd_train_step(teacher, student, tx, kd_kwargs,
                          preemph=0.97, rawboost_algo=4,
                          aug_list=("ACN", "GAN"))
# sweep batch sizes inside ONE process: params upload once, each batch
# shape compiles (persistent cache) and times against the same state
for B in BS:
    waves = jax.device_put(jnp.asarray(
        (np.random.default_rng(0).standard_normal((B, T)) * 0.1),
        jnp.float32))
    labels = jax.device_put(jnp.asarray(np.arange(B) % 2, jnp.int32))
    t0 = time.time()
    try:
        state, metrics = step(state, t_vars, waves, labels,
                              jax.random.key(0))
        m0 = {k: float(v) for k, v in metrics.items()}
    except Exception as e:
        log(f"b{B}: FAILED ({type(e).__name__}: {str(e)[:100]})")
        continue
    log(f"b{B} compile+first: {time.time() - t0:.1f}s  "
        f"loss={m0['total_loss']:.3f}")
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        state, metrics = step(state, t_vars, waves, labels,
                              jax.random.key(1))
        float(metrics["total_loss"])
        ts.append(time.perf_counter() - t0)
    best = min(ts) * 1000
    log(f"KD step b{B}: {best:.1f} ms/step  {B / best * 1000:.1f} utt/s "
        f"({best / B:.2f} ms/utt)")
