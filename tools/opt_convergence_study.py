"""Optimizer-lever convergence study (VERDICT r3 #5 follow-up).

The round-3 training-efficiency probe (tools/train_opt_probe.py) sweeps
throughput levers; two of them change *numerics* and therefore need
convergence evidence before a default can flip (same standard as the
fast_softmax_train study, tools/fast_softmax_study.py):

- ``mu16``: AdamW first moment stored in bfloat16 (second moment stays f32
  — see make_optimizer's docstring for why nu cannot be narrowed);
- ``adafactor``: a different optimizer entirely (factored second moment).

Remat policies and buffer donation change scheduling only, not math, so
they are excluded. Trains the same tiny-but-real XLSR_AASIST (bf16 compute,
real fused train step) on the synthetic sine-vs-noise task, N seeds per
variant, and compares loss curves and final dev EER/accuracy.

    python tools/opt_convergence_study.py            # TPU (default env)
    env -u PYTHONPATH JAX_PLATFORMS=cpu python tools/opt_convergence_study.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

from rtdsd_tpu.utils.cache import enable_persistent_compile_cache

enable_persistent_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from rtdsd_tpu.engine.steps import (create_train_state, make_eval_step,
                                    make_optimizer, make_train_step)
from rtdsd_tpu.models.wav2vec2 import Wav2Vec2Config
from rtdsd_tpu.models.zoo import XLSR_AASIST
from rtdsd_tpu.utils.metrics import compute_eer

SEEDS = [0, 1, 2]
EPOCHS = 12
BATCH = 8
N_TRAIN, N_DEV = 64, 32
DUR = 16000  # 1 s

# variant -> make_optimizer kwargs (lr tuned per optimizer family: the
# adafactor update is unscaled by moment bias correction at step 1, so it
# uses the same lr — relative comparison per family is what matters here)
VARIANTS = {
    "adamw_f32mu": dict(optimizer="adamw", mu_dtype=None),
    "adamw_mu16":  dict(optimizer="adamw", mu_dtype="bfloat16"),
    "adafactor":   dict(optimizer="adafactor", mu_dtype=None),
}


def make_data(n, seed):
    rng = np.random.default_rng(seed)
    waves = np.empty((n, DUR), np.float32)
    labels = np.empty((n,), np.int32)
    for i in range(n):
        bona = i % 2 == 1
        t = np.arange(DUR) / 16000
        f = 300 + 40 * rng.standard_normal()
        waves[i] = (0.3 * np.sin(2 * np.pi * f * t) if bona
                    else 0.2 * rng.standard_normal(DUR))
        labels[i] = int(bona)
    return waves, labels


CFG = Wav2Vec2Config(
    conv_layers=((32, 10, 5), (32, 3, 2), (32, 2, 2), (32, 2, 2)),
    encoder_embed_dim=64, encoder_ffn_dim=128, encoder_heads=4,
    encoder_layers=4, conv_pos=16, conv_pos_groups=4)


def run(variant: str, seed: int):
    model = XLSR_AASIST(w2v_cfg=CFG, dtype=jnp.bfloat16)
    tx = make_optimizer(2e-3, 1e-4, **VARIANTS[variant])
    tw, tl = make_data(N_TRAIN, 100 + seed)
    dw, dl = make_data(N_DEV, 999)

    state = create_train_state(model, jax.random.key(seed),
                               jnp.asarray(tw[:2]), tx)
    step = make_train_step(model, tx, preemph=0.97, rawboost_algo=None,
                           donate=False)
    eval_step = make_eval_step(model, preemph=0.97)

    rng = np.random.default_rng(seed)
    curve = []
    for ep in range(EPOCHS):
        order = rng.permutation(N_TRAIN)
        losses = []
        for s in range(0, N_TRAIN, BATCH):
            idx = order[s: s + BATCH]
            state, metrics = step(state, jnp.asarray(tw[idx]),
                                  jnp.asarray(tl[idx]),
                                  jax.random.key(seed * 1000 + ep * 10 + s))
            losses.append(float(metrics["loss"]))
        curve.append(float(np.mean(losses)))

    scores, correct = [], 0
    for s in range(0, N_DEV, BATCH):
        out = eval_step(state.params, state.batch_stats,
                        jnp.asarray(dw[s: s + BATCH]),
                        jnp.asarray(dl[s: s + BATCH]))
        scores.append(np.asarray(out["scores"], np.float32))
        correct += int(np.asarray(out["correct"]).sum())
    scores = np.concatenate(scores)
    eer = compute_eer(scores, dl) * 100
    acc = 100.0 * correct / N_DEV
    return curve, eer, acc


def main():
    variants = sys.argv[1:] or list(VARIANTS)
    print(f"{'variant':14s} {'seed':>4s} {'loss@3':>8s} {'loss@final':>10s} "
          f"{'devEER%':>8s} {'devAcc%':>8s}")
    results = {}
    for tag in variants:
        for seed in SEEDS:
            curve, eer, acc = run(tag, seed)
            results.setdefault(tag, []).append((curve, eer, acc))
            print(f"{tag:14s} {seed:4d} {curve[2]:8.4f} {curve[-1]:10.4f} "
                  f"{eer:8.2f} {acc:8.2f}", flush=True)
    for tag, rs in results.items():
        finals = [c[-1] for c, _, _ in rs]
        eers = [e for _, e, _ in rs]
        print(f"== {tag}: final loss {np.mean(finals):.4f} "
              f"+- {np.std(finals):.4f}, EER {np.mean(eers):.2f} "
              f"+- {np.std(eers):.2f}")


if __name__ == "__main__":
    main()
