"""Jitted train / eval / score steps.

Replaces the reference per-batch loop body (``/root/reference/trainer.py:44-77``:
preprocess -> augment -> forward -> CE -> backward -> AdamW step) with one
donated, sharded, jit-compiled function:

- the *whole* pipeline — pre-emphasis, RawBoost, waveform augmentation,
  forward, loss, backward, optimizer — runs on device in one XLA program;
  the host only decodes audio.
- data parallelism is SPMD: batch arrives sharded over the mesh ``data``
  axis, XLA inserts the gradient all-reduce (the NCCL-DDP equivalent,
  SURVEY.md §2.3). BatchNorm batch statistics are computed over the *global*
  batch (an upgrade over DDP's per-replica stats; divergence documented).
- loss semantics match ``torch.nn.CrossEntropyLoss(weight=[0.9, 0.1])``
  (``/root/reference/main.py:105-107``): weighted mean with weight-sum
  normalization.
- eval applies pre-emphasis like ``Trainer._test`` (trainer.py:104); the
  scoring step does *not*, matching ``produce_evaluation_file``
  (main.py:199-221 — the reference's train/score preprocessing asymmetry).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from rtdsd_tpu.ops.augment import _augment_single
from rtdsd_tpu.ops.preemphasis import pre_emphasis
from rtdsd_tpu.ops.rawboost import RawBoostArgs, _rawboost_single


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def weighted_cross_entropy(logits: jax.Array, labels: jax.Array,
                           weight: Optional[Sequence[float]] = None
                           ) -> jax.Array:
    """torch CrossEntropyLoss semantics: sum(w[y]*nll)/sum(w[y])."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if weight is None:
        return jnp.mean(nll)
    w = jnp.asarray(weight, jnp.float32)[labels]
    return jnp.sum(w * nll) / jnp.sum(w)


def _freeze_mask(params, patterns: Sequence[str]):
    """Param mask: True = trainable. Patterns are substring matches on the
    '/'-joined path (reference freezes by name substring, fe.py:26-34)."""
    def trainable(path, _leaf):
        ps = "/".join(str(getattr(p, "key", p)) for p in path)
        return not any(pat in ps for pat in patterns)
    return jax.tree_util.tree_map_with_path(trainable, params)


def make_optimizer(lr: float, weight_decay: float,
                   freeze_patterns: Sequence[str] = ()
                   ) -> optax.GradientTransformation:
    """AdamW matching torch defaults (betas 0.9/0.999, eps 1e-8; decay on all
    params, as torch AdamW does — /root/reference/main.py:125)."""
    tx = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8,
                     weight_decay=weight_decay)
    if freeze_patterns:
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()},
            lambda params: jax.tree_util.tree_map(
                lambda t: "train" if t else "frozen",
                _freeze_mask(params, freeze_patterns)))
    return tx


def create_train_state(model, rng: jax.Array, sample_batch: jax.Array,
                       tx: optax.GradientTransformation,
                       params=None, batch_stats=None) -> TrainState:
    variables = model.init(rng, sample_batch, train=False)
    params = params if params is not None else variables["params"]
    if batch_stats is None:
        batch_stats = variables.get("batch_stats", {})
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats,
                      opt_state=tx.init(params))


def _preprocess_train(waves, key, *, algo: int, rawboost_args: RawBoostArgs,
                      sample_rate: float, preemph: Optional[float],
                      aug_list: Tuple[str, ...]):
    """RawBoost -> pre-emphasis -> waveform augmentation, batched on device.

    Order matches the reference pipeline: RawBoost in the dataset worker
    (train_set.py:113-122) runs before the trainer's PreEmphasis
    (trainer.py:52) and torch_audiomentations (trainer.py:55-56)."""
    k_rb, k_aug = jax.random.split(key)
    if algo is not None and 1 <= algo <= 8:
        keys = jax.random.split(k_rb, waves.shape[0])
        waves = jax.vmap(lambda k, x: _rawboost_single(
            k, x, algo, rawboost_args, sample_rate))(keys, waves)
    if preemph is not None:
        waves = pre_emphasis(waves, preemph)
    if aug_list:
        keys = jax.random.split(k_aug, waves.shape[0])
        waves = jax.vmap(lambda k, x: _augment_single(
            k, x, aug_list, sample_rate))(keys, waves)
    return waves


def pick_rawboost_algo(data_augmentation: Sequence[str]) -> Optional[int]:
    """First k in 1..8 with 'RawBoost{k}' present (ref train_set.py:114-115)."""
    for k in range(1, 9):
        if f"RawBoost{k}" in data_augmentation:
            return k
    return None


def device_augs(data_augmentation: Sequence[str]) -> Tuple[str, ...]:
    """Device-executable augmentation codes. "mul_augment" (the reference's
    CPU audiomentations chain, augmentation.py:92-108) maps to its device
    equivalents: time-stretch, gain, air absorption, time mask. Background
    noise (needs a corpus; SysConfig.noise_path) and MP3 (needs a codec;
    warns when absent) run host-side per item via data/host_augment.py."""
    out = []
    for a in data_augmentation:
        if a in ("ACN", "HPF", "LPF", "GAN", "TMK", "TST", "AIR"):
            out.append(a)
        elif a == "mul_augment":
            out.extend(["TST", "GAN", "AIR", "TMK"])
    return tuple(dict.fromkeys(out))


def make_train_step(model, tx: optax.GradientTransformation, *,
                    ce_weight: Optional[Sequence[float]] = (0.9, 0.1),
                    preemph: Optional[float] = 0.97,
                    rawboost_algo: Optional[int] = None,
                    rawboost_args: RawBoostArgs = RawBoostArgs(),
                    aug_list: Tuple[str, ...] = (),
                    sample_rate: float = 16000.0,
                    donate: bool = True) -> Callable:
    """Build the jitted train step: (state, waves, labels, key) ->
    (state, metrics) with metrics = {loss, num_correct}."""

    def step(state: TrainState, waves, labels, key):
        k_aug, k_drop = jax.random.split(jax.random.fold_in(key, state.step))
        waves = _preprocess_train(
            waves, k_aug, algo=rawboost_algo, rawboost_args=rawboost_args,
            sample_rate=sample_rate, preemph=preemph, aug_list=aug_list)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            out = model.apply(variables, waves, train=True,
                              mutable=["batch_stats"] if state.batch_stats else [],
                              rngs={"dropout": k_drop})
            logits, mutated = out if isinstance(out, tuple) else (out, {})
            loss = weighted_cross_entropy(logits, labels, ce_weight)
            return loss, (logits, mutated.get("batch_stats", state.batch_stats))

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_stats, opt_state=new_opt)
        num_correct = jnp.sum(jnp.argmax(logits, -1) == labels)
        return new_state, {"loss": loss, "num_correct": num_correct}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, *, ce_weight: Optional[Sequence[float]] = (0.9, 0.1),
                   preemph: Optional[float] = 0.97) -> Callable:
    """Dev/eval step (applies pre-emphasis, like Trainer._test)."""

    def step(params, batch_stats, waves, labels):
        if preemph is not None:
            waves = pre_emphasis(waves, preemph)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        logits = model.apply(variables, waves, train=False)
        loss = weighted_cross_entropy(logits, labels, ce_weight)
        correct = jnp.argmax(logits, -1) == labels
        scores = logits[:, 1]
        return {"loss": loss, "correct": correct, "scores": scores}

    return jax.jit(step)


def make_score_step(model) -> Callable:
    """Scoring step: raw bonafide logit, NO pre-emphasis
    (ref produce_evaluation_file, main.py:199-221)."""

    def step(params, batch_stats, waves):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        logits = model.apply(variables, waves, train=False)
        return logits[:, 1]

    return jax.jit(step)
