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
                      pre_aug_list: Tuple[str, ...] = (),
                      aug_list: Tuple[str, ...] = ()):
    """Dataset-side aug -> pre-emphasis -> trainer-side aug, on device.

    Order matches the reference pipeline exactly: the dataset worker applies
    RawBoost{k} OR (elif) the mul_augment chain to the wave
    (train_set.py:112-124, mutually exclusive, RawBoost priority, ungated),
    then the trainer applies PreEmphasis (trainer.py:52) and — only when
    allow_data_augmentation — torch_audiomentations (trainer.py:55-56).

    Documented divergence: the reference runs RawBoost on the FULL decoded
    utterance and crops afterwards; here RawBoost runs on the static-shape
    crop (moving it on-device requires fixed shapes). normWav's rescale
    decision therefore sees the crop's peak, not the whole utterance's —
    distributionally close, not sample-identical."""
    k_rb, k_pre, k_post = jax.random.split(key, 3)
    if algo is not None and 1 <= algo <= 8:
        keys = jax.random.split(k_rb, waves.shape[0])
        waves = jax.vmap(lambda k, x: _rawboost_single(
            k, x, algo, rawboost_args, sample_rate))(keys, waves)
    elif pre_aug_list:
        keys = jax.random.split(k_pre, waves.shape[0])
        waves = jax.vmap(lambda k, x: _augment_single(
            k, x, pre_aug_list, sample_rate))(keys, waves)
    if preemph is not None:
        waves = pre_emphasis(waves, preemph)
    if aug_list:
        keys = jax.random.split(k_post, waves.shape[0])
        waves = jax.vmap(lambda k, x: _augment_single(
            k, x, aug_list, sample_rate))(keys, waves)
    return waves


def pick_rawboost_algo(data_augmentation: Sequence[str]) -> Optional[int]:
    """First k in 1..8 with 'RawBoost{k}' present (ref train_set.py:114-115)."""
    for k in range(1, 9):
        if f"RawBoost{k}" in data_augmentation:
            return k
    return None


def pre_device_augs(data_augmentation: Sequence[str]) -> Tuple[str, ...]:
    """Dataset-side device augs: the math-only "mul_augment" equivalents in
    the reference Compose order (TimeStretch -> Gain -> AirAbsorption ->
    TimeMask, augmentation.py:97-107). Empty when a RawBoost code is present
    — the reference dispatch is if/elif with RawBoost priority
    (train_set.py:112-124) — and NOT gated by allow_data_augmentation (the
    reference dataset always augments during training). Background noise
    (corpus; SysConfig.noise_path) and MP3 (codec) run host-side per item
    via data/host_augment.py."""
    if pick_rawboost_algo(data_augmentation) is not None:
        return ()
    if "mul_augment" in data_augmentation:
        return ("TST", "GAN", "AIR", "TMK")
    return ()


def post_device_augs(data_augmentation: Sequence[str],
                     allow: bool) -> Tuple[str, ...]:
    """Trainer-side augs (the reference's WaveformAugmetation Compose,
    augmentation.py:16-45): applied AFTER pre-emphasis, gated by
    allow_data_augmentation (trainer.py:55-56), in the chain's fixed
    ACN -> HPF -> LPF -> GAN order filtered to the configured codes
    (+ TMK time-mask extension)."""
    if not allow:
        return ()
    return tuple(a for a in ("ACN", "HPF", "LPF", "GAN", "TMK")
                 if a in data_augmentation)


def make_train_step(model, tx: optax.GradientTransformation, *,
                    ce_weight: Optional[Sequence[float]] = (0.9, 0.1),
                    preemph: Optional[float] = 0.97,
                    rawboost_algo: Optional[int] = None,
                    rawboost_args: RawBoostArgs = RawBoostArgs(),
                    pre_aug_list: Tuple[str, ...] = (),
                    aug_list: Tuple[str, ...] = (),
                    sample_rate: float = 16000.0,
                    donate: bool = True) -> Callable:
    """Build the jitted train step: (state, waves, labels, key) ->
    (state, metrics) with metrics = {loss, num_correct}.

    ``pre_aug_list`` = dataset-side augs before pre-emphasis (mul_augment
    equivalents; ignored when rawboost_algo is set — reference if/elif);
    ``aug_list`` = trainer-side augs after pre-emphasis."""

    def step(state: TrainState, waves, labels, key):
        k_aug, k_drop = jax.random.split(jax.random.fold_in(key, state.step))
        waves = _preprocess_train(
            waves, k_aug, algo=rawboost_algo, rawboost_args=rawboost_args,
            sample_rate=sample_rate, preemph=preemph,
            pre_aug_list=pre_aug_list, aug_list=aug_list)

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
        # per-row weighted CE terms so callers can exclude the loader's
        # pad rows from the dev loss (the padded-batch mean in "loss" would
        # bias best-checkpoint selection toward the duplicated last trial)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        w = (jnp.asarray(ce_weight, jnp.float32)[labels]
             if ce_weight is not None else jnp.ones_like(nll))
        correct = jnp.argmax(logits, -1) == labels
        scores = logits[:, 1]
        return {"loss": loss, "loss_terms": w * nll, "loss_weights": w,
                "correct": correct, "scores": scores}

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
