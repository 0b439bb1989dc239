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

import re
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


def _path_str(path) -> str:
    # accept torch dotted patterns too (the reference matches torch names)
    return "/".join(str(getattr(p, "key", p)) for p in path)


# The reference addresses individual transformer layers by torch name
# substring ("encoder.layers.5", fe.py:26-40). Here those layers are
# scan-STACKED (one leaf with a leading (L,) axis), so layer-indexed
# patterns can't be leaf masks: they become per-slice masks on the stacked
# axis instead. _split_layer_patterns separates the two kinds.
_LAYER_IDX_RE = re.compile(r"layers[./](\d+)")


def _split_layer_patterns(patterns: Sequence[str]):
    """-> (plain leaf-substring patterns, [(layer_idx, rest-of-pattern)])."""
    plain, indexed = [], []
    for p in patterns:
        m = _LAYER_IDX_RE.search(p)
        if m:
            rest = p[m.end():].strip("./").replace(".", "/")
            indexed.append((int(m.group(1)), rest))
        else:
            plain.append(p)
    return plain, indexed


def _is_stacked_layer_leaf(ps: str) -> bool:
    return "layers/" in ps or ps.startswith("layers")


def _mask_stacked_layers(freeze_idx, unfreeze_idx, plain_freeze=(),
                         plain_unfreeze=()) -> optax.GradientTransformation:
    """Zero updates of frozen layer slices on scan-stacked leaves.

    Also resolves the plain+indexed interaction: a stacked leaf caught by a
    plain freeze pattern but carrying a layer-indexed unfreeze exception is
    left trainable by the leaf-level mask, and here every slice EXCEPT the
    excepted layers is zeroed."""
    import numpy as np

    def init_fn(_params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def f(path, u):
            ps = _path_str(path)
            if not _is_stacked_layer_leaf(ps) or u.ndim < 1:
                return u
            unfr = [i for i, r in unfreeze_idx if not r or r in ps]
            froz = [i for i, r in freeze_idx if not r or r in ps]
            plain_frozen = (any(p in ps for p in plain_freeze)
                            and not any(p in ps for p in plain_unfreeze))
            n = u.shape[0]
            if plain_frozen and unfr:
                m = np.zeros(n, np.float32)
            elif froz:
                m = np.ones(n, np.float32)
                for i in froz:
                    if i < n:
                        m[i] = 0.0
            else:
                return u
            for i in unfr:
                if i < n:
                    m[i] = 1.0
            return u * jnp.asarray(m, u.dtype).reshape(
                (n,) + (1,) * (u.ndim - 1))

        return jax.tree_util.tree_map_with_path(f, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def _freeze_mask(params, patterns: Sequence[str],
                 unfreeze_patterns: Sequence[str] = (),
                 layer_unfreeze_idx: Sequence = ()):
    """Param mask: True = trainable. Patterns are substring matches on the
    '/'-joined path (reference freezes by name substring, fe.py:26-34);
    a param also matching an unfreeze pattern stays trainable (the
    reference's `and not non_target` clause, fe.py:29). A stacked-layer
    leaf with a layer-indexed unfreeze exception stays trainable here; the
    per-slice transform zeroes the rest of its slices."""
    pats = [p.replace(".", "/") for p in patterns]
    unpats = [p.replace(".", "/") for p in unfreeze_patterns]

    def trainable(path, _leaf):
        ps = _path_str(path)
        if any(pat in ps for pat in unpats):
            return True
        if _is_stacked_layer_leaf(ps) and any(
                not r or r in ps for _i, r in layer_unfreeze_idx):
            return True
        return not any(pat in ps for pat in pats)
    return jax.tree_util.tree_map_with_path(trainable, params)


def make_optimizer(lr: float, weight_decay: float,
                   freeze_patterns: Sequence[str] = (),
                   unfreeze_patterns: Sequence[str] = (),
                   optimizer: str = "adamw",
                   mu_dtype: Optional[str] = None
                   ) -> optax.GradientTransformation:
    """AdamW matching torch defaults (betas 0.9/0.999, eps 1e-8; decay on all
    params, as torch AdamW does — /root/reference/main.py:125).

    ``mu_dtype`` (e.g. ``"bfloat16"``) stores AdamW's FIRST moment in a
    narrower dtype — at 315 M params that frees ~630 MB HBM for activations.
    The second moment stays f32: nu spans ~10 orders of magnitude and bf16's
    8 mantissa bits break the ``sqrt(nu)+eps`` denominator (standard
    practice; measured verdict in PERFORMANCE.md).
    ``optimizer="adafactor"`` swaps in optax.adafactor (factored second
    moment, no first moment: ~10 MB of optimizer state instead of 2.5 GB) —
    different update dynamics from the reference's AdamW, so it is an
    opt-in throughput/memory knob, never the parity default.
    """
    if optimizer == "adafactor":
        tx = optax.adafactor(lr, weight_decay_rate=weight_decay or None)
    elif optimizer == "adamw":
        tx = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8,
                         weight_decay=weight_decay,
                         mu_dtype=jnp.dtype(mu_dtype) if mu_dtype else None)
    else:
        raise ValueError(f"unknown optimizer {optimizer!r} "
                         "(have: adamw, adafactor)")
    plain_f, idx_f = _split_layer_patterns(freeze_patterns or ())
    plain_u, idx_u = _split_layer_patterns(unfreeze_patterns or ())
    if plain_f:
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()},
            lambda params: jax.tree_util.tree_map(
                lambda t: "train" if t else "frozen",
                _freeze_mask(params, plain_f, plain_u, idx_u)))
    if idx_f or (plain_f and idx_u):
        tx = optax.chain(tx, _mask_stacked_layers(
            idx_f, idx_u, [p.replace(".", "/") for p in plain_f],
            [p.replace(".", "/") for p in plain_u]))
    return tx


def reinit_params(params, patterns: Sequence[str], key: jax.Array):
    """Xavier-uniform re-init of >=2-D params whose path matches a pattern
    (reference random_init_layers, fe.py:36-40 — runs AFTER the SSL
    checkpoint load, so matched layers train from scratch). Layer-indexed
    patterns ("encoder.layers.5[...]") re-init only that slice of the
    scan-stacked leaf."""
    if not patterns:
        return params
    plain, indexed = _split_layer_patterns(
        [p.replace(".", "/") for p in patterns])
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    init = jax.nn.initializers.glorot_uniform()

    replaced = {}
    for i, (path, leaf) in enumerate(leaves):
        ps = _path_str(path)
        if getattr(leaf, "ndim", 0) >= 2 and any(p in ps for p in plain):
            if _is_stacked_layer_leaf(ps) and leaf.ndim >= 3:
                # per-slice Xavier: gloroting the whole (L, in, out) stack
                # would fold L into fan-in/out and shrink the bound ~sqrt(L)
                ks = jax.random.split(jax.random.fold_in(key, i),
                                      leaf.shape[0])
                replaced[ps] = jax.vmap(
                    lambda k: init(k, leaf.shape[1:], leaf.dtype))(ks)
            else:
                replaced[ps] = init(jax.random.fold_in(key, i), leaf.shape,
                                    leaf.dtype)
            continue
        if _is_stacked_layer_leaf(ps) and getattr(leaf, "ndim", 0) >= 3:
            hits = [li for li, rest in indexed
                    if (not rest or rest in ps) and li < leaf.shape[0]]
            if hits:
                new = jnp.asarray(leaf)
                for li in hits:
                    fresh = init(jax.random.fold_in(key, i * 1000 + li),
                                 leaf.shape[1:], leaf.dtype)
                    new = new.at[li].set(fresh)
                replaced[ps] = new

    def swap(path, leaf):
        return replaced.get(_path_str(path), leaf)

    return jax.tree_util.tree_map_with_path(swap, params)


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
                    donate: bool = True,
                    donate_batch: bool = False) -> Callable:
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

    # donate_batch additionally donates waves+labels — safe only when the
    # caller hands over fresh per-step device buffers (the trainer's
    # device_prefetch does; timing probes that re-feed one buffer must not)
    argnums = (0,) if donate else ()
    if donate_batch:
        argnums += (1, 2)
    return jax.jit(step, donate_argnums=argnums)


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
