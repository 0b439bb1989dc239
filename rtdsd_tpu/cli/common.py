"""Shared CLI plumbing: model/state construction, checkpoint IO, scoring."""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rtdsd_tpu.config import ExpConfig, SysConfig
from rtdsd_tpu.data.loader import DataLoader, device_prefetch
from rtdsd_tpu.engine.checkpoint import (load_params_only,
                                         restore_checkpoint_any,
                                         save_params_only)
from rtdsd_tpu.engine.steps import (TrainState, create_train_state,
                                    make_optimizer, make_score_step)
from rtdsd_tpu.models.convert_fairseq import (convert_reference_model,
                                              convert_w2v_checkpoint,
                                              load_torch_state_dict)
from rtdsd_tpu.models.registry import ModelSpec, get_model
from rtdsd_tpu.models.wav2vec2 import select_layers
from rtdsd_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                     replicated_sharding, shard_params)


def resolve_dtype(exp_config: ExpConfig):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
            "float16": jnp.float16}[exp_config.compute_dtype]


def build_model(sys_config: SysConfig, exp_config: ExpConfig,
                name: Optional[str] = None, train: bool = True,
                kwargs: Optional[dict] = None) -> ModelSpec:
    return get_model(name or sys_config.model,
                     dtype=resolve_dtype(exp_config), remat=train,
                     **(kwargs if kwargs is not None else exp_config.kwargs))


def init_state(spec: ModelSpec, sys_config: SysConfig, exp_config: ExpConfig,
               rng: jax.Array, tx=None) -> TrainState:
    """Init params; load the converted XLSR checkpoint into ssl_model if
    configured (replacing fairseq load at /root/reference/models/fe.py:11)."""
    sample = jnp.zeros((2, exp_config.train_duration_samples), jnp.float32)
    tx = tx or make_optimizer(exp_config.lr, exp_config.weight_decay,
                              spec.freeze_patterns, spec.unfreeze_patterns,
                              optimizer=exp_config.optimizer,
                              mu_dtype=exp_config.adam_mu_dtype)
    state = create_train_state(spec.module, rng, sample, tx)

    ssl_src = sys_config.ssl_pytree_path or sys_config.ssl_ckpt_path
    if ssl_src:
        ssl_params = load_ssl_params(ssl_src,
                                     expect_cfg=spec.module.w2v_cfg)
        ssl_params = select_layers(ssl_params, spec.layer_indices)
        params = dict(state.params)
        _check_ssl_shapes(params["ssl_model"], ssl_params, ssl_src)
        params["ssl_model"] = jax.tree_util.tree_map(
            lambda a, b: jnp.asarray(b, a.dtype), params["ssl_model"],
            ssl_params)
        if spec.reinit_patterns:
            # Xavier re-init of the configured SSL layers AFTER the
            # checkpoint load (ref fe.py:36-40 + xlsr_aasist.py:13-21)
            from rtdsd_tpu.engine.steps import reinit_params

            params["ssl_model"] = reinit_params(
                params["ssl_model"], spec.reinit_patterns,
                jax.random.fold_in(rng, 0x5eed))
        state = state.replace(params=params, opt_state=tx.init(params))
    return state


def _check_ssl_shapes(model_tree, ckpt_tree, src: str) -> None:
    """Raise a readable error when a converted SSL checkpoint's dims don't
    match the model's ``w2v`` config (otherwise the tree_map cast fails
    with a leaf-less structure error, or silently casts a same-structure /
    different-shape tree into a shape error deep in jit)."""
    flat_m = jax.tree_util.tree_flatten_with_path(model_tree)[0]
    flat_c = {jax.tree_util.keystr(p): np.shape(v) for p, v in
              jax.tree_util.tree_flatten_with_path(ckpt_tree)[0]}
    problems = []
    for path, leaf in flat_m:
        key = jax.tree_util.keystr(path)
        got = flat_c.pop(key, None)
        if got is None:
            problems.append(f"  missing in checkpoint: {key} "
                            f"(model wants {np.shape(leaf)})")
        elif tuple(got) != tuple(np.shape(leaf)):
            problems.append(f"  {key}: checkpoint {tuple(got)} vs model "
                            f"{tuple(np.shape(leaf))}")
    problems += [f"  not in model: {k} {tuple(v)}"
                 for k, v in flat_c.items()]
    if problems:
        shown = "\n".join(problems[:8])
        more = f"\n  ... and {len(problems) - 8} more" \
            if len(problems) > 8 else ""
        raise ValueError(
            f"SSL checkpoint {src!r} does not match the model's w2v config "
            f"({len(problems)} mismatched leaves):\n{shown}{more}\n"
            "Check ExpConfig.kwargs.w2v (encoder dims / conv_layers / "
            "num_layers) against the checkpoint's architecture.")


def load_ssl_params(path: str, expect_cfg=None):
    """Converted-XLSR pytree (.msgpack dir), an HF ``transformers`` snapshot
    dir (config.json + model.safetensors / pytorch_model.bin, e.g. a local
    download of facebook/wav2vec2-xls-r-300m), or a raw fairseq .pt.

    ``expect_cfg`` (the model's ``Wav2Vec2Config``): when the source is an
    HF snapshot, its config.json is cross-checked for the fields that do
    NOT change parameter shapes — a wrong ``encoder_heads`` split would
    otherwise load cleanly past the shape pre-flight and score garbage."""
    if os.path.isdir(path):
        if os.path.exists(os.path.join(path, "config.json")):
            from rtdsd_tpu.models.convert_hf import (convert_hf_checkpoint,
                                                     load_hf_dir)

            sd, hf_cfg = load_hf_dir(path)
            params, derived = convert_hf_checkpoint(sd, hf_cfg)
            if expect_cfg is not None:
                # shape-invisible fields only; layer count/dims may be
                # legitimately pruned (select_layers) and are covered by
                # the shape pre-flight
                bad = [f"  {f}: snapshot {getattr(derived, f)!r} vs model "
                       f"{getattr(expect_cfg, f)!r}"
                       for f in ("encoder_heads", "layer_norm_first")
                       if getattr(derived, f) != getattr(expect_cfg, f)]
                if bad:
                    raise ValueError(
                        f"HF snapshot {path!r} config disagrees with the "
                        "model's w2v config on shape-invisible fields "
                        "(these would load cleanly but run wrong math):\n"
                        + "\n".join(bad))
            return params
        import flax.serialization as ser

        with open(os.path.join(path, "weights.msgpack"), "rb") as f:
            return ser.msgpack_restore(f.read())["params"]
    sd = load_torch_state_dict(path)
    return convert_w2v_checkpoint(sd)


def save_ssl_params(path: str, params) -> None:
    import flax.serialization as ser

    os.makedirs(path, exist_ok=True)
    blob = ser.msgpack_serialize({"params": jax.tree_util.tree_map(
        np.asarray, params)})
    with open(os.path.join(path, "weights.msgpack"), "wb") as f:
        f.write(blob)


def load_checkpoint_for_eval(ckpt: str, spec: ModelSpec,
                             state: TrainState) -> TrainState:
    """Accepts: our full checkpoint dir, our weights-only dir, or a trained
    *reference* torch .pt (converted on the fly — the reference-user bridge)."""
    if os.path.isdir(ckpt):
        if any(os.path.exists(os.path.join(ckpt, n))
               for n in ("state.msgpack", "orbax", "orbax.prev")):
            return restore_checkpoint_any(ckpt, state)
        params, stats = load_params_only(ckpt, state.params, state.batch_stats)
        return state.replace(params=params, batch_stats=stats or state.batch_stats)
    sd = load_torch_state_dict(ckpt)
    tree = convert_reference_model(sd, spec.name)
    cast = lambda tgt, src: jax.tree_util.tree_map(
        lambda a, b: jnp.asarray(b, a.dtype), tgt, src)
    params = dict(state.params)
    params["ssl_model"] = cast(params["ssl_model"], tree["params"]["ssl_model"])
    params["backend"] = cast(params["backend"], tree["params"]["backend"])
    stats = dict(state.batch_stats)
    stats["backend"] = cast(stats["backend"], tree["batch_stats"]["backend"])
    return state.replace(params=params, batch_stats=stats)


def apply_w8(sys_config: SysConfig, exp_config: ExpConfig, state: TrainState,
             name: Optional[str] = None, kwargs: Optional[dict] = None,
             a8: bool = False) -> Tuple[ModelSpec, TrainState]:
    """Serving mode: rebuild the spec with int8 transformer matmuls and
    quantize the loaded params (models/quantize.py). ``a8=True`` adds
    dynamic int8 activation quantization (w8a8 — int8 MXU matmuls)."""
    from rtdsd_tpu.models.quantize import quantize_encoder_params

    kwargs = dict(kwargs if kwargs is not None else exp_config.kwargs)
    w2v = dict(kwargs.get("w2v", {}) or {})
    w2v["w8"] = True
    w2v["a8"] = bool(a8)
    kwargs["w2v"] = w2v
    spec = build_model(sys_config, exp_config, name=name, train=False,
                       kwargs=kwargs)
    state = state.replace(params=quantize_encoder_params(state.params))
    print("w8 scoring: XLSR transformer weights quantized to int8"
          + (" + dynamic int8 activations (w8a8)" if a8 else ""))
    return spec, state


def setup_mesh(exp_config: ExpConfig):
    mesh = make_mesh(exp_config.mesh_data_axis, exp_config.mesh_model_axis)
    return mesh, batch_sharding(mesh)


def shard_state(state: TrainState, mesh, tx=None,
                mode: Optional[str] = None) -> TrainState:
    """Place the train state onto the mesh before jit consumes it.

    Without this, params stay committed to the default device while
    device_prefetch delivers batches sharded over the whole mesh, and the
    first jitted step fails with "incompatible devices". dp replicates
    everything; fsdp/tp/fsdp+tp shard params by the mesh rules and
    re-initialize the optimizer so its moments inherit the layout.
    No-op on 1-device meshes.
    """
    import math

    import optax

    if math.prod(mesh.shape.values()) == 1:
        # still PLACE the tree: a msgpack-restored checkpoint is host
        # numpy, and leaving it unplaced makes every jitted dispatch
        # re-upload the full param tree (cli/stream.py's warm-once note)
        return jax.device_put(state)
    rep = replicated_sharding(mesh)
    mode = mode or ("fsdp+tp" if mesh.shape.get("model", 1) > 1 else "dp")
    if mode == "dp":
        return jax.device_put(state, rep)
    from rtdsd_tpu.parallel.mesh import sharding_for_tree

    shardings = sharding_for_tree(state.params, mesh, mode)
    params = jax.tree_util.tree_map(jax.device_put, state.params, shardings)
    if tx is not None:
        # place the EXISTING optimizer state (param-shaped moments get the
        # param shardings; count etc. replicated) — re-initializing here
        # would silently zero restored Adam moments and break exact resume
        opt_state = optax.tree_map_params(
            tx, lambda leaf, sh: jax.device_put(leaf, sh), state.opt_state,
            shardings,
            transform_non_params=lambda x: jax.device_put(x, rep))
    else:
        opt_state = jax.device_put(state.opt_state, rep)
    return state.replace(
        params=params, opt_state=opt_state,
        step=jax.device_put(state.step, rep),
        batch_stats=jax.device_put(state.batch_stats, rep))


def score_dataset(dataset, spec: ModelSpec, state: TrainState,
                  batch_size: int, sharding=None, num_workers: int = 4,
                  on_decode_error: str = "raise"):
    """Score every trial in dataset order; returns (utt_ids, scores).

    Readback is PIPELINED: each batch's scores stay on device while the
    next batches dispatch, and the host reads them back ``depth`` batches
    late — the per-batch host sync (device compute + link RTT; ~30 ms per
    dispatch on a remote relay) overlaps with subsequent dispatches
    instead of serializing the loop.

    Multi-process SPMD: each process's loader takes the
    ``process_index::process_count`` stripe (DistributedSampler semantics,
    ``/root/reference/main.py:33-39``), batches assemble into global
    arrays spanning all hosts, and each process reads back only its own
    rows — the returned (utt_ids, scores) are this process's stripe;
    :func:`produce_evaluation_file` merges stripes before writing.
    """
    from rtdsd_tpu.data.loader import readback_late
    from rtdsd_tpu.parallel.distributed import host_local_rows

    score_step = make_score_step(spec.module)
    loader = DataLoader(dataset, batch_size, shuffle=False, drop_last=False,
                        num_workers=num_workers, pad_last=True,
                        process_index=jax.process_index(),
                        process_count=jax.process_count(),
                        on_decode_error=on_decode_error)
    names, scores = [], []
    entries = ((score_step(state.params, state.batch_stats, b.waves),
                b.utt_ids, b.valid)
               for b in device_prefetch(loader, size=2, sharding=sharding))
    for out, ids, valid in readback_late(entries):
        s = host_local_rows(out).ravel()
        names.extend(ids[:valid])
        scores.extend(s[:valid].tolist())
    return names, scores


def _write_score_file(save_path: str, names, scores) -> None:
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    with open(save_path, "w") as fh:
        for f, cm in zip(names, scores):
            fh.write("{} {}\n".format(f, cm))
    print(f"Wrote {len(names)} scores -> {save_path}")


def tag_score_path(save_path: str, comment, path_attr: str) -> str:
    """Insert ``_{comment}`` before the ``.txt`` of a configured score path
    (ref main.py: ``save_path.replace(".txt", f"_{comment}.txt")``). A path
    without ``.txt`` is rejected: replace() would silently no-op and two
    differently-tagged runs would collide on one file (the second run then
    "skips, exists" against the wrong scores)."""
    if not comment:
        return save_path
    if ".txt" not in save_path:
        raise ValueError(
            f"--comment needs a '.txt' score path to tag; "
            f"{path_attr}={save_path!r} has none")
    return save_path.replace(".txt", f"_{comment}.txt")


def _check_score_shortfall(dataset, names) -> None:
    """A scored submission must cover every trial: with
    ``on_decode_error='skip'`` undecodable utterances would otherwise be
    silently absent from the score file (downstream EER tooling reports
    them as 'unmatched' without failing), masking corpus corruption."""
    expected = len(dataset.trials)
    if len(names) != expected:
        raise RuntimeError(
            f"scored {len(names)}/{expected} trials — "
            f"{expected - len(names)} utterance(s) were skipped "
            f"(undecodable?). A score file must cover every trial; fix "
            f"the corpus or score with on_decode_error='raise' to see "
            f"the failing files.")


def produce_evaluation_file(dataset, spec: ModelSpec, state: TrainState,
                            save_path: str, batch_size: int,
                            sharding=None, num_workers: int = 4,
                            on_decode_error: str = "raise") -> None:
    """Write the ``"{utt_id} {score}"`` CM score file — byte format identical
    to the reference (``/root/reference/main.py:199-221``); score = raw
    bonafide logit, float via python repr like ``'{}'.format(score)``.

    Multi-process: stripes are gathered from every process and re-ordered
    to dataset order (the stripe interleaving is an implementation detail;
    the written file matches the single-process row order byte for byte);
    only process 0 writes."""
    names, scores = score_dataset(dataset, spec, state, batch_size,
                                  sharding, num_workers, on_decode_error)
    names, scores = _gather_stripes(dataset, names, scores)
    _check_score_shortfall(dataset, names)
    if jax.process_index() != 0:
        return
    _write_score_file(save_path, names, scores)


def _gather_stripes(dataset, names, scores):
    """Merge per-process loader stripes into global dataset order — every
    process returns the SAME (names, scores); no-op single-process."""
    if jax.process_count() == 1:
        return names, scores
    from rtdsd_tpu.parallel.distributed import all_gather_objects

    merged = {}
    for part_names, part_scores in all_gather_objects((names, scores)):
        # stripe padding duplicates a few utts on the last process;
        # scores for a duplicated utt are identical, first write wins
        for n, s in zip(part_names, part_scores):
            merged.setdefault(n, s)
    names = [t.utt_id for t in dataset.trials if t.utt_id in merged]
    return names, [merged[n] for n in names]


def subset_dataset(dataset, indices):
    """A bare AudioDataset over a subset of ``dataset``'s trials, keeping
    its duration-fit / crop / host-augment behavior (loader interface =
    trials + duration + get, data/loader.py:103-137)."""
    from rtdsd_tpu.data.dataset import AudioDataset

    sub = AudioDataset([dataset.trials[i] for i in indices],
                       dataset.duration,
                       is_random_start=dataset.is_random_start,
                       sample_rate=dataset.sample_rate,
                       host_augment=dataset.host_augment)
    return sub


def produce_evaluation_file_cascade(
        dataset_screen, dataset_full, spec_screen: ModelSpec,
        state_screen: TrainState, spec_full: ModelSpec,
        state_full: TrainState, save_path: str, batch_size: int,
        band: float, center: float = 0.0, sharding=None,
        num_workers: int = 4) -> None:
    """Two-stage cascade scoring: the cheap screener model scores every
    trial; trials whose screener score lands in the uncertainty band
    ``|score - center| <= band`` are re-scored by the full model (fixed
    static-shape batches both passes — escalation is a second pass over a
    subset dataset, never a dynamic-shape program). Both datasets must
    enumerate the same trials in the same order (they may differ in
    duration fit). The written file keeps the reference score format.

    Multi-process: the screener stripes are merged globally BEFORE the
    escalation subset is built, so every process derives the SAME
    subset (the second pass then re-stripes it consistently — per-stripe
    subsets of different sizes would desynchronize the collectives);
    process 0 writes."""
    names, scores = score_dataset(dataset_screen, spec_screen, state_screen,
                                  batch_size, sharding, num_workers)
    names, scores = _gather_stripes(dataset_screen, names, scores)
    _check_score_shortfall(dataset_screen, names)
    esc = [i for i, sc in enumerate(scores) if abs(sc - center) <= band]
    if esc:
        sub = subset_dataset(dataset_full, esc)
        sub_names, sub_scores = score_dataset(sub, spec_full, state_full,
                                              batch_size, sharding,
                                              num_workers)
        sub_names, sub_scores = _gather_stripes(sub, sub_names, sub_scores)
        for i, name, sc in zip(esc, sub_names, sub_scores):
            if name != names[i]:  # trial-order mismatch between datasets
                raise RuntimeError(
                    f"cascade datasets disagree at index {i}: "
                    f"{names[i]!r} vs {name!r}")
            scores[i] = sc
    print(f"cascade: {len(esc)}/{len(names)} escalated "
          f"({100.0 * len(esc) / max(len(names), 1):.1f}%, "
          f"band {band} around {center})")
    if jax.process_index() != 0:
        return
    _write_score_file(save_path, names, scores)


def drop_opt_state(state: TrainState) -> TrainState:
    """Free the optimizer state on paths that never update params.

    ``init_state`` builds full AdamW moments (f32 mu+nu ≈ 2.5 GB for the
    315M flagship) so full-state checkpoints restore against a matching
    template; eval/scoring/teacher paths then carry that dead tree onto
    the device, eating exactly the HBM headroom large scoring batches
    need. Dropping it after the restore lets JAX free the buffers before
    the first scoring dispatch.
    """
    return state.replace(opt_state=())


def load_eval_model(sys_config: SysConfig, exp_config: ExpConfig, ckpt: str,
                    w8: bool = False, w8a8: bool = False,
                    name: Optional[str] = None,
                    kwargs: Optional[dict] = None):
    """Shared eval-path setup: build spec (optionally a non-default model,
    e.g. a KD student via ``name``/``kwargs``), restore checkpoint, drop
    the never-used optimizer state, optionally quantize (w8/w8a8, config
    flags OR'd in), and place the state on the mesh (dp).
    Returns (spec, state, mesh, batch_sharding)."""
    mesh, bsharding = setup_mesh(exp_config)
    spec = build_model(sys_config, exp_config, name=name, train=False,
                       kwargs=kwargs)
    state = init_state(spec, sys_config, exp_config, jax.random.key(0))
    state = load_checkpoint_for_eval(ckpt, spec, state)
    state = drop_opt_state(state)
    print(f"Loaded checkpoint from {ckpt}")
    a8 = w8a8 or exp_config.w8a8_scoring
    if a8 or w8 or exp_config.w8_scoring:
        spec, state = apply_w8(sys_config, exp_config, state,
                               name=name, kwargs=kwargs, a8=a8)
    state = shard_state(state, mesh, mode="dp")
    return spec, state, mesh, bsharding
