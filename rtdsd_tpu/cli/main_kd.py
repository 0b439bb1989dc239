"""Knowledge-distillation CLI.

Mirrors the reference KD entry (``/root/reference/main_kd.py:265-286``):

    python -m rtdsd_tpu.cli.main_kd --config kd.yaml --ckpt teacher_ckpt
    python -m rtdsd_tpu.cli.main_kd --config kd.yaml --is_eval \\
        --eval student --ckpt student_ckpt --is_score --tracks DF21

YAML schema is the reference's: ``SysConfig.model`` /
``SysConfig.student_model``, ``ExpConfig.kwargs`` (teacher),
``ExpConfig.kd_kwargs`` with ``student_kwargs``, ``copy_weights``,
``custom_order_copy_weights``, ``ce_loss_weight``, ``kd_criterions``,
``kd_criterion_weights``.

Reference defects fixed (SURVEY.md §3.3): optimizer over the student's
params; criteria built once; working imports.
"""

from __future__ import annotations

from rtdsd_tpu.utils.cache import enable_persistent_compile_cache

enable_persistent_compile_cache()

import argparse
import os
import sys

import jax

from rtdsd_tpu.config import load_yaml_config
from rtdsd_tpu.cli.common import (build_model, init_state,
                                  load_checkpoint_for_eval,
                                  produce_evaluation_file, setup_mesh,
                                  shard_state, tag_score_path)
from rtdsd_tpu.cli.main import TRACK_DATASETS, validate_tracks
from rtdsd_tpu.data.dataset import ASVspoof2019LA
from rtdsd_tpu.data.loader import DataLoader
from rtdsd_tpu.engine.checkpoint import save_checkpoint, save_checkpoint_async
from rtdsd_tpu.engine.kd import KDTrainer, copy_teacher_weights
from rtdsd_tpu.engine.steps import make_optimizer
from rtdsd_tpu.models.wav2vec2 import resolve_layer_indices
from rtdsd_tpu.utils.logging import Logger
from rtdsd_tpu.utils.rng import set_seed


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="./configs/kd.yaml", type=str)
    p.add_argument("--is_eval", action="store_true", default=False)
    p.add_argument("--eval", default="teacher",  # ref main_kd.py:275-276
                   choices=["teacher", "student"])
    p.add_argument("--ckpt", default=None, type=str)
    p.add_argument("--comment", default=None, type=str)
    p.add_argument("--is_score", action="store_true", default=False)
    p.add_argument("--accuracy", action="store_true", default=False)
    p.add_argument("--tracks", type=str, default="DF21")
    p.add_argument("--max_epoch", type=int, default=None)
    p.add_argument("--w8a8", action="store_true", default=False,
                   help="int8 weights + dynamic int8 activations")
    p.add_argument("--w8", action="store_true", default=False,
                   help="weight-only int8 scoring (overrides "
                        "ExpConfig.w8_scoring)")
    return p.parse_args(argv)


def build_student(sys_config, exp_config):
    kd = exp_config.kd_kwargs or {}
    student_kwargs = kd.get("student_kwargs", {})
    return build_model(sys_config, exp_config, name=sys_config.student_model,
                       train=True, kwargs=student_kwargs), student_kwargs


def run_kd_train(args, sys_config, exp_config):
    rng = set_seed(exp_config.random_seed)
    logger = Logger(jax.process_index(), sys_config,
                    metrics_path=os.path.join(sys_config.path_to_save_model,
                                              "kd_metrics.jsonl"))
    mesh, bsharding = setup_mesh(exp_config)
    kd = exp_config.kd_kwargs or {}

    # teacher (frozen) + trained checkpoint
    teacher_spec = build_model(sys_config, exp_config, train=False)
    t_state = init_state(teacher_spec, sys_config, exp_config, rng)
    if args.ckpt:
        t_state = load_checkpoint_for_eval(args.ckpt, teacher_spec, t_state)
        logger.print(f"Load Teacher checkpoint from {args.ckpt}")
    # the teacher never updates: free its ~2.5 GB of AdamW moments (built
    # only so full-state checkpoints restore against a matching template)
    from rtdsd_tpu.cli.common import drop_opt_state

    t_state = drop_opt_state(t_state)
    t_state = shard_state(t_state, mesh, mode="dp")
    teacher_variables = {"params": t_state.params}
    if t_state.batch_stats:
        teacher_variables["batch_stats"] = t_state.batch_stats

    # student
    student_spec, student_kwargs = build_student(sys_config, exp_config)
    tx = make_optimizer(exp_config.lr, exp_config.weight_decay,
                        student_spec.freeze_patterns,
                        student_spec.unfreeze_patterns,
                        optimizer=exp_config.optimizer,
                        mu_dtype=exp_config.adam_mu_dtype)
    s_state = init_state(student_spec, sys_config, exp_config,
                         jax.random.fold_in(rng, 1), tx)

    n_t = sum(x.size for x in jax.tree_util.tree_leaves(t_state.params))
    n_s = sum(x.size for x in jax.tree_util.tree_leaves(s_state.params))
    logger.print(f"Number of teacher model parameters: {n_t}")
    logger.print(f"Number of student model parameters: {n_s}")

    # teacher -> student weight copy (ref main_kd.py:127-141)
    if kd.get("copy_weights", False):  # ref default False, main_kd.py:90
        order = student_kwargs.get("order", "first")
        custom = kd.get("custom_order_copy_weights",
                        student_kwargs.get("custom_order"))
        # indices index the TEACHER's layer stack (ref main_kd.py:133-141;
        # 24 for the full XLSR teacher, fewer for a pruned one) — resolving
        # against the real depth rejects out-of-range custom orders instead
        # of letting jnp.take clamp to the wrong layer
        total = len(teacher_spec.layer_indices)
        indices = resolve_layer_indices(
            total, int(student_kwargs.get("num_layers", total)), order,
            custom)
        params = copy_teacher_weights(s_state.params, t_state.params, indices)
        s_state = s_state.replace(params=params, opt_state=tx.init(params))
        logger.print("Copied teacher weights to student "
                     f"(layer map {indices})")
    if exp_config.restore_checkpoint:
        # student crash-resume (full state incl. optimizer; pairs with the
        # rolling `last_kd` checkpoint written each epoch below)
        s_state = load_checkpoint_for_eval(exp_config.restore_checkpoint,
                                           student_spec, s_state)
        logger.print(f"restored student {exp_config.restore_checkpoint}")
    s_state = shard_state(s_state, mesh, tx, exp_config.parallel_mode or None)

    train_set = ASVspoof2019LA(sys_config, exp_config, is_train=True)
    dev_set = ASVspoof2019LA(sys_config, exp_config, is_train=False)
    mk_loader = lambda ds, bs, sh: DataLoader(
        ds, bs, shuffle=sh, drop_last=sh, seed=exp_config.random_seed,
        num_workers=sys_config.num_workers,
        process_index=jax.process_index(), process_count=jax.process_count(),
        on_decode_error=sys_config.decode_error_policy)
    trainer = KDTrainer(
        teacher_spec.module, teacher_variables, student_spec.module, s_state,
        tx, kd, mk_loader(train_set, exp_config.batch_size_train, True),
        mk_loader(dev_set, exp_config.batch_size_test, False), None, logger,
        exp_config, sys_config, bsharding, rng_seed=exp_config.random_seed)

    if args.accuracy:
        loss, acc = trainer.test(is_dev=True)
        logger.print(f"Student dev acc: {acc}, loss: {loss}")
        return

    # same robustness surface as the main CLI epoch loop (cli/main.py):
    # rolling crash-resume `last`, optional EER early stopping, async saves
    from rtdsd_tpu.utils.metrics import EarlyStopping

    patience = int(exp_config.kwargs.get("early_stop_patience", 0) or 0)
    stopper = EarlyStopping(patience=patience,
                            save_dir=sys_config.path_to_save_model) \
        if patience > 0 else None

    best_loss = float("inf")
    ckpt_handle = None
    for epoch in range(args.max_epoch or exp_config.max_epoch):
        trainer.train()
        dev_loss, dev_acc = trainer.test(is_dev=True)
        logger.print(f"epoch {epoch}: student dev loss {dev_loss:.5f} "
                     f"acc {dev_acc:.2f}")
        if dev_loss < best_loss and jax.process_index() == 0:
            best_loss = dev_loss
            name = f"student_best_epoch{epoch}_{dev_loss:.5f}_{dev_acc:.2f}"
            path = os.path.join(sys_config.path_to_save_model, name)
            ckpt_handle = save_checkpoint_async(
                path, trainer.state,
                meta={"epoch": epoch, "dev_loss": dev_loss,
                      "dev_acc": dev_acc, "kind": "student"})
            logger.print(f"saved {path}")
        if jax.process_index() == 0:
            ckpt_handle = save_checkpoint_async(
                os.path.join(sys_config.path_to_save_model, "last_kd"),
                trainer.state, meta={"epoch": epoch, "dev_loss": dev_loss,
                                     "kind": "student"})
        if stopper is not None:
            # all ranks update the stopper (consistent stop decision);
            # only rank 0 writes its best-checkpoint
            stopper(dev_loss, epoch,
                    lambda p: save_checkpoint(p, trainer.state,
                                              meta={"epoch": epoch,
                                                    "kind": "student"})
                    if jax.process_index() == 0 else None)
            if stopper.early_stop:
                logger.print(f"early stop at epoch {epoch} "
                             f"(patience {patience})")
                break
    if ckpt_handle is not None:  # commit the in-flight save before exit
        ckpt_handle.wait_until_finished()
    logger.close()


def run_kd_score(args, sys_config, exp_config, tracks):
    from rtdsd_tpu.cli.common import load_eval_model

    validate_tracks(tracks)  # fail fast, before any checkpoint IO
    set_seed(exp_config.random_seed)
    if args.eval == "teacher":
        name, kwargs = None, None
    else:
        kd = exp_config.kd_kwargs or {}
        name = sys_config.student_model
        kwargs = kd.get("student_kwargs", {})
    spec, state, _mesh, bsharding = load_eval_model(
        sys_config, exp_config, args.ckpt,
        w8=getattr(args, "w8", False), w8a8=getattr(args, "w8a8", False),
        name=name, kwargs=kwargs)
    for track in tracks:
        ds_cls, path_attr = TRACK_DATASETS[track]
        save_path = tag_score_path(getattr(sys_config, path_attr),
                                   args.comment, path_attr)
        if os.path.exists(save_path):
            print(f"{track}: score file exists, skip")
            continue
        produce_evaluation_file(ds_cls(sys_config, exp_config), spec, state,
                                save_path, exp_config.batch_size_test,
                                bsharding, sys_config.num_workers,
                                sys_config.decode_error_policy)


def main(argv=None):
    from rtdsd_tpu.parallel.distributed import maybe_initialize_distributed

    maybe_initialize_distributed()  # before any jax device use
    args = parse_args(argv)
    sys_config, exp_config = load_yaml_config(args.config)
    if args.is_eval:
        sys_config.wandb_disabled = True
        if args.ckpt is None:
            raise ValueError("ckpt is None")
        if args.is_score:
            run_kd_score(args, sys_config, exp_config, args.tracks.split(","))
            return
    run_kd_train(args, sys_config, exp_config)


if __name__ == "__main__":
    main(sys.argv[1:])
