"""Train / evaluate / score CLI.

Flag surface mirrors the reference entry script
(``/root/reference/main.py:224-246``):

    python -m rtdsd_tpu.cli.main --config cfg.yaml                 # train
    python -m rtdsd_tpu.cli.main --config cfg.yaml --accuracy \\
        --ckpt runs/best                                           # test acc
    python -m rtdsd_tpu.cli.main --config cfg.yaml --is_eval --is_score \\
        --ckpt runs/best --tracks LA19,LA21,DF21,InTheWild,ASVspoof5

Differences from the reference launch model (SURVEY.md §2.2-2.3): no
``mp.spawn``/NCCL — data parallelism is SPMD over a ``jax.sharding.Mesh``
inside one process per host (multi-host via ``jax.distributed.initialize()``
when JAX_COORDINATOR is set). ``--ckpt`` accepts this framework's checkpoint
dirs *or* a trained reference ``.pt`` (converted on the fly).
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
from rtdsd_tpu.data.dataset import (ASVspoof2019LA, ASVspoof2019LA_eval,
                                    ASVspoof2021DF_eval, ASVspoof2021LA_eval,
                                    ASVSpoof5, FakeOrReal, InTheWild)
from rtdsd_tpu.data.loader import DataLoader
from rtdsd_tpu.engine.checkpoint import save_checkpoint, save_checkpoint_async
from rtdsd_tpu.engine.steps import make_optimizer
from rtdsd_tpu.engine.trainer import Trainer
from rtdsd_tpu.utils.logging import Logger
from rtdsd_tpu.utils.rng import set_seed


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="./configs/paper.yaml", type=str)
    p.add_argument("--is_eval", action="store_true", default=False)
    p.add_argument("--ckpt", default=None, type=str)
    p.add_argument("--comment", default=None, type=str,
                   help="suffix appended to score file names")
    p.add_argument("--is_score", action="store_true", default=False)
    p.add_argument("--accuracy", action="store_true", default=False)
    p.add_argument("--score_all_folder_path", type=str, default=None)
    p.add_argument("--tracks", type=str, default="DF21",
                   help="comma list: LA19/LA21/DF21/InTheWild/ASVspoof5/FakeOrReal")
    p.add_argument("--max_epoch", type=int, default=None,
                   help="override ExpConfig.max_epoch")
    p.add_argument("--w8", action="store_true", default=False,
                   help="weight-only int8 scoring (overrides "
                        "ExpConfig.w8_scoring)")
    p.add_argument("--w8a8", action="store_true", default=False,
                   help="int8 weights + dynamic int8 activations (int8 MXU "
                        "matmuls; overrides ExpConfig.w8a8_scoring)")
    p.add_argument("--cascade_ckpt", type=str, default=None,
                   help="cascade scoring: checkpoint of a cheap screener "
                        "model that scores every trial first; trials inside "
                        "the uncertainty band escalate to --ckpt's model")
    p.add_argument("--cascade_config", type=str, default=None,
                   help="screener YAML (model/kwargs/duration/quant flags; "
                        "dataset paths still come from --config). Default: "
                        "--config itself")
    p.add_argument("--cascade_band", type=float, default=2.0,
                   help="escalate when |screener score - center| <= band "
                        "(logit units)")
    p.add_argument("--cascade_center", type=float, default=0.0,
                   help="center of the uncertainty band (decision "
                        "threshold, ~0 for bonafide-logit scores)")
    return p.parse_args(argv)


TRACK_DATASETS = {
    "LA19": (ASVspoof2019LA_eval, "la19_score_save_path"),
    "LA21": (ASVspoof2021LA_eval, "la21_score_save_path"),
    "DF21": (ASVspoof2021DF_eval, "df21_score_save_path"),
    "InTheWild": (InTheWild, "itw_score_save_path"),
    "ASVspoof5": (ASVSpoof5, "asvspoof5_score_save_path"),
    "FakeOrReal": (FakeOrReal, "itw_score_save_path"),
}


def validate_tracks(tracks) -> None:
    for track in tracks:
        if track not in TRACK_DATASETS:
            raise ValueError(f"Invalid track {track!r}; "
                             f"have {sorted(TRACK_DATASETS)}")


def run_train(args, sys_config, exp_config):
    from rtdsd_tpu.parallel.distributed import maybe_initialize_distributed

    maybe_initialize_distributed()
    rng = set_seed(exp_config.random_seed)
    logger = Logger(jax.process_index(), sys_config,
                    metrics_path=os.path.join(sys_config.path_to_save_model,
                                              "metrics.jsonl"))
    mesh, bsharding = setup_mesh(exp_config)
    logger.print(f"devices: {jax.device_count()} mesh: {dict(mesh.shape)}")

    train_set = ASVspoof2019LA(sys_config, exp_config, is_train=True)
    dev_set = ASVspoof2019LA(sys_config, exp_config, is_train=False)
    logger.print(f"train: {len(train_set)} utts "
                 f"({train_set.num_of_spoof} spoof / "
                 f"{train_set.num_of_bonafide} bonafide), dev: {len(dev_set)}")
    mk_loader = lambda ds, bs, sh: DataLoader(
        ds, bs, shuffle=sh, drop_last=sh, seed=exp_config.random_seed,
        num_workers=sys_config.num_workers,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        on_decode_error=sys_config.decode_error_policy)
    train_loader = mk_loader(train_set, exp_config.batch_size_train, True)
    dev_loader = mk_loader(dev_set, exp_config.batch_size_test, False)

    spec = build_model(sys_config, exp_config, train=True)
    tx = make_optimizer(exp_config.lr, exp_config.weight_decay,
                        spec.freeze_patterns, spec.unfreeze_patterns,
                        optimizer=exp_config.optimizer,
                        mu_dtype=exp_config.adam_mu_dtype)
    state = init_state(spec, sys_config, exp_config, rng, tx)

    if exp_config.restore_checkpoint:
        state = load_checkpoint_for_eval(exp_config.restore_checkpoint, spec,
                                         state)
        logger.print(f"restored {exp_config.restore_checkpoint}")
    elif args.ckpt:
        state = load_checkpoint_for_eval(args.ckpt, spec, state)
        logger.print(f"loaded ckpt {args.ckpt}")
    state = shard_state(state, mesh, tx, exp_config.parallel_mode or None)

    # reference test loader is the DF21 eval set (main.py:70); fall back to
    # dev when its paths aren't configured
    test_loader = dev_loader
    if args.accuracy and sys_config.path_label_asv_spoof_2021_df_eval:
        test_loader = mk_loader(ASVspoof2021DF_eval(sys_config, exp_config),
                                exp_config.batch_size_test, False)
    trainer = Trainer(spec.module, state, tx, train_loader, dev_loader,
                      test_loader, logger, exp_config, sys_config, mesh,
                      bsharding, rng_seed=exp_config.random_seed)

    if args.accuracy:  # reference --accuracy mode (main.py:190-194: the
        # DF21 eval set, not the dev set)
        loss, acc = trainer.test(is_dev=test_loader is dev_loader)
        logger.print(f"Test acc: {acc}, Test loss: {loss}")
        return

    # epoch loop with best-checkpoint logic (ref main.py:144-183: save when
    # dev loss improves and dev acc > 95; full-state checkpoint here).
    # Optional EER-based early stopping (the reference defines EarlyStopping
    # but never wires it, utils.py:54-98; enable via kwargs.early_stop_patience)
    from rtdsd_tpu.utils.metrics import EarlyStopping

    patience = int(exp_config.kwargs.get("early_stop_patience", 0) or 0)
    stopper = EarlyStopping(patience=patience,
                            save_dir=sys_config.path_to_save_model) \
        if patience > 0 else None

    best_loss = float("inf")
    best_acc, best_loss_epoch, best_acc_epoch = 0.0, -1, -2
    max_epoch = args.max_epoch or exp_config.max_epoch
    ckpt_handle = None
    for epoch in range(max_epoch):
        trainer.train()
        dev_loss, dev_acc = trainer.test(is_dev=True)
        logger.print(f"epoch {epoch}: dev loss {dev_loss:.5f} acc {dev_acc:.2f}")
        # both reference save triggers (main.py:155-168): dev-loss improved
        # with acc > 95, OR a new best accuracy > 95 in a different epoch
        save = False
        if dev_loss < best_loss and dev_acc > 95:
            best_loss, best_loss_epoch, save = dev_loss, epoch, True
        if dev_acc > best_acc:
            best_acc, best_acc_epoch = dev_acc, epoch
            if best_acc_epoch != best_loss_epoch and best_acc > 95:
                save = True
        # epoch-loop saves are async (orbax AsyncCheckpointer) so a 315M
        # full-state write streams to disk while the next epoch trains
        if save and jax.process_index() == 0:
            name = f"best_LA_epoch{epoch}_{dev_loss:.5f}_{dev_acc:.2f}"
            path = os.path.join(sys_config.path_to_save_model, name)
            ckpt_handle = save_checkpoint_async(
                path, trainer.state, meta={"epoch": epoch,
                                           "dev_loss": dev_loss,
                                           "dev_acc": dev_acc})
            logger.print(f"saved {path}")
        if jax.process_index() == 0:
            # rolling crash-resume checkpoint (full state incl. optimizer)
            ckpt_handle = save_checkpoint_async(
                os.path.join(sys_config.path_to_save_model, "last"),
                trainer.state, meta={"epoch": epoch, "dev_loss": dev_loss})
        if stopper is not None:
            # all ranks update the stopper (consistent stop decision);
            # only rank 0 writes its best-checkpoint
            stopper(dev_loss, epoch,
                    lambda p: save_checkpoint(p, trainer.state,
                                              meta={"epoch": epoch})
                    if jax.process_index() == 0 else None)
            if stopper.early_stop:
                logger.print(f"early stop at epoch {epoch} "
                             f"(patience {patience})")
                break
    if ckpt_handle is not None:  # commit the in-flight save before exit
        ckpt_handle.wait_until_finished()
    logger.close()


def run_score(args, sys_config, exp_config, tracks):
    from rtdsd_tpu.cli.common import (load_eval_model,
                                      produce_evaluation_file_cascade)

    validate_tracks(tracks)
    set_seed(exp_config.random_seed)
    spec, state, mesh, bsharding = load_eval_model(
        sys_config, exp_config, args.ckpt,
        w8=getattr(args, "w8", False), w8a8=getattr(args, "w8a8", False))

    cascade_ckpt = getattr(args, "cascade_ckpt", None)
    if cascade_ckpt:
        # screener model: its own YAML decides model/kwargs/duration/quant;
        # dataset paths always come from the primary config
        if getattr(args, "cascade_config", None):
            screen_sys, screen_exp = load_yaml_config(args.cascade_config)
        else:
            screen_sys, screen_exp = sys_config, exp_config
        spec_s, state_s, _, _ = load_eval_model(screen_sys, screen_exp,
                                                cascade_ckpt)

    for track in tracks:
        ds_cls, path_attr = TRACK_DATASETS[track]
        save_path = tag_score_path(getattr(sys_config, path_attr),
                                   args.comment, path_attr)
        if os.path.exists(save_path):  # idempotence (ref main.py:297,409)
            print(f"{track}: score file exists, skip")
            continue
        print(f"Evaluating {track}")
        dataset = ds_cls(sys_config, exp_config)
        if cascade_ckpt:
            # screener may crop to its own test duration
            ds_screen = (dataset if screen_exp is exp_config
                         else ds_cls(sys_config, screen_exp))
            produce_evaluation_file_cascade(
                ds_screen, dataset, spec_s, state_s, spec, state,
                save_path, exp_config.batch_size_test,
                band=args.cascade_band, center=args.cascade_center,
                sharding=bsharding, num_workers=sys_config.num_workers)
        else:
            produce_evaluation_file(dataset, spec, state, save_path,
                                    exp_config.batch_size_test, bsharding,
                                    sys_config.num_workers,
                                    sys_config.decode_error_policy)


def main(argv=None):
    from rtdsd_tpu.parallel.distributed import maybe_initialize_distributed

    # before ANY jax device use — eval/scoring paths stripe their loaders
    # by process too (run_train's own call is then a no-op)
    maybe_initialize_distributed()
    args = parse_args(argv)
    tracks = args.tracks.split(",")
    if args.is_eval and (args.is_score or args.score_all_folder_path):
        validate_tracks(tracks)  # fail fast, before any checkpoint IO
    sys_config, exp_config = load_yaml_config(args.config)

    if args.is_eval:
        sys_config.wandb_disabled = True
        if args.score_all_folder_path:
            # score every checkpoint in a folder (ref main.py:258-371)
            base_comment = args.comment or ""
            for name in sorted(os.listdir(args.score_all_folder_path)):
                ckpt = os.path.join(args.score_all_folder_path, name)
                if not (os.path.isdir(ckpt) or ckpt.endswith(".pt")):
                    continue
                args.ckpt = ckpt
                args.comment = f"{base_comment}_{name}" if base_comment \
                    else name
                run_score(args, sys_config, exp_config, tracks)
            return
        if args.ckpt is None:
            raise ValueError("ckpt is None")
        if args.is_score:
            run_score(args, sys_config, exp_config, tracks)
            return
    run_train(args, sys_config, exp_config)


if __name__ == "__main__":
    main(sys.argv[1:])
