"""Epoch-level training engine.

API mirrors the reference ``Trainer`` (``/root/reference/trainer.py:12-139``):
``train()`` runs one epoch with 2%-interval loss logging and epoch train
accuracy; ``test(is_dev)`` returns ``(eval_loss, accuracy)`` with the same
weighted-loss accounting (``loss.item() * batch_size`` summed / total).
Differences (all upgrades, documented in SURVEY.md §7):

- the whole batch body is one jitted SPMD step (see
  :mod:`rtdsd_tpu.engine.steps`);
- the loader reshuffles per epoch (reference never called
  ``sampler.set_epoch``);
- EER is computed in-framework on dev scores each ``test()`` call (the
  reference defined ``calculate_EER`` but never invoked it).
"""

from __future__ import annotations

import time
from typing import Optional, Tuple

import jax
import numpy as np

from rtdsd_tpu.config import ExpConfig, SysConfig
from rtdsd_tpu.data.loader import DataLoader, device_prefetch
from rtdsd_tpu.engine.steps import (TrainState, make_eval_step,
                                    post_device_augs, pre_device_augs,
                                    make_train_step, pick_rawboost_algo)
from rtdsd_tpu.utils.logging import Logger
from rtdsd_tpu.utils.metrics import compute_eer


class Trainer:
    def __init__(self, model, state: TrainState, tx, train_loader: DataLoader,
                 dev_loader: Optional[DataLoader],
                 test_loader: Optional[DataLoader], logger: Logger,
                 exp_config: ExpConfig, sys_config: SysConfig,
                 mesh=None, batch_sharding=None, rng_seed: int = 1024):
        self.model = model
        self.state = state
        self.train_loader = train_loader
        self.dev_loader = dev_loader
        self.test_loader = test_loader
        self.logger = logger
        self.exp_config = exp_config
        self.sys_config = sys_config
        self.mesh = mesh
        self.batch_sharding = batch_sharding
        self.epoch = 0
        self._key = jax.random.key(rng_seed)

        preemph = exp_config.pre_emphasis if exp_config.is_pre_emphasis else None
        da = list(exp_config.data_augmentation or [])
        self.train_step = make_train_step(
            model, tx, ce_weight=tuple(exp_config.ce_weight), preemph=preemph,
            rawboost_algo=pick_rawboost_algo(da),
            pre_aug_list=pre_device_augs(da),
            aug_list=post_device_augs(da, exp_config.allow_data_augmentation),
            sample_rate=float(exp_config.sample_rate),
            # device_prefetch hands the step fresh per-batch buffers; donating
            # them lets XLA reuse the 12-49 MB wave buffer for temporaries
            # (only .shape is read after the call)
            donate_batch=True)
        self.eval_step = make_eval_step(
            model, ce_weight=tuple(exp_config.ce_weight), preemph=preemph)

    # ----------------------------------------------------------------- train

    def train(self) -> float:
        """One epoch. Returns mean train loss."""
        self.train_loader.set_epoch(self.epoch)
        num_batches = len(self.train_loader)
        log_every = max(int(num_batches * 0.02), 1)  # ref trainer.py:74
        loss_sum = 0.0
        iter_count = 0
        epoch_loss = 0.0
        batches_seen = 0  # actual divisor for the epoch mean: robust to a
        # loader yielding fewer batches than len() or a future early break
        num_correct = 0
        num_total = 0
        t0 = time.time()

        # metrics stay on device between log points: a float() every step
        # would force a host sync per step and serialize dispatch (expensive
        # on high-latency links; a pipeline bubble everywhere)
        pending = []
        batches = device_prefetch(self.train_loader,
                                  size=self.exp_config.prefetch,
                                  sharding=self.batch_sharding)
        for step_idx, batch in enumerate(batches):
            self.state, metrics = self.train_step(
                self.state, batch.waves, batch.labels, self._key)
            pending.append(metrics)
            num_total += batch.waves.shape[0]
            iter_count += 1
            batches_seen += 1
            if iter_count >= log_every:
                losses = [float(m["loss"]) for m in pending]
                num_correct += sum(int(m["num_correct"]) for m in pending)
                loss_sum = sum(losses)
                epoch_loss += loss_sum
                pending = []
                self.logger.wandbLog({"Loss": loss_sum / iter_count},
                                     step=int(self.state.step))
                iter_count = 0
        if pending:
            losses = [float(m["loss"]) for m in pending]
            num_correct += sum(int(m["num_correct"]) for m in pending)
            epoch_loss += sum(losses)

        acc = 100.0 * num_correct / max(num_total, 1)
        self.logger.wandbLog({"Train Acc": acc})
        self.logger.print(
            f"epoch {self.epoch}: train loss {epoch_loss / max(batches_seen, 1):.5f} "
            f"acc {acc:.2f}% ({time.time() - t0:.1f}s, "
            f"{num_total / max(time.time() - t0, 1e-9):.1f} utt/s)")
        self.epoch += 1
        return epoch_loss / max(batches_seen, 1)

    # ------------------------------------------------------------------ eval

    def test(self, is_dev: bool = False) -> Tuple[float, float]:
        loader = self.dev_loader if is_dev else self.test_loader
        return self._test(loader, mode="validation" if is_dev else "evaluation")

    def _test(self, loader: DataLoader, mode: str = "evaluation"
              ) -> Tuple[float, float]:
        eval_loss, accuracy, scores, labels = run_eval_loop(
            self.eval_step, self.state, loader, self.exp_config.prefetch,
            self.batch_sharding)
        logs = {"Dev Acc": accuracy, "Dev Loss": eval_loss}
        if len(np.unique(labels)) == 2:
            logs["Dev EER"] = self.calculate_EER(scores, labels)
        self.logger.wandbLog(logs)
        return eval_loss, accuracy

    @staticmethod
    def calculate_EER(scores, labels) -> float:
        """Percent EER (ref trainer.py:134-139 semantics)."""
        return compute_eer(scores, labels, pos_label=1)


def run_eval_loop(eval_step, state, loader, prefetch, batch_sharding
                  ) -> Tuple[float, float, np.ndarray, np.ndarray]:
    """Shared dev/eval pass (Trainer and KDTrainer): pad-row-aware weighted
    loss, accuracy, and the per-trial (scores, labels) for EER. Returns
    ``(eval_loss, accuracy, scores, labels)``.

    Multi-process SPMD: each process reads back only its own rows of the
    global batch (its loader stripe), then partial sums / score stripes
    are gathered and reduced so every process returns the SAME global
    (loss, acc, scores, labels) — the checkpoint-on-dev-loss decision in
    the epoch loop must agree across hosts."""
    from rtdsd_tpu.data.loader import readback_late
    from rtdsd_tpu.parallel.distributed import (all_gather_objects,
                                                host_local_rows)

    loss_sum = 0.0
    num_correct = 0
    num_total = 0
    scores = []
    labels = []
    entries = ((eval_step(state.params, state.batch_stats,
                          b.waves, b.labels), b.labels, b.valid)
               for b in device_prefetch(loader, size=prefetch,
                                        sharding=batch_sharding))
    # results stay on device while later batches dispatch (overlaps
    # device latency + link RTT)
    for out, blabels, v in readback_late(entries):
        # weighted mean over the REAL rows only — the padded-batch mean
        # would count the duplicated pad rows (ref trainer.py:335-337
        # never sees pad rows)
        terms = host_local_rows(out["loss_terms"])[:v]
        wsum = float(host_local_rows(out["loss_weights"])[:v].sum())
        loss_sum += float(terms.sum()) / max(wsum, 1e-12) * v
        num_correct += int(host_local_rows(out["correct"])[:v].sum())
        num_total += v
        scores.append(host_local_rows(out["scores"])[:v])
        labels.append(host_local_rows(blabels)[:v])
    scores = np.concatenate(scores) if scores else np.zeros(0)
    labels = np.concatenate(labels) if labels else np.zeros(0)
    if jax.process_count() > 1:
        parts = all_gather_objects(
            (loss_sum, num_correct, num_total, scores, labels))
        loss_sum = sum(p[0] for p in parts)
        num_correct = sum(p[1] for p in parts)
        num_total = sum(p[2] for p in parts)
        scores = np.concatenate([p[3] for p in parts])
        labels = np.concatenate([p[4] for p in parts])
    eval_loss = loss_sum / max(num_total, 1)
    accuracy = 100.0 * num_correct / max(num_total, 1)
    return eval_loss, accuracy, scores, labels
