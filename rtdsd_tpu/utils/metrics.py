"""Metrics: EER, running averages, early stopping.

The reference computes EER with sklearn's ROC + a brentq root-find
(``/root/reference/trainer.py:134-139``) but never calls it in the loop, and
delegates official numbers to the external ASVspoof toolkit. This rebuild
makes EER first-class (pure numpy, no root-finder needed: EER is where
FAR crosses FRR on the sorted-score sweep) and keeps an
sklearn/brentq-compatible definition so numbers line up.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def compute_eer(scores: np.ndarray, labels: np.ndarray, pos_label: int = 1) -> float:
    """Equal error rate in percent.

    ``scores``: higher = more likely bonafide (positive class).
    ``labels``: 1 = bonafide, 0 = spoof (reference convention,
    ``/root/reference/data/train_set.py:26``).

    Matches ``brentq(lambda x: 1 - x - interp1d(fpr, tpr)(x))``
    (/root/reference/trainer.py:137-139) to float precision: we find the
    crossing of FNR (=1-TPR) and FPR along the ROC curve and linearly
    interpolate between the two bracketing thresholds.
    """
    scores = np.asarray(scores, dtype=np.float64).ravel()
    labels = np.asarray(labels).ravel()
    n_pos = int(np.sum(labels == pos_label))
    n_neg = len(labels) - n_pos
    if n_pos == 0 or n_neg == 0:
        raise ValueError("compute_eer needs both positive and negative trials")

    # Sweep the accept-threshold down the score-sorted trials: FPR rises from
    # 0 to 1, FNR falls from 1 to 0; EER is at the crossing.
    order = np.argsort(-scores, kind="mergesort")
    is_pos = (labels[order] == pos_label).astype(np.float64)
    tp = np.cumsum(is_pos)
    fp = np.cumsum(1.0 - is_pos)
    fpr = fp / n_neg
    fnr = 1.0 - tp / n_pos

    # Find first index where FNR <= FPR, interpolate between it and previous.
    diff = fnr - fpr
    idx = int(np.argmax(diff <= 0))
    if idx == 0:
        eer = (fpr[0] + fnr[0]) / 2.0
    else:
        # Linear interpolation of the crossing point between idx-1 and idx.
        d0, d1 = diff[idx - 1], diff[idx]
        t = d0 / (d0 - d1) if d0 != d1 else 0.5
        eer = (1 - t) * fpr[idx - 1] + t * fpr[idx]
        eer_f = (1 - t) * fnr[idx - 1] + t * fnr[idx]
        eer = (eer + eer_f) / 2.0
    return float(eer * 100.0)


class AverageMeter:
    """Running weighted average (reference: ``/root/reference/utils.py:117-133``)."""

    def __init__(self, name: str = "meter", fmt: str = ":f"):
        self.name = name
        self.fmt = fmt
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)

    def __str__(self):
        return f"{self.name} {self.val:.6f} ({self.avg:.6f})"


class EarlyStopping:
    """EER-gated early stopping with best-checkpoint rotation.

    Functional equivalent of ``/root/reference/utils.py:54-98`` (which exists
    but is unused by the reference mains); here it is wired into the trainer.
    The ``save_fn`` callback receives the destination path, so the engine
    decides the serialization format.
    """

    def __init__(self, patience: int = 7, verbose: bool = False, delta: float = 0.0,
                 save_dir: str = ".", prefix: str = "best_checkpoint"):
        self.patience = patience
        self.verbose = verbose
        self.delta = delta
        self.save_dir = save_dir
        self.prefix = prefix
        self.counter = 0
        self.best_score: Optional[float] = None
        self.early_stop = False
        self.best_path: Optional[str] = None

    def __call__(self, metric: float, epoch: int, save_fn) -> bool:
        """Lower metric (e.g. EER or dev loss) is better. Returns True if improved."""
        score = -metric
        if self.best_score is None or score > self.best_score + self.delta:
            self.best_score = score
            path = os.path.join(self.save_dir, f"{self.prefix}_{epoch}")
            os.makedirs(self.save_dir, exist_ok=True)
            save_fn(path)
            if self.best_path and self.best_path != path and os.path.exists(self.best_path):
                import shutil

                shutil.rmtree(self.best_path, ignore_errors=True)
            self.best_path = path
            self.counter = 0
            return True
        self.counter += 1
        if self.counter >= self.patience:
            self.early_stop = True
        return False
