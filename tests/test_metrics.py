"""Metrics tests: EER vs the reference's sklearn+brentq definition
(/root/reference/trainer.py:134-139)."""

import numpy as np
import pytest

from rtdsd_tpu.utils.metrics import AverageMeter, EarlyStopping, compute_eer


def test_eer_perfect_and_inverted():
    s = np.array([2.0, 3.0, 4.0, -1.0, -2.0, -3.0])
    l = np.array([1, 1, 1, 0, 0, 0])
    assert compute_eer(s, l) == 0.0
    assert compute_eer(-s, l) == 100.0


def test_eer_matches_sklearn_brentq_oracle():
    sklearn = pytest.importorskip("sklearn")
    from scipy.interpolate import interp1d
    from scipy.optimize import brentq
    from sklearn import metrics as skm

    rng = np.random.default_rng(0)
    for _ in range(5):
        s = np.concatenate([rng.normal(1, 1, 400), rng.normal(-1, 1, 300)])
        l = np.array([1] * 400 + [0] * 300)
        fpr, tpr, _ = skm.roc_curve(l, s, pos_label=1)
        oracle = brentq(lambda x: 1. - x - interp1d(fpr, tpr)(x), 0., 1.) * 100
        assert abs(compute_eer(s, l) - oracle) < 1e-9


def test_eer_requires_both_classes():
    with pytest.raises(ValueError):
        compute_eer(np.ones(4), np.ones(4))


def test_average_meter():
    m = AverageMeter("x")
    m.update(1.0, 2)
    m.update(4.0, 1)
    assert m.count == 3
    assert abs(m.avg - 2.0) < 1e-9
    assert m.val == 4.0


def test_early_stopping(tmp_path):
    es = EarlyStopping(patience=2, save_dir=str(tmp_path))
    saved = []
    import os

    save_fn = lambda p: (saved.append(p), os.makedirs(p, exist_ok=True))
    assert es(1.0, 0, save_fn)       # improves
    assert es(0.5, 1, save_fn)       # improves; rotates previous
    assert not es(0.7, 2, save_fn)   # worse
    assert not es(0.8, 3, save_fn)
    assert es.early_stop
    assert len(saved) == 2
    assert os.path.basename(es.best_path) == "best_checkpoint_1"
