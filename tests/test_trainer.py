"""Trainer / KDTrainer epoch-loop tests on a synthetic WAV dataset."""

import numpy as np
import pytest
from flax import linen as nn

import jax
import jax.numpy as jnp

from rtdsd_tpu.config import ExpConfig, SysConfig
from rtdsd_tpu.data.dataset import AudioDataset
from rtdsd_tpu.data.io import write_wav
from rtdsd_tpu.data.loader import DataLoader
from rtdsd_tpu.data.protocols import Trial
from rtdsd_tpu.engine.steps import create_train_state, make_optimizer
from rtdsd_tpu.engine.trainer import Trainer
from rtdsd_tpu.utils.logging import Logger


class _Tiny(nn.Module):
    @nn.compact
    def __call__(self, x, *, train: bool = False):
        a = jnp.abs(x).reshape(x.shape[0], 20, -1)
        f = jnp.concatenate([a.mean(-1), a.max(-1)], axis=-1)
        h = jax.nn.selu(nn.Dense(16)(f))
        return nn.Dense(2)(h)


@pytest.fixture(scope="module")
def sine_noise_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("trainer_ds")
    rng = np.random.default_rng(3)
    trials = []
    for i in range(24):
        bona = i % 2 == 1
        t = np.arange(2000) / 16000
        wave = (0.3 * np.sin(2 * np.pi * 440 * t) if bona
                else 0.2 * rng.standard_normal(2000)).astype(np.float32)
        path = str(root / f"u{i}.wav")
        write_wav(path, wave, 16000)
        trials.append(Trial(path, f"u{i}", int(bona)))
    return AudioDataset(trials, duration=2000)


def test_trainer_epoch_and_eval(sine_noise_dataset, tmp_path):
    # unweighted CE: with the reference's [0.9, 0.1] weights a weak toy model
    # happily collapses to all-spoof (bonafide errors are nearly free)
    exp = ExpConfig(batch_size_train=8, batch_size_test=8, lr=0.01,
                    is_pre_emphasis=True, allow_data_augmentation=False,
                    data_augmentation=[], ce_weight=[1.0, 1.0])
    sysc = SysConfig(wandb_disabled=True)
    model = _Tiny()
    tx = make_optimizer(exp.lr, 0.0)
    state = create_train_state(
        model, jax.random.key(0),
        jnp.zeros((2, 2000), jnp.float32), tx)
    mk = lambda sh: DataLoader(sine_noise_dataset, 8, shuffle=sh,
                               drop_last=sh, num_workers=1, use_native=False)
    logger = Logger(0, sysc, metrics_path=str(tmp_path / "m.jsonl"))
    trainer = Trainer(model, state, tx, mk(True), mk(False), None, logger,
                      exp, sysc)

    first_loss = trainer.train()
    for _ in range(6):
        last_loss = trainer.train()
    assert last_loss < first_loss
    dev_loss, dev_acc = trainer.test(is_dev=True)
    assert dev_acc > 90.0
    assert trainer.epoch == 7

    # metrics jsonl written with reference metric names
    text = (tmp_path / "m.jsonl").read_text()
    assert '"Train Acc"' in text and '"Dev Acc"' in text
    assert '"Dev EER"' in text


def test_trainer_epochs_reshuffle(sine_noise_dataset):
    loader = DataLoader(sine_noise_dataset, 8, shuffle=True, drop_last=True,
                        num_workers=1, use_native=False)
    loader.set_epoch(0)
    a = [b.utt_ids for b in loader]
    loader.set_epoch(1)
    b = [b.utt_ids for b in loader]
    assert a != b
