"""Datasets: decode + static-duration fitting, host side.

Mirrors the reference dataset layer (``/root/reference/data/train_set.py``,
``test_set.py``) with two deliberate architecture changes (SURVEY.md §7):

1. **Augmentation moved on-device.** The reference runs RawBoost per-item in
   CPU DataLoader workers (its host bottleneck, SURVEY.md §3.5); here the
   dataset only decodes and duration-fits, and the jitted train step applies
   :mod:`rtdsd_tpu.ops.rawboost` / :mod:`rtdsd_tpu.ops.augment` to whole
   batches on the accelerator.
2. **Static shapes.** Every item is repeat-tiled/cropped to exactly
   ``duration_sec * sample_rate`` samples (64000 for 4 s), so XLA compiles
   one program per batch shape.

Duration-fit semantics are byte-identical to the reference
(``adjustDuration`` / ``adjustDuration_random_start``,
``train_set.py:133-178``): tile whole copies, append the residue prefix,
then take the first (or a random) window.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from rtdsd_tpu.config import ExpConfig, SysConfig
from rtdsd_tpu.data import protocols
from rtdsd_tpu.data.io import load_audio
from rtdsd_tpu.data.protocols import Trial


def resample(wave: np.ndarray, sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resample to the configured rate (the reference's
    ``librosa.load(..., sr=16000)`` resampled implicitly,
    test_set.py:109)."""
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(int(sr), int(target_sr))
    return resample_poly(wave, target_sr // g, sr // g).astype(np.float32)


def _tile_to(x: np.ndarray, duration: int) -> np.ndarray:
    if len(x) >= duration:
        return x
    reps = duration // len(x)
    residue = duration % len(x)
    parts = [x] * reps
    if residue > 0:
        parts.append(x[:residue])
    return np.concatenate(parts)


def adjust_duration(x: np.ndarray, duration: int) -> np.ndarray:
    """First-N window after repeat-tiling (ref train_set.py:152-178)."""
    x = np.squeeze(x)
    return _tile_to(x, duration)[:duration]


def adjust_duration_random_start(x: np.ndarray, duration: int,
                                 rng: np.random.Generator) -> np.ndarray:
    """Random window after repeat-tiling (ref train_set.py:133-150)."""
    x = np.squeeze(x)
    x = _tile_to(x, duration)
    start = int(rng.integers(0, len(x) - duration + 1))
    return x[start: start + duration]


class AudioDataset:
    """Trial list + decode + duration fit. ``get(i, rng)`` -> (utt_id, wave, label)."""

    def __init__(self, trials: Sequence[Trial], duration: int,
                 is_random_start: bool = False, sample_rate: int = 16000,
                 host_augment=None):
        self.trials = list(trials)
        self.duration = int(duration)
        self.is_random_start = is_random_start
        self.sample_rate = sample_rate
        # per-item host transform (corpus/codec augs, data/host_augment.py);
        # applied after duration fit on both loader paths
        self.host_augment = host_augment

    def __len__(self) -> int:
        return len(self.trials)

    @property
    def labels(self) -> np.ndarray:
        return np.asarray([t.label for t in self.trials], np.int32)

    def get(self, index: int, rng: Optional[np.random.Generator] = None
            ) -> Tuple[str, np.ndarray, int]:
        t = self.trials[index]
        wave, sr = load_audio(t.path)
        if sr and sr != self.sample_rate:
            wave = resample(wave, sr, self.sample_rate)
        if self.is_random_start and rng is not None:
            wave = adjust_duration_random_start(wave, self.duration, rng)
        else:
            wave = adjust_duration(wave, self.duration)
        if self.host_augment is not None and rng is not None:
            wave = self.host_augment(wave, rng)
        return t.utt_id, wave.astype(np.float32), t.label


# ------------------------------------------------ reference-named datasets

class ASVspoof2019LA(AudioDataset):
    """Train/dev set (ref train_set.py:47-178)."""

    def __init__(self, sys_config: SysConfig, exp_config: ExpConfig,
                 is_train: bool = True):
        if is_train:
            label_path = sys_config.path_label_asv_spoof_2019_la_train
            audio_dir = sys_config.path_asv_spoof_2019_la_train
        else:
            label_path = sys_config.path_label_asv_spoof_2019_la_dev
            audio_dir = sys_config.path_asv_spoof_2019_la_dev
        trials, n_spoof, n_bona = protocols.parse_asvspoof2019_train(
            label_path, audio_dir,
            include_non_speech=exp_config.include_non_speech,
            include_residual=exp_config.include_residual)
        self.num_of_spoof = n_spoof
        self.num_of_bonafide = n_bona
        # Dataset-side augmentation is UNGATED by allow_data_augmentation in
        # the reference (train_set.py:112-124: the flag only gates the
        # trainer-side chain, trainer.py:55-56), and mul_augment loses the
        # if/elif dispatch to any RawBoost code.
        da = list(exp_config.data_augmentation or [])
        host_chain = None
        if is_train and "mul_augment" in da:
            from rtdsd_tpu.data.host_augment import build_host_chain
            from rtdsd_tpu.engine.steps import pick_rawboost_algo

            if pick_rawboost_algo(da) is None:
                # build even without a noise corpus: the chain then carries
                # only MP3 (or warns loudly about the missing codec) instead
                # of silently dropping the reference's Mp3Compression
                host_chain = build_host_chain(sys_config.noise_path,
                                              exp_config.sample_rate)
        super().__init__(
            trials, exp_config.train_duration_samples,
            is_random_start=is_train and exp_config.is_random_start,
            sample_rate=exp_config.sample_rate,
            host_augment=host_chain)


class ASVspoof2019LA_eval(AudioDataset):
    def __init__(self, sys_config: SysConfig, exp_config: ExpConfig):
        trials = protocols.parse_asvspoof2019_eval(
            sys_config.path_label_asv_spoof_2019_la_eval,
            sys_config.path_asv_spoof_2019_la_eval,
            include_non_speech=exp_config.include_non_speech,
            include_residual=exp_config.include_residual)
        # The reference's ASVspoof2019LA_eval ALWAYS random-starts — its
        # adjustDuration is the random-start variant and never consults
        # is_random_start (test_set.py:120-136). Parity default; an explicit
        # `la19_eval_random_start: false` gives bit-stable first-N crops.
        rnd = exp_config.la19_eval_random_start
        super().__init__(trials, exp_config.test_duration_samples,
                         is_random_start=True if rnd is None else bool(rnd),
                         sample_rate=exp_config.sample_rate)


class ASVspoof2021LA_eval(AudioDataset):
    def __init__(self, sys_config: SysConfig, exp_config: ExpConfig):
        trials = protocols.parse_asvspoof2021_la(
            sys_config.path_label_asv_spoof_2021_la_eval,
            sys_config.path_asv_spoof_2021_la_eval)
        super().__init__(trials, exp_config.test_duration_samples,
                         is_random_start=False,  # ref: first-N only
                         sample_rate=exp_config.sample_rate)


class ASVspoof2021DF_eval(AudioDataset):
    def __init__(self, sys_config: SysConfig, exp_config: ExpConfig):
        trials = protocols.parse_asvspoof2021_df(
            sys_config.path_label_asv_spoof_2021_df_eval,
            sys_config.path_asv_spoof_2021_df_eval,
            spec=bool(sys_config.path_label_asv_spoof_2021_la_eval_spec))
        super().__init__(trials, exp_config.test_duration_samples,
                         is_random_start=exp_config.is_random_start,
                         sample_rate=exp_config.sample_rate)


class InTheWild(AudioDataset):
    def __init__(self, sys_config: SysConfig, exp_config: ExpConfig):
        label = sys_config.path_label_in_the_wild or sys_config.path_label_itw_eval
        audio = sys_config.path_in_the_wild or sys_config.path_itw_eval
        trials = protocols.parse_in_the_wild(label, audio)
        super().__init__(trials, exp_config.test_duration_samples,
                         is_random_start=exp_config.is_random_start,
                         sample_rate=exp_config.sample_rate)


class ASVSpoof5(AudioDataset):
    """Reconstructed from the reference's orphaned methods
    (test_set.py:345-428; class header missing in the snapshot)."""

    def __init__(self, sys_config: SysConfig, exp_config: ExpConfig,
                 subset: Optional[str] = None):
        trials = protocols.parse_asvspoof5(
            sys_config.path_label_asvspoof5, sys_config.path_asvspoof5, subset)
        super().__init__(trials, exp_config.test_duration_samples,
                         is_random_start=exp_config.is_random_start,
                         sample_rate=exp_config.sample_rate)


class FakeOrReal(AudioDataset):
    """Track dispatched by the reference CLI (main.py:351) whose dataset class
    is missing from the snapshot; implemented with the ITW 2-field layout."""

    def __init__(self, sys_config: SysConfig, exp_config: ExpConfig,
                 label_path: str = "", audio_dir: str = ""):
        trials = protocols.parse_fake_or_real(
            label_path or sys_config.path_label_itw_eval,
            audio_dir or sys_config.path_itw_eval)
        super().__init__(trials, exp_config.test_duration_samples,
                         is_random_start=exp_config.is_random_start,
                         sample_rate=exp_config.sample_rate)
