"""Config-system tests: reference YAML schema compatibility."""

import warnings

import pytest

from rtdsd_tpu.config import ExpConfig, SysConfig, load_yaml_config

REFERENCE_STYLE_YAML = """
SysConfig:
  wandb_disabled: true
  model: XLSR_AASIST
  student_model: My_XLSR_AASIST
  path_label_asv_spoof_2019_la_train: /data/train.txt
  path_asv_spoof_2019_la_train: /data/flac
  num_workers: 6
  path_to_save_model: ./runs/exp1
  df21_score_save_path: ./runs/exp1/df21.txt
ExpConfig:
  random_seed: 7
  is_pre_emphasis: true
  pre_emphasis: 0.97
  sample_rate: 16000
  train_duration_sec: 4
  test_duration_sec: 4
  batch_size_train: 32
  batch_size_test: 40
  lr: 0.000001
  weight_decay: 0.0001
  max_epoch: 100
  allow_data_augmentation: true
  data_augmentation: ["RawBoost4"]
  kwargs:
    num_layers: 6
    order: first
  kd_kwargs:
    ce_loss_weight: 1.0
"""


def test_reference_yaml_loads(tmp_path):
    path = tmp_path / "cfg.yaml"
    path.write_text(REFERENCE_STYLE_YAML)
    sys_cfg, exp_cfg = load_yaml_config(str(path))
    assert sys_cfg.model == "XLSR_AASIST"
    assert sys_cfg.num_workers == 6
    assert exp_cfg.random_seed == 7
    assert exp_cfg.train_duration_samples == 64000
    assert exp_cfg.data_augmentation == ["RawBoost4"]
    assert exp_cfg.kwargs["num_layers"] == 6
    assert exp_cfg.kd_kwargs["ce_loss_weight"] == 1.0


def test_defaults_match_reference():
    """Defaults replicate /root/reference/config.py:1-89."""
    s = SysConfig()
    assert s.model == "XLSR_AASIST"
    assert s.num_workers == 4
    assert s.path_to_save_model == "./runs"
    e = ExpConfig()
    assert e.random_seed == 1024
    assert e.pre_emphasis == 0.97
    assert e.sample_rate == 16000
    assert e.train_duration_sec == 4
    assert e.batch_size_train == 32
    assert e.batch_size_test == 40
    assert e.lr == 1e-6
    assert e.weight_decay == 1e-4
    assert e.max_epoch == 100
    assert e.is_pre_emphasis is True
    assert e.allow_data_augmentation is False
    assert e.data_augmentation == ["ACN"]
    assert e.restore_checkpoint is None


def test_unknown_keys_warn():
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ExpConfig.from_dict({"lr": 0.1, "definitely_a_typo": 1})
    assert any("definitely_a_typo" in str(x.message) for x in w)


def test_empty_yaml(tmp_path):
    path = tmp_path / "empty.yaml"
    path.write_text("")
    sys_cfg, exp_cfg = load_yaml_config(str(path))
    assert exp_cfg.max_epoch == 100
