"""Opt-in full-CLI end-to-end test (subprocess): train -> checkpoint ->
score -> evaluate on a synthetic dataset.

Slow (several minutes of XLA compiles on a cold cache), so gated behind
RTDSD_E2E=1; the default suite stays fast. The same flow is codified in
.claude/skills/verify/SKILL.md.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

if not os.environ.get("RTDSD_E2E"):
    pytest.skip("set RTDSD_E2E=1 to run the slow CLI end-to-end test",
                allow_module_level=True)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_dataset(root):
    from rtdsd_tpu.data.io import write_wav

    rng = np.random.default_rng(7)
    os.makedirs(root / "audio", exist_ok=True)

    def mk(n, prefix, proto, fields):
        lines = []
        for i in range(n):
            t = np.arange(12000 + 500 * i) / 16000
            bona = i % 2 == 1
            wave = (0.3 * np.sin(2 * np.pi * 440 * t) if bona
                    else 0.2 * rng.standard_normal(len(t))).astype(np.float32)
            uid = f"{prefix}_{i:04d}"
            write_wav(str(root / "audio" / f"{uid}.flac"), wave, 16000)
            lines.append(fields(uid, "bonafide" if bona else "spoof"))
        (root / proto).write_text("\n".join(lines) + "\n")

    mk(32, "LA_T", "train.txt", lambda u, l: f"LA_0001 {u} - A01 {l}")
    mk(16, "LA_D", "dev.txt", lambda u, l: f"LA_0002 {u} - A02 {l}")
    mk(12, "LA_E", "eval19.txt", lambda u, l: f"LA_0003 {u} - A03 {l}")


def _config(root):
    cfg = f"""
SysConfig:
  wandb_disabled: true
  model: My_XLSR_AASIST
  path_label_asv_spoof_2019_la_train: {root}/train.txt
  path_asv_spoof_2019_la_train: {root}/audio
  path_label_asv_spoof_2019_la_dev: {root}/dev.txt
  path_asv_spoof_2019_la_dev: {root}/audio
  path_label_asv_spoof_2019_la_eval: {root}/eval19.txt
  path_asv_spoof_2019_la_eval: {root}/audio
  la19_score_save_path: {root}/scores_la19.txt
  path_to_save_model: {root}/runs
  num_workers: 2
ExpConfig:
  random_seed: 42
  train_duration_sec: 1
  test_duration_sec: 1
  batch_size_train: 8
  batch_size_test: 8
  lr: 0.002
  compute_dtype: float32
  is_pre_emphasis: true
  allow_data_augmentation: false
  data_augmentation: []
  kwargs:
    num_layers: 2
    order: first
    w2v:
      conv_layers: [[32, 10, 5], [32, 3, 2], [32, 2, 2], [32, 2, 2]]
      encoder_embed_dim: 32
      encoder_ffn_dim: 64
      encoder_heads: 4
      conv_pos: 16
      conv_pos_groups: 4
"""
    path = root / "cfg.yaml"
    path.write_text(cfg)
    return str(path)


def _run(args):
    r = subprocess.run([sys.executable, "-m"] + args, cwd=REPO,
                       capture_output=True, text=True, timeout=3600)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    return r.stdout


def test_train_score_evaluate_roundtrip(tmp_path):
    _make_dataset(tmp_path)
    cfg = _config(tmp_path)

    _run(["rtdsd_tpu.cli.main", "--config", cfg, "--max_epoch", "5"])
    runs = [d for d in os.listdir(tmp_path / "runs") if d.startswith("best_")]
    assert runs, "no best checkpoint saved"
    best = str(tmp_path / "runs" / sorted(runs)[-1])

    _run(["rtdsd_tpu.cli.main", "--config", cfg, "--is_eval", "--is_score",
          "--ckpt", best, "--tracks", "LA19"])
    scores = (tmp_path / "scores_la19.txt").read_text().strip().splitlines()
    assert len(scores) == 12

    out = _run(["rtdsd_tpu.cli.evaluate", "--scores",
                str(tmp_path / "scores_la19.txt"), "--protocol",
                str(tmp_path / "eval19.txt"), "--file-field", "1",
                "--label-field", "4"])
    assert "EER:" in out
    eer = float(out.split("EER:")[1].split("%")[0])
    assert eer < 10.0


def test_streaming_cli(tmp_path):
    """Long-audio streaming CLI: decode -> windows -> rolling scores."""
    from rtdsd_tpu.data.io import write_wav

    _make_dataset(tmp_path)
    cfg = _config(tmp_path)
    _run(["rtdsd_tpu.cli.main", "--config", cfg, "--max_epoch", "6"])
    runs = [d for d in os.listdir(tmp_path / "runs") if d.startswith("best_")]
    # BN running stats lag the high-lr toy training; fall back to the
    # rolling last-checkpoint if no epoch cleared the acc>95 best gate
    best = str(tmp_path / "runs" / (sorted(runs)[-1] if runs else "last"))

    t = np.arange(16000 * 7) / 16000
    bona = str(tmp_path / "long_bona.wav")
    spoof = str(tmp_path / "long_spoof.wav")
    write_wav(bona, (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32),
              16000)
    write_wav(spoof, (0.2 * np.random.default_rng(5).standard_normal(
        len(t))).astype(np.float32), 16000)

    out_file = str(tmp_path / "stream_scores.txt")
    out = _run(["rtdsd_tpu.cli.stream", "--config", cfg, "--ckpt", best,
                "--audio", bona, spoof, "--window_sec", "1",
                "--hop_sec", "0.5", "--out", out_file])
    lines = dict(ln.rsplit(" ", 1) for ln in
                 open(out_file).read().strip().splitlines())
    # CE only constrains logit *differences*; compare classes, not signs
    assert float(lines[bona]) > float(lines[spoof])
    assert bona in out and spoof in out


def test_streaming_eer_vs_offline_crop(tmp_path):
    """r4 (VERDICT item 8) streaming-quality harness: window-aggregated
    streaming EER vs offline 1 s-crop EER on the synthetic track, both
    through the public CLIs (cli.stream -> cli.evaluate vs cli.main
    --is_score -> cli.evaluate). Long audio scored as mean-aggregated
    1 s / 0.5 s windows (the paper's real-time use case) must not
    degrade the separable task's EER vs the offline crop path — guards
    serving/streaming changes against silent quality drift."""
    _make_dataset(tmp_path)
    cfg = _config(tmp_path)
    _run(["rtdsd_tpu.cli.main", "--config", cfg, "--max_epoch", "6"])
    runs = [d for d in os.listdir(tmp_path / "runs")
            if d.startswith("best_")]
    best = str(tmp_path / "runs" / (sorted(runs)[-1] if runs else "last"))

    # long eval set (3..5.8 s — several windows per file), sine=bonafide
    from rtdsd_tpu.data.io import write_wav

    rng = np.random.default_rng(17)
    long_proto, stream_proto, paths = [], [], []
    for i in range(12):
        t = np.arange(16000 * 3 + i * 4000) / 16000
        bona = i % 2 == 1
        wave = (0.3 * np.sin(2 * np.pi * (300 + 30 * i) * t) if bona
                else 0.2 * rng.standard_normal(len(t))).astype(np.float32)
        uid = f"LA_L_{i:04d}"
        path = str(tmp_path / "audio" / f"{uid}.flac")
        write_wav(path, wave, 16000)
        label = "bonafide" if bona else "spoof"
        long_proto.append(f"LA_0004 {uid} - A04 {label}")
        stream_proto.append(f"LA_0004 {path} - A04 {label}")
        paths.append(path)
    (tmp_path / "eval19.txt").write_text("\n".join(long_proto) + "\n")
    (tmp_path / "stream_proto.txt").write_text(
        "\n".join(stream_proto) + "\n")

    # offline: crop/tile to the 1 s eval duration through cli.main
    (tmp_path / "scores_la19.txt").unlink(missing_ok=True)
    _run(["rtdsd_tpu.cli.main", "--config", cfg, "--is_eval", "--is_score",
          "--ckpt", best, "--tracks", "LA19"])
    out_off = _run(["rtdsd_tpu.cli.evaluate", "--scores",
                    str(tmp_path / "scores_la19.txt"), "--protocol",
                    str(tmp_path / "eval19.txt"), "--file-field", "1",
                    "--label-field", "4"])
    eer_off = float(out_off.split("EER:")[1].split("%")[0])

    # streaming: mean-aggregated 1 s / 0.5 s windows over the full audio
    stream_scores = str(tmp_path / "stream_scores.txt")
    _run(["rtdsd_tpu.cli.stream", "--config", cfg, "--ckpt", best,
          "--audio"] + paths + ["--window_sec", "1", "--hop_sec", "0.5",
                                "--aggregate", "mean",
                                "--out", stream_scores])
    out_str = _run(["rtdsd_tpu.cli.evaluate", "--scores", stream_scores,
                    "--protocol", str(tmp_path / "stream_proto.txt"),
                    "--file-field", "1", "--label-field", "4"])
    eer_str = float(out_str.split("EER:")[1].split("%")[0])

    print(f"streaming-quality harness: offline-crop EER {eer_off:.2f}% "
          f"vs streaming window-aggregated EER {eer_str:.2f}%")
    # windows see MORE of each long file than the single 1 s crop; on the
    # separable synthetic task streaming must stay at least as good
    assert eer_str <= eer_off + 1e-9


def test_flagship_scale_parity_gated():
    """r5 (VERDICT r4 item 4): flagship-scale torch<->JAX parity as a GATE,
    not just a tool. Runs ``tools/flagship_parity.py`` at FULL depth/width
    (24-layer/315M XLSR feeding the reference's own torch AASIST graph,
    fe stubbed) on a reduced utterance count for runtime, and asserts the
    documented bounds: per-utt max |torch-jax| <= 5e-2 with median <=
    2e-3, rank stability over distinguishable pairs (near-tied pairs of
    a random-weight model flip by GraphPool-amplified reassociation
    noise — a 1.4e-2 gap flipped in r5), EER delta 0. The printed
    near-tie outlier count (|diff| > 1e-3, CLAUDE.md) is bounded so
    scale-emergent conversion drift cannot regress silently."""
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    # parity runs single-device: drop the suite's 8-virtual-device flag
    # (batch 4 does not tile over an inherited 8-way mesh)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(REPO, ".jax_cache"))
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "flagship_parity.py"),
         "--layers", "24", "--utts", "8", "--dur_sec", "1.0"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=7200)
    tail = r.stdout[-3000:] + r.stderr[-2000:]
    assert r.returncode == 0, tail
    assert "PARITY OK" in r.stdout, tail
    assert "distinguishable-pair rank flips" in r.stdout \
        and "flips (margin 0.05): 0" in r.stdout, tail
    m = [ln for ln in r.stdout.splitlines()
         if ln.startswith("near-tie outliers")]
    assert m, tail
    near, total = m[0].split(":")[1].strip().split("/")
    # near-ties amplify drift but must not dominate: more than half the
    # utterances drifting past 1e-3 means a real conversion regression
    assert int(near) <= int(total) // 2, m[0]
