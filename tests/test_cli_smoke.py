"""Always-on CLI end-to-end smoke: train -> checkpoint -> score -> evaluate
-> stream -> serve through ``python -m rtdsd_tpu.cli.*`` subprocesses, on a
model small enough to keep the whole flow inside the default suite's
budget (one shared 1-epoch training run via a module fixture).

The full-size variant (more epochs, accuracy gates) stays in
``test_cli_e2e.py`` behind RTDSD_E2E=1; this one exists so the default
``pytest -q`` signal actually exercises the CLI entry points, not just the
engine underneath them (VERDICT r1: "the CLI e2e never runs in the default
suite"). Reference flow: /root/reference/main.py:144-221.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_dataset(root, n_train=16, n_dev=8, n_eval=8):
    from rtdsd_tpu.data.io import write_wav

    rng = np.random.default_rng(11)
    os.makedirs(root / "audio", exist_ok=True)

    def mk(n, prefix, proto, fields):
        lines = []
        for i in range(n):
            t = np.arange(9000 + 300 * i) / 16000
            bona = i % 2 == 1
            wave = (0.3 * np.sin(2 * np.pi * 440 * t) if bona
                    else 0.2 * rng.standard_normal(len(t))).astype(np.float32)
            uid = f"{prefix}_{i:04d}"
            write_wav(str(root / "audio" / f"{uid}.flac"), wave, 16000)
            lines.append(fields(uid, "bonafide" if bona else "spoof"))
        (root / proto).write_text("\n".join(lines) + "\n")

    mk(n_train, "LA_T", "train.txt", lambda u, l: f"LA_0001 {u} - A01 {l}")
    mk(n_dev, "LA_D", "dev.txt", lambda u, l: f"LA_0002 {u} - A02 {l}")
    mk(n_eval, "LA_E", "eval19.txt", lambda u, l: f"LA_0003 {u} - A03 {l}")


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
  train_duration_sec: 0.5
  test_duration_sec: 0.5
  batch_size_train: 8
  batch_size_test: 8
  lr: 0.002
  compute_dtype: float32
  is_pre_emphasis: true
  allow_data_augmentation: false
  data_augmentation: []
  la19_eval_random_start: false
  kwargs:
    num_layers: 1
    order: first
    w2v:
      conv_layers: [[16, 10, 5], [16, 3, 2], [16, 2, 2]]
      encoder_embed_dim: 16
      encoder_ffn_dim: 32
      encoder_heads: 2
      conv_pos: 8
      conv_pos_groups: 2
"""
    path = root / "cfg.yaml"
    path.write_text(cfg)
    return str(path)


def _run(args):
    r = subprocess.run([sys.executable, "-m"] + args, cwd=REPO,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    # stderr carries the CLIs' "  [...]" status lines (tests filter by
    # prefix); merged so smokes can assert on them
    return r.stdout + r.stderr


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """Dataset + tiny config + one CLI training epoch, shared by all
    smokes so the suite pays for exactly one subprocess train."""
    root = tmp_path_factory.mktemp("cli_smoke")
    _make_dataset(root)
    cfg = _config(root)
    _run(["rtdsd_tpu.cli.main", "--config", cfg, "--max_epoch", "1"])
    # the rolling `last` full-state checkpoint is written unconditionally;
    # the best_* gate (dev acc > 95) is not expected to clear in one epoch
    last = root / "runs" / "last"
    assert last.is_dir(), "no rolling last checkpoint written"
    return root, cfg, str(last)


def test_cli_train_score_evaluate_smoke(trained):
    root, cfg, last = trained

    _run(["rtdsd_tpu.cli.main", "--config", cfg, "--is_eval", "--is_score",
          "--ckpt", last, "--tracks", "LA19"])
    scores = (root / "scores_la19.txt").read_text().strip().splitlines()
    assert len(scores) == 8
    for line in scores:  # "{utt_id} {float}" reference score format
        uid, val = line.split(" ")
        assert uid.startswith("LA_E_")
        float(val)

    out = _run(["rtdsd_tpu.cli.evaluate", "--scores",
                str(root / "scores_la19.txt"), "--protocol",
                str(root / "eval19.txt"), "--file-field", "1",
                "--label-field", "4"])
    assert "EER:" in out


def _long_audio(root, name, seconds, freq=None):
    from rtdsd_tpu.data.io import write_wav

    rng = np.random.default_rng(abs(hash(name)) % 2**31)
    t = np.arange(int(seconds * 16000)) / 16000
    wave = (0.3 * np.sin(2 * np.pi * freq * t) if freq
            else 0.2 * rng.standard_normal(len(t))).astype(np.float32)
    path = root / name
    write_wav(str(path), wave, 16000)
    return str(path)


def test_cli_stream_smoke(trained):
    root, cfg, last = trained
    audio = _long_audio(root, "long_bona.wav", 2.0, freq=440)

    out = _run(["rtdsd_tpu.cli.stream", "--config", cfg, "--ckpt", last,
                "--audio", audio, "--window_sec", "0.5", "--hop_sec",
                "0.25", "--per_window", "--incremental"])
    lines = [l for l in out.strip().splitlines() if not l.startswith("  [")]
    per_window = [l for l in lines if "#" in l.split(" ")[0]]
    # 2.0 s / 0.25 s hop with 0.5 s windows -> 7 full windows
    assert len(per_window) == 7
    agg = [l for l in lines if l.split(" ")[0] == audio]
    assert len(agg) == 1
    float(agg[0].split(" ")[1])

    # --calibration: a deployment calibration (the cli.evaluate
    # --calibrate JSON) turns the same run's output into calibrated
    # probabilities + an accept/reject decision at the operating point
    import json

    cal = {"eer_threshold": 0.0, "platt_a": 1.0, "platt_b": 0.0,
           "at_far": {"0.01": {"threshold": 2.0, "far": 0.01, "frr": 0.2}}}
    cal_path = root / "cal.json"
    cal_path.write_text(json.dumps(cal))
    out = _run(["rtdsd_tpu.cli.stream", "--config", cfg, "--ckpt", last,
                "--audio", audio, "--window_sec", "0.5", "--hop_sec",
                "0.25", "--per_window", "--calibration", str(cal_path),
                "--operating_point", "far=0.01"])
    lines = [l for l in out.strip().splitlines() if not l.startswith("  [")]
    pw = [l for l in lines if "#" in l.split(" ")[0]]
    assert pw and all(" p=" in l for l in pw)
    agg_line = next(l for l in lines if l.split(" ")[0] == audio)
    raw, p = float(agg_line.split(" ")[1]), agg_line.split("p=")[1]
    prob = float(p.split(" ")[0])
    assert prob == pytest.approx(1 / (1 + np.exp(-raw)), abs=1e-4)
    want = "accept@far=0.01" if raw >= 2.0 else "reject@far=0.01"
    assert agg_line.endswith(want), agg_line


def test_cli_serve_smoke(trained):
    root, cfg, last = trained
    a = _long_audio(root, "serve_bona.wav", 1.5, freq=440)
    b = _long_audio(root, "serve_spoof.wav", 2.0)

    out_file = root / "serve_scores.txt"
    out = _run(["rtdsd_tpu.cli.serve", "--config", cfg, "--ckpt", last,
                "--audio", a, b, "--window_sec", "0.5", "--hop_sec", "0.25",
                "--per_window", "--device_ms", "--out", str(out_file)])
    agg = {l.split(" ")[0]: float(l.split(" ")[1])
           for l in out_file.read_text().strip().splitlines()}
    assert set(agg) == {a, b}
    # stdout repeats the aggregates and carries per-window lines
    assert any("#" in l.split(" ")[0] for l in out.splitlines())
    for path, score in agg.items():
        assert np.isfinite(score)
    # --device_ms chip-time accounting line (subprocess stderr is merged
    # into _run's assertion output only on failure; check stdout+stderr)
    assert "device" in out and "ms/tick" in out

    # the HBM escape hatch: a capped score batch drains the per-tick
    # backlog with multiple dispatches yet scores the same windows to
    # the same values (rows are batch-independent in eval mode)
    capped_file = root / "serve_scores_capped.txt"
    _run(["rtdsd_tpu.cli.serve", "--config", cfg, "--ckpt", last,
          "--audio", a, b, "--window_sec", "0.5", "--hop_sec", "0.25",
          "--score_batch", "1", "--out", str(capped_file)])
    capped = {l.split(" ")[0]: float(l.split(" ")[1])
              for l in capped_file.read_text().strip().splitlines()}
    assert set(capped) == set(agg)
    for path in agg:
        np.testing.assert_allclose(capped[path], agg[path], atol=1e-5)


def test_cli_daemon_smoke(trained, tmp_path):
    """cli.daemon end-to-end: subprocess daemon on a Unix socket, a live
    ServeClient producer streams audio in and receives per-window scores
    + CLOSED, then SIGTERM stops the daemon gracefully (exit 0).
    Score exactness vs direct window scoring is unit-tested in
    tests/test_netserve.py; this smoke covers the CLI entry surface."""
    import signal
    import time

    from rtdsd_tpu.data.io import load_audio
    from rtdsd_tpu.engine.netserve import ServeClient

    root, cfg, last = trained
    a = _long_audio(root, "daemon_bona.wav", 1.5, freq=440)
    sock = str(tmp_path / "rtdsd.sock")
    # log to a FILE, not a PIPE: an undrained pipe fills with XLA's
    # chatty stderr and blocks the daemon before it opens the socket
    log_path = tmp_path / "daemon.log"
    with open(log_path, "w") as log:
        proc = subprocess.Popen(
            [sys.executable, "-m", "rtdsd_tpu.cli.daemon", "--config", cfg,
             "--ckpt", last, "--max_streams", "2", "--window_sec", "0.5",
             "--hop_sec", "0.25", "--listen", f"unix:{sock}",
             "--stats_every", "0"],
            cwd=REPO, stdout=log, stderr=subprocess.STDOUT, text=True)
    try:
        deadline = time.time() + 600
        while not os.path.exists(sock):
            assert proc.poll() is None, log_path.read_text()[-2000:]
            assert time.time() < deadline, "daemon never opened its socket"
            time.sleep(0.5)
        client = ServeClient(unix_path=sock)
        assert client.hop == 4000 and client.duration == 8000
        wave = np.asarray(load_audio(a)[0], np.float32).squeeze()
        h = client.open(a)
        for c in range(0, len(wave), 3000):  # live-producer chunking
            client.push(h, wave[c:c + 3000])
        client.close(h, flush=True)
        got = client.collect({h})
        # 1.5 s at 0.5 s windows / 0.25 s hop -> 5 hop-grid windows
        assert [s for s, _, _ in sorted(got[h])] == \
            [k * 4000 for k in range(5)]
        assert all(np.isfinite(v) for _, v, _ in got[h])

        # SIGHUP: zero-downtime reload of the same --ckpt path; the
        # daemon must log the swap and keep scoring new streams
        proc.send_signal(signal.SIGHUP)
        deadline = time.time() + 300
        while "reloaded checkpoint" not in log_path.read_text():
            assert proc.poll() is None, log_path.read_text()[-2000:]
            assert time.time() < deadline, \
                "no reload log: " + log_path.read_text()[-2000:]
            time.sleep(0.5)
        h2 = client.open(a + "#2")
        client.push(h2, wave)
        client.close(h2, flush=True)
        got2 = client.collect({h2})
        # same checkpoint reloaded -> same scores as before the HUP
        for (s1, v1, _), (s2, v2, _) in zip(sorted(got[h]),
                                            sorted(got2[h2])):
            assert s1 == s2
            np.testing.assert_allclose(v1, v2, rtol=1e-5, atol=1e-6)
        client.close_socket()
    finally:
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=120)
    log_text = log_path.read_text()
    assert proc.returncode == 0, log_text[-2000:]
    assert "[daemon] stopped" in log_text


def test_cli_export_smoke(trained):
    """cli.export end-to-end: checkpoint -> serialized StableHLO artifact +
    JSON sidecar, then deserialize in-process and score a batch."""
    root, cfg, last = trained
    out_path = root / "model.jaxexp"

    out = _run(["rtdsd_tpu.cli.export", "--config", cfg, "--ckpt", last,
                "--out", str(out_path)])
    assert "exported My_XLSR_AASIST" in out
    assert out_path.exists() and out_path.stat().st_size > 0

    import json

    meta = json.loads((root / "model.jaxexp.json").read_text())
    assert meta["batch"] == "symbolic"
    assert meta["sample_rate"] == 16000
    assert sorted(meta["platforms"]) == ["cpu", "tpu"]

    from rtdsd_tpu.cli.export import ScoringArtifact

    re = ScoringArtifact.load(str(out_path))
    t = int(0.5 * 16000)
    scores = np.asarray(re.call(np.zeros((3, t), np.float32)))
    assert scores.shape == (3,) and np.all(np.isfinite(scores))


def test_cli_export_serving_smoke(trained):
    """cli.export --serving: engine-program bundle (cascade included),
    then cli.serve --artifact serves a wav from it with no --config/--ckpt
    and reproduces the ckpt-backed aggregate."""
    root, cfg, last = trained
    prefix = root / "serve_art"

    out = _run(["rtdsd_tpu.cli.export", "--config", cfg, "--ckpt", last,
                "--serving", "--max_streams", "2", "--platforms", "cpu",
                "--cascade_ckpt", last, "--out", str(prefix)])
    assert "serving" in out
    for ext in (".extend", ".score", ".escalate", ".params",
                ".esc.params", ".json"):
        assert (root / ("serve_art" + ext)).stat().st_size > 0

    from rtdsd_tpu.data.io import write_wav

    wav = str(root / "serve_art_in.wav")
    write_wav(wav, np.random.default_rng(4).standard_normal(24000)
              .astype(np.float32) * 0.1, 16000)
    art_out = _run(["rtdsd_tpu.cli.serve", "--artifact", str(prefix),
                    "--cascade_band", "1e9", "--audio", wav])
    ckpt_out = _run(["rtdsd_tpu.cli.serve", "--config", cfg, "--ckpt",
                     last, "--audio", wav])
    score_of = lambda s: float(next(
        ln for ln in s.strip().splitlines()
        if ln.startswith(wav)).rsplit(" ", 1)[1])
    # band=1e9 escalates every window to the flagship (--ckpt's model),
    # so the artifact aggregate equals the plain ckpt-backed serve
    assert abs(score_of(art_out) - score_of(ckpt_out)) < 1e-4


def test_cli_export_streaming_smoke(trained):
    """cli.export --streaming: two-program incremental-scorer bundle, then
    load the model-free StreamingArtifact runner and score long audio."""
    root, cfg, last = trained
    prefix = root / "stream_art"

    out = _run(["rtdsd_tpu.cli.export", "--config", cfg, "--ckpt", last,
                "--streaming", "--seg_frames", "32",
                "--out", str(prefix)])
    assert "streaming" in out
    for ext in (".conv", ".score", ".params", ".json"):
        assert (root / ("stream_art" + ext)).stat().st_size > 0

    from rtdsd_tpu.cli.export import StreamingArtifact

    art = StreamingArtifact.load(str(prefix))
    wave = np.random.default_rng(0).standard_normal(30000) \
        .astype(np.float32) * 0.1
    ws = art.window_scores(wave)
    assert ws.ndim == 1 and ws.size >= 2 and np.all(np.isfinite(ws))
    assert np.isfinite(art.score(wave, aggregate="median"))


def test_cli_infer_smoke(trained):
    """cli.infer: artifact-only scoring (no config/ckpt on the command
    line) reproduces cli.main --is_score's score file, including the
    fixed-batch tail-padding path (batch 2 over 3 files)."""
    root, cfg, last = trained
    art = root / "infer_model.jaxexp"
    _run(["rtdsd_tpu.cli.export", "--config", cfg, "--ckpt", last,
          "--batch", "2", "--out", str(art)])

    if not (root / "scores_la19.txt").exists():  # independent of test order
        _run(["rtdsd_tpu.cli.main", "--config", cfg, "--is_eval",
              "--is_score", "--ckpt", last, "--tracks", "LA19"])
    want = dict(line.split(" ") for line in
                (root / "scores_la19.txt").read_text().strip().splitlines())
    files = [str(root / "audio" / f"{u}.flac")
             for u in ("LA_E_0000", "LA_E_0001", "LA_E_0002")]
    out_file = root / "infer_scores.txt"
    _run(["rtdsd_tpu.cli.infer", "--artifact", str(art),
          "--audio", *files, "--out", str(out_file)])

    got = out_file.read_text().strip().splitlines()
    assert len(got) == 3
    for line in got:
        uid, score = line.split(" ")
        assert abs(float(score) - float(want[uid])) < 1e-3

    # streaming bundle through the same consumer CLI
    sa = root / "infer_stream"
    _run(["rtdsd_tpu.cli.export", "--config", cfg, "--ckpt", last,
          "--streaming", "--seg_frames", "32", "--out", str(sa)])
    audio = _long_audio(root, "infer_long.wav", 2.0, freq=440)
    out = _run(["rtdsd_tpu.cli.infer", "--artifact", str(sa),
                "--audio", audio, "--per_window", "--aggregate", "median"])
    lines = [l for l in out.strip().splitlines() if l.startswith("infer_long")]
    assert len(lines) >= 3  # per-window rows + the aggregate row
    assert np.isfinite(float(lines[-1].split(" ")[-1]))


# ------------------------------------------------------------- KD CLI smoke

def _kd_config(root):
    """KD yaml over the same synthetic dataset: the trained smoke model is
    the teacher; the student copies its (only) XLSR layer and distills with
    the reference kd_kwargs schema (ref /root/reference/main_kd.py:43-237)."""
    cfg = f"""
SysConfig:
  wandb_disabled: true
  model: My_XLSR_AASIST
  student_model: My_XLSR_AASIST
  path_label_asv_spoof_2019_la_train: {root}/train.txt
  path_asv_spoof_2019_la_train: {root}/audio
  path_label_asv_spoof_2019_la_dev: {root}/dev.txt
  path_asv_spoof_2019_la_dev: {root}/audio
  path_label_asv_spoof_2019_la_eval: {root}/eval19.txt
  path_asv_spoof_2019_la_eval: {root}/audio
  la19_score_save_path: {root}/scores_kd_la19.txt
  path_to_save_model: {root}/runs_kd
  num_workers: 2
ExpConfig:
  random_seed: 7
  train_duration_sec: 0.5
  test_duration_sec: 0.5
  batch_size_train: 8
  batch_size_test: 8
  lr: 0.001
  compute_dtype: float32
  allow_data_augmentation: false
  data_augmentation: []
  la19_eval_random_start: false
  kwargs:
    num_layers: 1
    order: first
    w2v: &w2v
      conv_layers: [[16, 10, 5], [16, 3, 2], [16, 2, 2]]
      encoder_embed_dim: 16
      encoder_ffn_dim: 32
      encoder_heads: 2
      conv_pos: 8
      conv_pos_groups: 2
  kd_kwargs:
    copy_weights: true
    custom_order_copy_weights: [0]
    ce_loss_weight: 1.0
    student_kwargs:
      num_layers: 1
      order: custom
      custom_order: [0]
      w2v: *w2v
    kd_criterions:
      - key: KDLoss
        kwargs:
          student_module_path: logits
          teacher_module_path: logits
          temperature: 4.0
      - key: MSELoss
        kwargs:
          student_module_path: ssl_model.model.encoder.layers.0
          teacher_module_path: ssl_model.model.encoder.layers.0
    kd_criterion_weights: [0.5, 1.0]
"""
    path = root / "kd_cfg.yaml"
    path.write_text(cfg)
    return str(path)


def test_cli_kd_smoke(trained):
    """main_kd end-to-end as a subprocess: teacher restore -> student build
    -> copy_teacher_weights (custom order) -> one KD epoch -> --eval student
    scoring (ref surface /root/reference/main_kd.py:265-286)."""
    root, _cfg, last = trained
    kd_cfg = _kd_config(root)

    out = _run(["rtdsd_tpu.cli.main_kd", "--config", kd_cfg,
                "--ckpt", last, "--max_epoch", "1"])
    assert "Load Teacher checkpoint" in out
    assert "Copied teacher weights to student (layer map [0])" in out
    last_kd = root / "runs_kd" / "last_kd"
    assert last_kd.is_dir(), "no rolling last_kd student checkpoint"

    _run(["rtdsd_tpu.cli.main_kd", "--config", kd_cfg, "--is_eval",
          "--eval", "student", "--is_score", "--ckpt", str(last_kd),
          "--tracks", "LA19"])
    scores = (root / "scores_kd_la19.txt").read_text().strip().splitlines()
    assert len(scores) == 8
    for line in scores:
        uid, val = line.split(" ")
        assert uid.startswith("LA_E_")
        assert np.isfinite(float(val))


def test_parity_replay_closed_loop(trained):
    """The PARITY_RUNBOOK path executes end-to-end before any real blobs
    arrive: export a framework-trained model to a reference .pt, then
    tools/parity_replay.py --mode exact must reproduce the framework's own
    score file through the .pt -> convert -> CLI-score path."""
    torch = pytest.importorskip("torch")
    import jax
    import subprocess

    root, cfg, last = trained
    # ensure the oracle score file exists (idempotent: CLI skips if present)
    _run(["rtdsd_tpu.cli.main", "--config", cfg, "--is_eval", "--is_score",
          "--ckpt", last, "--tracks", "LA19"])
    oracle = root / "scores_la19.txt"
    assert oracle.exists()

    from rtdsd_tpu.cli.common import (build_model, init_state,
                                      load_checkpoint_for_eval)
    from rtdsd_tpu.config import load_yaml_config
    from rtdsd_tpu.models.export_reference import export_reference_model

    sys_config, exp_config = load_yaml_config(cfg)
    spec = build_model(sys_config, exp_config, train=False)
    state = init_state(spec, sys_config, exp_config, jax.random.key(0))
    state = load_checkpoint_for_eval(last, spec, state)
    sd = export_reference_model(
        {"params": state.params, "batch_stats": state.batch_stats},
        spec.name)
    pt = root / "exported_reference.pt"
    torch.save({k: torch.from_numpy(np.asarray(v, np.float32))
                for k, v in sd.items()}, str(pt))

    r = subprocess.run(
        [sys.executable, "tools/parity_replay.py", "--ckpt", str(pt),
         "--config", cfg, "--oracle", str(oracle), "--track", "LA19",
         "--mode", "exact", "--tol", "1e-4"],
        cwd=REPO, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "PASS: exact parity within tolerance" in r.stdout
