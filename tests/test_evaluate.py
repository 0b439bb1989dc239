"""cli.evaluate in-process tests: score fusion (--fuse).

EER/t-DCF/calibration math is oracle-tested in tests/test_metrics.py;
the CLI surface (tracks, protocols) has subprocess smokes in
tests/test_cli_smoke.py. Here: the fusion path, which is pure file-in/
file-out logic.
"""

import numpy as np
import pytest

from rtdsd_tpu.cli.evaluate import main


@pytest.fixture()
def labeled(tmp_path):
    """Two systems over 40 trials: system A separates at EER 0, system
    B is anti-correlated noise; protocol in LA19-ish field layout."""
    rng = np.random.default_rng(3)
    n = 40
    y = np.arange(n) % 2  # alternate spoof/bonafide
    a = np.where(y == 1, 3.0, -3.0) + rng.normal(0, 0.3, n)
    b = rng.normal(0, 5.0, n)  # uninformative, much larger scale
    uids = [f"LA_E_{i:04d}" for i in range(n)]
    sa, sb, proto = (tmp_path / "a.txt", tmp_path / "b.txt",
                     tmp_path / "proto.txt")
    sa.write_text("".join(f"{u} {v}\n" for u, v in zip(uids, a)))
    sb.write_text("".join(f"{u} {v}\n" for u, v in zip(uids, b)))
    proto.write_text("".join(
        f"LA_0003 {u} - A03 {'bonafide' if l else 'spoof'}\n"
        for u, l in zip(uids, y)))
    return sa, sb, proto, uids


def test_fuse_writes_scores_without_labels(labeled, tmp_path, capsys):
    sa, sb, _, uids = labeled
    out = tmp_path / "fused.txt"
    rc = main(["--scores", str(sa), "--fuse", str(sb),
               "--fuse-out", str(out)])
    assert rc == 0
    text = capsys.readouterr().out
    assert "fused 2 systems over 40 common trials" in text
    lines = out.read_text().strip().splitlines()
    assert [l.split()[0] for l in lines] == sorted(uids)
    vals = np.asarray([float(l.split()[1]) for l in lines])
    # equal-weight z-norm fusion: mean ~0 by construction
    assert abs(vals.mean()) < 1e-9


def test_fuse_eer_and_weights(labeled, capsys):
    """z-norm fusion with a dominant weight on the good system keeps
    EER at the good system's level despite the noisy partner; the
    per-system lines expose both."""
    sa, sb, proto, _ = labeled
    rc = main(["--scores", str(sa), "--fuse", str(sb),
               "--fuse-weights", "1.0", "0.05",
               "--protocol", str(proto),
               "--file-field", "1", "--label-field", "4"])
    assert rc == 0
    text = capsys.readouterr().out
    assert f"system {sa}: EER 0.0000 %" in text
    fused_eer = float(text.split("fused EER:")[1].split("%")[0])
    assert fused_eer <= 5.0  # dominated by the separating system
    # and the noisy system alone is near-chance
    b_eer = float(text.split(f"system {sb}: EER")[1].split("%")[0])
    assert b_eer > 20.0


def test_fuse_mismatched_keys_normalize_and_join(labeled, tmp_path,
                                                 capsys):
    """A fused file keyed by full path joins via basename
    normalization, same as the protocol join."""
    sa, sb, _, uids = labeled
    c = tmp_path / "c.txt"
    c.write_text("".join(f"/data/flac/{u}.flac {i}\n"
                         for i, u in enumerate(uids)))
    rc = main(["--scores", str(sa), "--fuse", str(c),
               "--fuse-out", str(tmp_path / "f.txt")])
    assert rc == 0
    assert "40 common trials" in capsys.readouterr().out


def test_fuse_disjoint_trials_errors(labeled, tmp_path, capsys):
    sa, _, _, _ = labeled
    d = tmp_path / "d.txt"
    d.write_text("OTHER_0001 1.0\n")
    rc = main(["--scores", str(sa), "--fuse", str(d)])
    assert rc == 2
    assert "no trials common" in capsys.readouterr().err


def test_fuse_weight_count_mismatch_errors(labeled):
    sa, sb, _, _ = labeled
    with pytest.raises(SystemExit):
        main(["--scores", str(sa), "--fuse", str(sb),
              "--fuse-weights", "1.0"])
