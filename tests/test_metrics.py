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


# ------------------------------------------------------------- min t-DCF

def _tdcf_bruteforce(scores, labels, **kw):
    """Oracle: evaluate the raw tandem cost at every candidate threshold."""
    from rtdsd_tpu.utils.metrics import compute_min_tdcf  # constants below

    p_tar, p_non, p_spoof = 0.9405, 0.0095, 0.05
    c_miss, c_fa, c_fa_spoof = 1.0, 10.0, 10.0
    pm_asv = kw.get("pmiss_asv", 0.0)
    pf_asv = kw.get("pfa_asv", 0.0)
    pms_asv = kw.get("pmiss_spoof_asv", 0.0)
    bona = scores[labels == 1]
    spoof = scores[labels == 0]
    c0 = p_tar * c_miss * pm_asv + p_non * c_fa * pf_asv
    c1 = p_tar * c_miss * (1 - pm_asv) - p_non * c_fa * pf_asv
    c2 = p_spoof * c_fa_spoof * (1 - pms_asv)
    best = np.inf
    for t in np.concatenate([[-np.inf], np.unique(scores), [np.inf]]):
        pmiss = np.mean(bona < t)
        pfa = np.mean(spoof >= t)
        best = min(best, c0 + c1 * pmiss + c2 * pfa)
    return best / (c0 + min(c1, c2))


def test_min_tdcf_matches_bruteforce_oracle():
    from rtdsd_tpu.utils.metrics import compute_min_tdcf

    rng = np.random.default_rng(5)
    for pm, pf, pms in [(0.0, 0.0, 0.0), (0.02, 0.01, 0.95),
                        (0.05, 0.05, 0.5)]:
        labels = (rng.random(400) < 0.4).astype(int)
        scores = rng.standard_normal(400) + 1.2 * labels
        kw = dict(pmiss_asv=pm, pfa_asv=pf, pmiss_spoof_asv=pms)
        got = compute_min_tdcf(scores, labels, **kw)
        want = _tdcf_bruteforce(scores, labels, **kw)
        assert abs(got - want) < 1e-12
        assert 0.0 <= got <= 1.0 + 1e-12  # normalized: trivial CM scores 1


def test_min_tdcf_perfect_separation_is_zero_with_perfect_asv():
    from rtdsd_tpu.utils.metrics import compute_min_tdcf

    scores = np.asarray([-3.0, -2.0, 2.0, 3.0])
    labels = np.asarray([0, 0, 1, 1])
    assert compute_min_tdcf(scores, labels) == 0.0


def test_min_tdcf_needs_both_classes():
    from rtdsd_tpu.utils.metrics import compute_min_tdcf

    with pytest.raises(ValueError):
        compute_min_tdcf(np.ones(3), np.ones(3))


def test_reference_score_files_parse_and_roundtrip():
    """Golden-format check against the reference's shipped CM score files.

    The rebuild's score writer uses the same ``"{utt_id} {score}"`` line
    format as /root/reference/main.py:211-219; our evaluate-CLI reader
    must parse the reference's actual published artifacts, and a file we
    write must be byte-identical under read->write roundtrip.
    """
    import os

    import pytest

    from rtdsd_tpu.cli.evaluate import read_scores

    ref = ("/root/reference/results/Conformer baseline/InTheWild/random1s/"
           "ConformerModel_InTheWild_o_score__conformer_baseline_best.txt")
    if not os.path.exists(ref):
        pytest.skip("reference artifacts not mounted")
    scores = read_scores(ref)
    assert len(scores) == 31779
    vals = list(scores.values())
    assert all(isinstance(v, float) for v in vals[:10])

    # roundtrip: our writer's format reproduces the reference lines
    with open(ref) as fh:
        head = [next(fh) for _ in range(50)]
    rebuilt = ["{} {}\n".format(k, v)
               for k, v in list(scores.items())[:50]]
    assert rebuilt == head


def test_cascade_band_sweep_cli(tmp_path, capsys):
    """Offline cascade band calibration (cli.evaluate --cascade-sweep):
    band 0 must reproduce the screener EER, the max band the flagship
    EER, and escalation rates must be the swept quantiles."""
    import numpy as np

    from rtdsd_tpu.cli import evaluate

    rng = np.random.default_rng(0)
    n = 200
    labels = np.arange(n) % 2  # 1 = bonafide
    # screener: noisy scores (some overlap -> nonzero EER);
    # flagship: clean separation (EER 0)
    screener = np.where(labels == 1, 1.0, -1.0) + rng.normal(0, 1.2, n)
    flagship = np.where(labels == 1, 5.0, -5.0)

    proto = tmp_path / "proto.txt"
    proto.write_text("".join(
        f"spk u{i:03d} - A01 {'bonafide' if l else 'spoof'}\n"
        for i, l in enumerate(labels)))
    s_file = tmp_path / "screener.txt"
    s_file.write_text("".join(
        f"u{i:03d} {screener[i]}\n" for i in range(n)))
    f_file = tmp_path / "flagship.txt"
    f_file.write_text("".join(
        f"u{i:03d} {flagship[i]}\n" for i in range(n)))

    rc = evaluate.main(["--scores", str(s_file), "--protocol", str(proto),
                        "--file-field", "1", "--label-field", "4",
                        "--cascade-sweep", str(f_file)])
    assert rc == 0
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l]
    screener_eer = float(lines[1].split()[1])
    assert screener_eer > 1.0  # overlapping distributions
    assert "flagship EER: 0.0000" in lines[2]
    sweep = [l.split() for l in lines[4:]]
    rates = [float(row[1]) for row in sweep]
    eers = [float(row[3]) for row in sweep]
    assert rates[0] == 0.0 and abs(rates[-1] - 100.0) < 1e-9
    np.testing.assert_allclose(eers[0], screener_eer, atol=1e-4)
    assert eers[-1] == 0.0
    assert all(a >= b - 1e-9 for a, b in zip(eers, eers[1:]))  # monotone-ish


# -------------------------------------------- official t-DCF cross-check

def _official_det_curve(target_scores, nontarget_scores):
    """Transcribed from the official ASVspoof eval package's
    ``compute_det_curve`` (t-DCF v2 code, Kinnunen et al.; also shipped
    verbatim in the ASVspoof 2021 evaluation package). Sort-based sweep —
    a different algorithm from both compute_min_tdcf's two-pointer scan
    and the brute-force oracle above, so agreement is evidence, not
    shared assumptions."""
    n_scores = target_scores.size + nontarget_scores.size
    all_scores = np.concatenate((target_scores, nontarget_scores))
    labels = np.concatenate((np.ones(target_scores.size),
                             np.zeros(nontarget_scores.size)))
    indices = np.argsort(all_scores, kind="mergesort")
    labels = labels[indices]
    tar_trial_sums = np.cumsum(labels)
    nontarget_trial_sums = nontarget_scores.size - (
        np.arange(1, n_scores + 1) - tar_trial_sums)
    frr = np.concatenate(
        (np.atleast_1d(0), tar_trial_sums / target_scores.size))
    far = np.concatenate(
        (np.atleast_1d(1), nontarget_trial_sums / nontarget_scores.size))
    thresholds = np.concatenate(
        (np.atleast_1d(all_scores[indices[0]] - 0.001), all_scores[indices]))
    return frr, far, thresholds


def _official_min_tdcf(bonafide_score_cm, spoof_score_cm, Pfa_asv, Pmiss_asv,
                       Pfa_spoof_asv, cost_model):
    """Transcribed from the official ``compute_tDCF`` (revised/"constrained"
    t-DCF, ASVspoof 2021 eval package): C0/C1/C2 weights, DET sweep over CM
    thresholds, normalization by the best trivial CM, minimum over the
    sweep."""
    C0 = (cost_model["Ptar"] * cost_model["Cmiss"] * Pmiss_asv
          + cost_model["Pnon"] * cost_model["Cfa"] * Pfa_asv)
    C1 = cost_model["Ptar"] * cost_model["Cmiss"] - (
        cost_model["Ptar"] * cost_model["Cmiss"] * Pmiss_asv
        + cost_model["Pnon"] * cost_model["Cfa"] * Pfa_asv)
    C2 = cost_model["Pspoof"] * cost_model["Cfa_spoof"] * Pfa_spoof_asv
    Pmiss_cm, Pfa_cm, _ = _official_det_curve(bonafide_score_cm,
                                              spoof_score_cm)
    tDCF = C0 + C1 * Pmiss_cm + C2 * Pfa_cm
    tDCF_norm = tDCF / (C0 + min(C1, C2))
    return float(np.min(tDCF_norm))


def test_min_tdcf_matches_official_asvspoof_code():
    """compute_min_tdcf == the official ASVspoof-2021 t-DCF computation
    (vendored above) across ASV operating points, including the official
    default LA cost model (Pspoof .05, Ptar .9405, Pnon .0095, Cmiss 1,
    Cfa 10, Cfa_spoof 10 — compute_min_tdcf's defaults)."""
    from rtdsd_tpu.utils.metrics import compute_min_tdcf

    cost_model = {"Pspoof": 0.05, "Ptar": 0.9405, "Pnon": 0.0095,
                  "Cmiss": 1.0, "Cfa": 10.0, "Cfa_spoof": 10.0}
    rng = np.random.default_rng(17)
    # (Pmiss_asv, Pfa_asv, Pfa_spoof_asv): perfect ASV, a realistic one,
    # and a sloppy one that accepts most spoofs
    for pm, pf, pfs in [(0.0, 0.0, 1.0), (0.02, 0.01, 0.45),
                        (0.1, 0.08, 0.9)]:
        for sep in (0.5, 1.5, 3.0):
            labels = (rng.random(500) < 0.45).astype(int)
            scores = rng.standard_normal(500) + sep * labels
            want = _official_min_tdcf(scores[labels == 1],
                                      scores[labels == 0],
                                      Pfa_asv=pf, Pmiss_asv=pm,
                                      Pfa_spoof_asv=pfs,
                                      cost_model=cost_model)
            got = compute_min_tdcf(scores, labels, pmiss_asv=pm, pfa_asv=pf,
                                   pmiss_spoof_asv=1.0 - pfs)
            assert abs(got - want) < 1e-12, (pm, pf, pfs, sep)


def test_min_tdcf_official_with_ties_and_duplicates():
    """Duplicate scores exercise the threshold-set edge cases where a
    naive sweep and the official cumulative-sum DET can disagree."""
    from rtdsd_tpu.utils.metrics import compute_min_tdcf

    cost_model = {"Pspoof": 0.05, "Ptar": 0.9405, "Pnon": 0.0095,
                  "Cmiss": 1.0, "Cfa": 10.0, "Cfa_spoof": 10.0}
    scores = np.array([-1.0, -1.0, 0.0, 0.0, 0.0, 0.5, 0.5, 1.0, 1.0, -0.5])
    labels = np.array([0, 0, 0, 1, 1, 1, 0, 1, 1, 1])
    want = _official_min_tdcf(scores[labels == 1], scores[labels == 0],
                              Pfa_asv=0.03, Pmiss_asv=0.04,
                              Pfa_spoof_asv=0.6, cost_model=cost_model)
    got = compute_min_tdcf(scores, labels, pmiss_asv=0.04, pfa_asv=0.03,
                           pmiss_spoof_asv=0.4)
    assert abs(got - want) < 1e-12


def test_tag_score_path_and_shortfall_guard():
    """cli.common hardening: --comment tagging refuses un-taggable paths
    (silent replace() no-op -> two runs collide on one file), and a scored
    submission missing trials raises instead of writing a short file."""
    import pytest as _pytest

    from rtdsd_tpu.cli.common import _check_score_shortfall, tag_score_path

    assert tag_score_path("out/scores.txt", "v2", "p") == "out/scores_v2.txt"
    assert tag_score_path("out/scores.txt", None, "p") == "out/scores.txt"
    with _pytest.raises(ValueError, match="comment"):
        tag_score_path("out/scores", "v2", "la19_score_save_path")

    class _DS:
        trials = [1, 2, 3]

    _check_score_shortfall(_DS(), ["a", "b", "c"])  # full coverage: ok
    with _pytest.raises(RuntimeError, match="scored 2/3"):
        _check_score_shortfall(_DS(), ["a", "b"])


# ----------------------------------------------------------- calibration


def test_calibrate_thresholds_match_bruteforce():
    """EER/FAR/FRR operating points vs an exhaustive threshold sweep."""
    from rtdsd_tpu.utils.metrics import calibrate_scores

    rng = np.random.default_rng(3)
    bona = rng.normal(2.0, 1.0, 400)
    spoof = rng.normal(-2.0, 1.5, 600)
    s = np.concatenate([bona, spoof])
    y = np.concatenate([np.ones(400, int), np.zeros(600, int)])

    cal = calibrate_scores(s, y, target_fars=(0.01, 0.1),
                           target_frrs=(0.02,))

    def far(t):
        return float((spoof >= t).mean())

    def frr(t):
        return float((bona < t).mean())

    # the EER threshold really sits at the FAR/FRR crossing
    t = cal["eer_threshold"]
    assert abs(far(t) - frr(t)) <= 2.0 / 400
    assert cal["eer_far"] == pytest.approx(far(t))
    assert cal["eer_frr"] == pytest.approx(frr(t))
    assert abs((far(t) + frr(t)) / 2 * 100 - cal["eer_pct"]) < 0.5

    # FAR budgets: achieved <= target, and no smaller threshold (=
    # better FRR) could also meet the budget
    for x, op in cal["at_far"].items():
        t = op["threshold"]
        assert far(t) <= x + 1e-12
        assert op["far"] == pytest.approx(far(t))
        assert op["frr"] == pytest.approx(frr(t))
        tighter = np.unique(s)[np.unique(s) < t]
        assert all(far(tt) > x for tt in tighter)
    for x, op in cal["at_frr"].items():
        t = op["threshold"]
        assert frr(t) <= x + 1e-12
        looser = np.unique(s)[np.unique(s) > t]
        assert all(frr(float(tt)) > x for tt in looser)


def test_calibrate_platt_matches_scipy_oracle():
    """The Newton Platt fit must agree with scipy.optimize minimizing
    the identical smoothed log-loss."""
    from rtdsd_tpu.utils.metrics import calibrate_scores

    scipy_opt = pytest.importorskip("scipy.optimize")
    rng = np.random.default_rng(11)
    s = np.concatenate([rng.normal(1.5, 1.2, 300),
                        rng.normal(-1.0, 1.0, 500)])
    y = np.concatenate([np.ones(300, int), np.zeros(500, int)])

    cal = calibrate_scores(s, y)

    n_pos, n_neg = 300, 500
    t = np.where(y == 1, (n_pos + 1.0) / (n_pos + 2.0),
                 1.0 / (n_neg + 2.0))

    def loss(ab):
        z = np.clip(ab[0] * s + ab[1], -60, 60)
        # cross-entropy against the smoothed targets
        return float(np.sum(np.logaddexp(0, z) - t * z))

    res = scipy_opt.minimize(loss, x0=[1.0, 0.0], method="Nelder-Mead",
                             options={"xatol": 1e-8, "fatol": 1e-12,
                                      "maxiter": 4000})
    assert cal["platt_a"] == pytest.approx(res.x[0], abs=2e-3)
    assert cal["platt_b"] == pytest.approx(res.x[1], abs=2e-3)
    # calibrated probabilities are ordered with the scores
    p = 1 / (1 + np.exp(-(cal["platt_a"] * s + cal["platt_b"])))
    assert p[np.argmax(s)] > 0.9 and p[np.argmin(s)] < 0.1


def test_calibrate_separable_scores_stay_finite():
    """Perfectly separable dev sets must not blow up the Platt slope
    (the smoothed targets bound it)."""
    from rtdsd_tpu.utils.metrics import calibrate_scores

    from scipy.optimize import minimize

    s = np.concatenate([np.linspace(1, 2, 50), np.linspace(-2, -1, 50)])
    y = np.concatenate([np.ones(50, int), np.zeros(50, int)])
    cal = calibrate_scores(s, y)
    assert np.isfinite(cal["platt_a"]) and np.isfinite(cal["platt_b"])
    assert cal["eer_pct"] == 0.0
    assert cal["at_far"][0.01]["frr"] == 0.0  # separable: both rates 0

    # and the fit is the smoothing-bounded OPTIMUM, not a runaway slope
    # (a raw Newton step overshoots into the sigmoid tails on separable
    # data; the line search must keep the loss monotone to the optimum)
    t = np.where(y == 1, 51 / 52, 1 / 52)

    def nll(v):
        z = v[0] * s + v[1]
        return np.mean(t * np.logaddexp(0, -z) + (1 - t) * np.logaddexp(0, z))

    res = minimize(nll, np.array([1.0, 0.0]), method="Nelder-Mead",
                   options={"xatol": 1e-9, "fatol": 1e-14, "maxiter": 5000})
    assert nll([cal["platt_a"], cal["platt_b"]]) <= res.fun + 1e-9
    assert abs(cal["platt_a"]) < 100.0  # a sane, usable slope


def test_calibration_file_roundtrip_and_threshold_lookup(tmp_path):
    """load_calibration accepts exactly what cli.evaluate --calibrate
    writes (incl. its %g re-keyed at_far/at_frr tables); platt_prob and
    calibration_threshold recover the fit and operating points."""
    import json

    from rtdsd_tpu.utils.metrics import (calibrate_scores,
                                         calibration_threshold,
                                         load_calibration, platt_prob)

    rng = np.random.default_rng(11)
    s = np.concatenate([rng.normal(1.2, 1.0, 400),
                        rng.normal(-1.0, 1.0, 400)])
    y = np.concatenate([np.ones(400, int), np.zeros(400, int)])
    cal = calibrate_scores(s, y, target_fars=(0.05,), target_frrs=(0.1,))
    # the CLI re-keys the rate tables with %g strings before dumping
    cal["at_far"] = {f"{k:g}": v for k, v in cal["at_far"].items()}
    cal["at_frr"] = {f"{k:g}": v for k, v in cal["at_frr"].items()}
    path = tmp_path / "cal.json"
    path.write_text(json.dumps(cal))

    got = load_calibration(str(path))
    assert got["platt_a"] == cal["platt_a"]
    p = platt_prob(s, got)
    want = 1 / (1 + np.exp(-(cal["platt_a"] * s + cal["platt_b"])))
    np.testing.assert_allclose(p, want, rtol=1e-12)
    assert float(platt_prob(0.0, got)) == pytest.approx(
        1 / (1 + np.exp(-cal["platt_b"])))

    assert calibration_threshold(got, "eer") == cal["eer_threshold"]
    assert calibration_threshold(got, "far=0.05") == \
        cal["at_far"]["0.05"]["threshold"]
    assert calibration_threshold(got, "frr=0.1") == \
        cal["at_frr"]["0.1"]["threshold"]
    with pytest.raises(ValueError, match="far=0.2"):
        calibration_threshold(got, "far=0.2")
    with pytest.raises(ValueError, match="operating point"):
        calibration_threshold(got, "bogus")

    # not-a-calibration JSON names the missing keys
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"something": 1}))
    with pytest.raises(ValueError, match="platt_a"):
        load_calibration(str(bad))


def test_cascade_sweep_sidecar_to_serve_flow(tmp_path, capsys):
    """r5 (VERDICT r4 item 6) one-command cascade re-calibration:
    --cascade-sweep --cascade-out picks a band on a dense sweep and
    writes a sidecar; cli.serve --cascade_calibration consumes it
    (explicit flags still win); bogus files fail with a pointer to the
    producing command."""
    import json

    import numpy as np
    import pytest

    from rtdsd_tpu.cli import evaluate, serve
    from rtdsd_tpu.utils.metrics import load_cascade_calibration

    rng = np.random.default_rng(3)
    n = 300
    labels = np.arange(n) % 2
    screener = np.where(labels == 1, 1.0, -1.0) + rng.normal(0, 1.0, n)
    flagship = np.where(labels == 1, 5.0, -5.0)
    proto = tmp_path / "proto.txt"
    proto.write_text("".join(
        f"spk u{i:03d} - A01 {'bonafide' if l else 'spoof'}\n"
        for i, l in enumerate(labels)))
    s_file = tmp_path / "screener.txt"
    s_file.write_text("".join(f"u{i:03d} {screener[i]}\n" for i in range(n)))
    f_file = tmp_path / "flagship.txt"
    f_file.write_text("".join(f"u{i:03d} {flagship[i]}\n" for i in range(n)))
    out_json = tmp_path / "band.json"

    rc = evaluate.main(["--scores", str(s_file), "--protocol", str(proto),
                        "--file-field", "1", "--label-field", "4",
                        "--cascade-sweep", str(f_file),
                        "--cascade-out", str(out_json)])
    assert rc == 0
    assert "picked band" in capsys.readouterr().out
    side = load_cascade_calibration(str(out_json))
    assert side["kind"] == "cascade_calibration"
    assert side["band"] > 0.0 and side["center"] == 0.0
    assert 0.0 < side["escalation_rate"] <= 1.0
    # EER pick rule: within 2% of the best achievable cascade EER
    assert side["cascade_eer"] <= side["screener_eer"]

    # target-escalation pick rule
    rc = evaluate.main(["--scores", str(s_file), "--protocol", str(proto),
                        "--file-field", "1", "--label-field", "4",
                        "--cascade-sweep", str(f_file),
                        "--cascade-out", str(out_json),
                        "--cascade-pick-esc", "0.2"])
    assert rc == 0
    capsys.readouterr()
    side2 = json.load(open(out_json))
    assert abs(side2["escalation_rate"] - 0.2) < 0.05

    # serve consumes the sidecar: band/center filled before any model load
    args = serve.parse_args(["--cascade_calibration", str(out_json),
                             "--audio", "x.wav"])
    with pytest.raises(SystemExit, match="--config and --ckpt"):
        serve.build_engine(args, 2)
    assert args.cascade_band == pytest.approx(side2["band"])
    assert args.cascade_center == side2["center"]
    # the measured dev escalation rate rides along to size the esc chunk
    # (engine esc_rate, test_serving.py::test_esc_rate_sizes_esc_batch)
    assert args.cascade_esc_rate == pytest.approx(side2["escalation_rate"])

    # explicit flags outrank the sidecar
    args = serve.parse_args(["--cascade_calibration", str(out_json),
                             "--cascade_band", "9.875",
                             "--audio", "x.wav"])
    with pytest.raises(SystemExit, match="--config and --ckpt"):
        serve.build_engine(args, 2)
    assert args.cascade_band == 9.875

    # non-calibration JSON fails with the producing command in the error
    bogus = tmp_path / "bogus.json"
    bogus.write_text("{\"platt_a\": 1.0}")
    with pytest.raises(ValueError, match="cascade-sweep"):
        load_cascade_calibration(str(bogus))
