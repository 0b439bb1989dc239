"""Score audio with an exported artifact — no config, checkpoint, or model
code required.

The consumer side of ``cli.export``: give it the artifact a build machine
produced and a list of audio files, and it writes the same ``utt_id score``
lines as ``cli.main --is_score`` (score = bonafide logit, no pre-emphasis —
ref ``produce_evaluation_file``, ``/root/reference/main.py:199-221``). This
is the whole deployment footprint on an edge box: jax + this file's logic
+ the artifact bytes.

    # batch scorer artifact (one fixed-duration score per file)
    python -m rtdsd_tpu.cli.infer --artifact student.jaxexp \
        --audio a.flac b.wav --out scores.txt

    # streaming bundle (long audio; per-window scores + aggregate)
    python -m rtdsd_tpu.cli.infer --artifact stream_art \
        --audio long.wav --per_window --aggregate median

Artifact kind is auto-detected from the ``.json`` sidecar. Clips are
duration-fitted exactly like the eval datasets (repeat-tile + first-N
crop, ``data/dataset.py adjust_duration``); sample-rate mismatches are
rejected rather than silently mis-scored.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _utt_id(path: str) -> str:
    return os.path.splitext(os.path.basename(path))[0]


def _load_checked(path: str, expect_sr: int) -> np.ndarray:
    from rtdsd_tpu.data.io import load_audio

    wave, sr = load_audio(path)
    if sr != expect_sr:
        raise ValueError(f"{path}: sample rate {sr} != artifact's "
                         f"{expect_sr} — resample before scoring")
    return wave


def _fit(wave: np.ndarray, n: int) -> np.ndarray:
    """Repeat-tile + first-n crop — the eval datasets' duration fit."""
    from rtdsd_tpu.data.dataset import adjust_duration

    return adjust_duration(wave, n)


def score_batch_artifact(artifact, meta: dict, paths, batch_size: int = 8):
    """Score files through a :func:`export_scorer` artifact.

    Returns ``(names, scores)``. A fixed-batch artifact pads the tail
    batch by repeating the last clip; a symbolic-batch one dispatches the
    exact remainder.
    """
    sr = int(meta["sample_rate"])
    n = int(round(float(meta["duration_sec"]) * sr))
    fixed = meta.get("batch")
    fixed = None if fixed in (None, "symbolic") else int(fixed)
    if fixed is not None:
        batch_size = fixed

    names, scores = [], []
    for lo in range(0, len(paths), batch_size):
        chunk = paths[lo: lo + batch_size]
        waves = np.stack([_fit(_load_checked(p, sr), n) for p in chunk])
        valid = waves.shape[0]
        if fixed is not None and valid < fixed:
            waves = np.concatenate(
                [waves, np.repeat(waves[-1:], fixed - valid, axis=0)])
        out = np.asarray(artifact.call(waves.astype(np.float32)))
        names.extend(_utt_id(p) for p in chunk)
        scores.extend(out[:valid].tolist())
    return names, scores


def main(argv=None):
    p = argparse.ArgumentParser(
        description="score audio files with an exported artifact "
                    "(no config/checkpoint)")
    p.add_argument("--artifact", required=True,
                   help="path from cli.export --out: a .jaxexp file or a "
                        "streaming bundle prefix (auto-detected)")
    p.add_argument("--audio", required=True, nargs="+")
    p.add_argument("--out", type=str, default=None,
                   help="write 'utt_id score' lines here (default: stdout)")
    p.add_argument("--batch_size", type=int, default=8,
                   help="dispatch batch (symbolic-batch artifacts only)")
    p.add_argument("--aggregate", default="mean",
                   choices=("mean", "min", "max", "median"),
                   help="window-score aggregate (streaming bundles)")
    p.add_argument("--per_window", action="store_true", default=False,
                   help="also print per-window scores (streaming bundles)")
    p.add_argument("--calibration", type=str, default=None,
                   help="calibration JSON from 'cli.evaluate --calibrate': "
                        "stdout lines gain calibrated P(bonafide) and an "
                        "accept/reject decision (--out stays raw scores)")
    p.add_argument("--operating_point", type=str, default="eer",
                   help="decision threshold from --calibration: 'eer', "
                        "'far=<rate>' or 'frr=<rate>'")
    args = p.parse_args(argv)

    with open(args.artifact + ".json") as fh:
        meta = json.load(fh)

    cal = thr = None
    if args.calibration:
        from rtdsd_tpu.utils.metrics import (calibration_threshold,
                                             load_calibration, platt_prob)
        cal = load_calibration(args.calibration)
        thr = calibration_threshold(cal, args.operating_point)

    names, scores = [], []
    if meta.get("streaming"):
        from rtdsd_tpu.cli.export import StreamingArtifact

        art = StreamingArtifact.load(args.artifact)
        sr = int(meta["sample_rate"])
        for path in args.audio:
            ws, starts = art.window_scores(_load_checked(path, sr),
                                           return_starts=True)
            if args.per_window:
                # actual window positions: hop-grid starts snapped to the
                # conv frame grid plus the tail window — not i * hop
                for i, (s, st) in enumerate(zip(ws, starts)):
                    prob = (f" p={platt_prob(float(s), cal):.4f}"
                            if cal else "")
                    print(f"{_utt_id(path)}#{i} {st / sr:.2f} "
                          f"{float(s)}{prob}")
            agg = {"mean": np.mean, "min": np.min, "max": np.max,
                   "median": np.median}[args.aggregate]
            names.append(_utt_id(path))
            scores.append(float(agg(ws)))
    else:
        from rtdsd_tpu.cli.export import ScoringArtifact

        art = ScoringArtifact.load(args.artifact)
        names, scores = score_batch_artifact(art, meta, args.audio,
                                             args.batch_size)

    if args.out:
        from rtdsd_tpu.cli.common import _write_score_file

        _write_score_file(args.out, names, scores)
    else:
        for f, cm in zip(names, scores):
            extra = ""
            if cal:
                verdict = "accept" if cm >= thr else "reject"
                extra = (f" p={platt_prob(cm, cal):.4f} "
                         f"{verdict}@{args.operating_point}")
            print(f"{f} {cm}{extra}")


if __name__ == "__main__":
    main()
