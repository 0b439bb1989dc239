"""Streaming / long-audio scoring CLI — the real-time deployment path.

The reference has no long-audio entry point (it crops everything to a
fixed window; SURVEY.md §5 long-context row). This CLI is the framework's
deployment surface for the paper's "real-time detection" use case: slide
fixed windows over arbitrarily long audio files (static shapes, one
compiled program), emit per-window CM scores as they are produced, and an
aggregated utterance verdict.

    python -m rtdsd_tpu.cli.stream --config cfg.yaml --ckpt best \\
        --audio long1.wav long2.flac --window_sec 4 --hop_sec 2 \\
        [--aggregate mean|min|max|median] [--per_window] [--w8a8]

Output: one ``"{path} {score}"`` line per file (reference CM score-file
format; score = bonafide logit), plus per-window lines with ``--per_window``
(``"{path}#{window_idx} {t_start_sec:.2f} {score}"``).
"""

import argparse
import sys
import time

from rtdsd_tpu.utils.cache import enable_persistent_compile_cache

enable_persistent_compile_cache()


from rtdsd_tpu.config import load_yaml_config


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True, type=str)
    p.add_argument("--ckpt", required=True, type=str)
    p.add_argument("--audio", required=True, nargs="+",
                   help="WAV/FLAC file(s) of any length")
    p.add_argument("--window_sec", type=float, default=None,
                   help="window length (default: ExpConfig.test_duration_sec)")
    p.add_argument("--hop_sec", type=float, default=None,
                   help="hop between windows (default: window / 2)")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--aggregate", default="mean",
                   choices=["mean", "min", "max", "median"])
    p.add_argument("--per_window", action="store_true", default=False)
    p.add_argument("--out", type=str, default=None,
                   help="write '{path} {score}' lines here as well")
    p.add_argument("--w8", action="store_true", default=False)
    p.add_argument("--w8a8", action="store_true", default=False)
    p.add_argument("--calibration", type=str, default=None,
                   help="calibration JSON from 'cli.evaluate --calibrate': "
                        "output lines gain calibrated P(bonafide) and the "
                        "aggregate an accept/reject decision")
    p.add_argument("--operating_point", type=str, default="eer",
                   help="decision threshold from --calibration: 'eer', "
                        "'far=<rate>' or 'frr=<rate>'")
    p.add_argument("--incremental", action="store_true", default=False,
                   help="cache conv features across overlapping windows "
                        "(exact on the 20 ms frame grid; ~(window/hop)x "
                        "fewer conv FLOPs)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    sys_config, exp_config = load_yaml_config(args.config)

    from rtdsd_tpu.cli.common import load_eval_model
    from rtdsd_tpu.data.dataset import resample
    from rtdsd_tpu.data.io import load_audio
    from rtdsd_tpu.engine.steps import make_score_step
    from rtdsd_tpu.engine.streaming import (IncrementalStreamingScorer,
                                            StreamingScorer, frame_starts)

    sr = float(exp_config.sample_rate)
    # compare against None, not falsiness: an explicit 0 must be rejected
    # below, not silently replaced by the default
    window_sec = (args.window_sec if args.window_sec is not None
                  else float(exp_config.test_duration_sec))
    hop_sec = args.hop_sec if args.hop_sec is not None else window_sec / 2
    if window_sec <= 0:
        raise SystemExit(f"--window_sec must be > 0 (got {window_sec})")
    if hop_sec <= 0:
        raise SystemExit(f"--hop_sec must be > 0 (got {hop_sec})")
    duration = int(round(window_sec * sr))
    hop = int(round(hop_sec * sr))
    if hop < 1:
        raise SystemExit(f"--hop_sec {hop_sec} is under one sample at "
                         f"sample_rate {sr:g}")

    # shared eval setup (checkpoint restore, optional w8/w8a8 quantization,
    # device placement — restored trees are host numpy; without this every
    # window batch would re-upload the params)
    spec, state, _mesh, _bsh = load_eval_model(
        sys_config, exp_config, args.ckpt, w8=args.w8, w8a8=args.w8a8)

    if args.incremental:
        scorer = IncrementalStreamingScorer(
            spec.module, state.params, state.batch_stats, spec.module.w2v_cfg,
            duration=duration, hop=hop, batch_size=args.batch_size,
            aggregate=args.aggregate)
    else:
        scorer = StreamingScorer(
            make_score_step(spec.module), state.params, state.batch_stats,
            duration=duration, hop=hop, batch_size=args.batch_size,
            aggregate=args.aggregate)

    # warm the compiled score step once so the first file's wall clock (and
    # the xRT printed below) measures steady state, not jit compilation.
    # The incremental scorer additionally specializes on the audio-length
    # bucket, so it is warmed per new bucket inside the loop.
    import numpy as np
    scorer.window_scores(np.zeros(duration, np.float32))
    warmed_buckets = set()

    cal = thr = None
    if args.calibration:
        from rtdsd_tpu.utils.metrics import (calibration_threshold,
                                             load_calibration, platt_prob)
        cal = load_calibration(args.calibration)
        thr = calibration_threshold(cal, args.operating_point)

    out_fh = open(args.out, "w") if args.out else None
    for path in args.audio:
        wave, rate = load_audio(path)
        if rate != int(sr):
            wave = resample(wave, rate, int(sr))
        if args.incremental:
            key = scorer.bucket_key(len(wave))
            if key not in warmed_buckets:  # compile outside the timed region
                scorer.window_scores(np.zeros(len(wave), np.float32))
                warmed_buckets.add(key)
        t0 = time.perf_counter()
        ws = scorer.window_scores(wave)
        wall = time.perf_counter() - t0
        agg = scorer.aggregate_scores(ws)
        if args.per_window:
            # true window starts (the tail window sits at T - duration,
            # not on the hop grid; the incremental scorer snaps starts to
            # the conv frame grid)
            starts = (scorer._grid_starts(len(wave)) if args.incremental
                      else frame_starts(len(wave), duration, hop))
            for i, (s0, s) in enumerate(zip(starts, ws)):
                prob = f" p={platt_prob(s, cal):.4f}" if cal else ""
                print(f"{path}#{i} {s0 / sr:.2f} {s}{prob}")
        audio_sec = len(wave) / sr
        extra = ""
        if cal:
            verdict = "accept" if agg >= thr else "reject"
            extra = (f" p={platt_prob(agg, cal):.4f} "
                     f"{verdict}@{args.operating_point}")
        print(f"{path} {agg}{extra}")
        print(f"  [{len(ws)} windows over {audio_sec:.1f}s in {wall:.3f}s "
              f"-> xRT {wall / max(audio_sec, 1e-9):.4f}]", file=sys.stderr)
        if out_fh:
            out_fh.write(f"{path} {agg}\n")
    if out_fh:
        out_fh.close()


if __name__ == "__main__":
    main()
