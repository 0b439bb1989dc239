"""One-command reference-checkpoint parity replay (VERDICT r1 item 8).

Once a *real* trained reference checkpoint (.pt) and the corresponding eval
audio are available, this script mechanically closes the parity loop against
the reference's shipped score files (BASELINE.md "regression oracles"):

    python tools/parity_replay.py \
        --ckpt /path/to/XLSR_AASIST_best.pt \
        --config configs/paper.yaml \
        --oracle "/root/reference/results/AASIST-SSL baseline/InTheWild/random1s/XLSR_AASIST_InTheWild_o_score__aasist_baseline_best.txt" \
        [--track InTheWild] [--first-n 200] [--tol 1e-3] [--mode exact|eer]

Steps (each via the public CLI, so the replay also exercises the
reference-user path):
  1. derive a parity config from --config: compute_dtype float32 (which
     also disables the fast GELU/softmax approximations — they gate on
     (b)f16), deterministic first-N crops (is_random_start /
     la19_eval_random_start off);
  2. score: ``cli.main --is_eval --is_score --tracks <track> --ckpt <pt>``
     (the .pt is converted on the fly by load_checkpoint_for_eval);
  3. compare: per-utterance |score - oracle| over the first N common
     utterances (--mode exact; right when the oracle used deterministic
     crops), or EER-vs-EER through ``cli.evaluate`` (--mode eer; right
     against the shipped random-1s-crop oracles, 0.1% absolute gate).

Exit code 0 = parity holds at the configured tolerance.
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys
import tempfile

import numpy as np
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TRACK_ATTR = {"InTheWild": "itw_score_save_path",
              "LA19": "la19_score_save_path",
              "LA21": "la21_score_save_path",
              "DF21": "df21_score_save_path"}


def read_scores(path: str) -> dict:
    out = {}
    with open(path) as fh:
        for ln in fh:
            parts = ln.split()
            if len(parts) >= 2:
                out[parts[0]] = float(parts[-1])
    return out


def run(cmd) -> str:
    print("+", " ".join(cmd))
    r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    sys.stdout.write(r.stdout)
    sys.stderr.write(r.stderr)
    if r.returncode != 0:
        sys.exit(f"command failed rc={r.returncode}")
    return r.stdout


def eer_of(score_file: str, protocol: str, file_field: int,
           label_field: int) -> float:
    out = run([sys.executable, "-m", "rtdsd_tpu.cli.evaluate",
               "--scores", score_file, "--protocol", protocol,
               "--file-field", str(file_field),
               "--label-field", str(label_field)])
    m = re.search(r"EER:\s*([0-9.]+)%", out)
    if not m:
        sys.exit("could not parse EER from evaluate output")
    return float(m.group(1))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True,
                   help="trained reference .pt (or converted weights dir)")
    p.add_argument("--config", default="configs/paper.yaml")
    p.add_argument("--oracle", required=True,
                   help="reference score file to replay against")
    p.add_argument("--track", default="InTheWild", choices=sorted(TRACK_ATTR))
    p.add_argument("--first-n", type=int, default=0,
                   help="compare only the first N common utterances (0=all)")
    p.add_argument("--tol", type=float, default=1e-3,
                   help="max per-utterance |delta| for --mode exact")
    p.add_argument("--mode", choices=["exact", "eer"], default="exact")
    p.add_argument("--protocol", default=None,
                   help="label protocol for --mode eer")
    p.add_argument("--file-field", type=int, default=0)
    p.add_argument("--label-field", type=int, default=1)
    args = p.parse_args(argv)

    with tempfile.TemporaryDirectory() as td:
        # 1. parity config: float32 forward, deterministic first-N crops
        with open(os.path.join(REPO, args.config)) as fh:
            raw = yaml.safe_load(fh) or {}
        exp = raw.setdefault("ExpConfig", {}) or {}
        exp["compute_dtype"] = "float32"
        exp["is_random_start"] = False
        exp["la19_eval_random_start"] = False
        raw["ExpConfig"] = exp
        sys_blk = raw.setdefault("SysConfig", {}) or {}
        sys_blk["wandb_disabled"] = True
        score_file = os.path.join(td, "replay_scores.txt")
        sys_blk[TRACK_ATTR[args.track]] = score_file
        raw["SysConfig"] = sys_blk
        cfg_path = os.path.join(td, "parity_cfg.yaml")
        with open(cfg_path, "w") as fh:
            yaml.safe_dump(raw, fh)

        # 2. score through the public CLI (converts the .pt on the fly)
        run([sys.executable, "-m", "rtdsd_tpu.cli.main",
             "--config", cfg_path, "--is_eval", "--is_score",
             "--ckpt", args.ckpt, "--tracks", args.track])
        if not os.path.exists(score_file):
            sys.exit(f"expected score file {score_file} missing")

        # 3. compare
        ours = read_scores(score_file)
        oracle = read_scores(args.oracle)
        common = [k for k in oracle if k in ours]
        if args.first_n:
            common = common[: args.first_n]
        if not common:
            sys.exit("no common utterance ids between score files")
        print(f"comparing {len(common)} utterances")

        if args.mode == "exact":
            deltas = np.array([abs(ours[k] - oracle[k]) for k in common])
            print(f"|delta| max={deltas.max():.3e} mean={deltas.mean():.3e}")
            if deltas.max() > args.tol:
                sys.exit(f"FAIL: max |delta| {deltas.max():.3e} > {args.tol}")
            print("PASS: exact parity within tolerance")
        else:
            if not args.protocol:
                sys.exit("--mode eer requires --protocol")
            oracle_file = os.path.join(td, "oracle_common.txt")
            with open(oracle_file, "w") as fh:
                for k in common:
                    fh.write(f"{k} {oracle[k]}\n")
            e_ours = eer_of(score_file, args.protocol, args.file_field,
                            args.label_field)
            e_oracle = eer_of(oracle_file, args.protocol, args.file_field,
                              args.label_field)
            print(f"EER ours={e_ours:.4f}% oracle={e_oracle:.4f}%")
            if abs(e_ours - e_oracle) > 0.1:  # 0.1% absolute (BASELINE.md)
                sys.exit("FAIL: EER differs by more than 0.1% absolute")
            print("PASS: EER within 0.1% absolute of the oracle")


if __name__ == "__main__":
    main()
