"""A/B quality report between two training runs (e.g. fp32 vs bf16_all).

Sweeps every saved checkpoint of both runs through the eval CLI
(rave_tpu/train/evaluate.py) on the same holdout split, prints a
side-by-side markdown table plus trainer-logged validation curves from
metrics.jsonl, and a pass/fail verdict against a relative tolerance.

Usage:
  python tools/ab_report.py --a /tmp/runs_r5/ab_fp32_* --b /tmp/runs_r5/ab_bf16_* \
      --db_path /tmp/db_full [--tol 0.05] [--ema]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys


def _ckpt_steps(run: str) -> list:
    out = []
    for d in sorted(glob.glob(os.path.join(run, "checkpoints", "step_*"))):
        try:
            out.append(int(os.path.basename(d).split("_")[-1]))
        except ValueError:
            pass
    return out


def _eval(run: str, db: str, step: int, ema: bool) -> dict:
    cmd = [
        sys.executable, "-m", "rave_tpu.cli", "eval", "--run", run,
        "--db_path", db, "--step", str(step),
    ]
    if ema:
        cmd.append("--ema_weights")
    r = subprocess.run(cmd, capture_output=True, text=True, check=True)
    return json.loads(r.stdout.strip().splitlines()[-1])


def _val_curve(run: str) -> dict:
    curve = {}
    p = os.path.join(run, "metrics.jsonl")
    if os.path.exists(p):
        for line in open(p):
            m = json.loads(line)
            if "validation" in m:
                curve[m["step"]] = m["validation"]
    return curve


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--a", required=True, help="baseline run dir (glob ok)")
    p.add_argument("--b", required=True, help="candidate run dir (glob ok)")
    p.add_argument("--db_path", required=True)
    p.add_argument("--tol", type=float, default=0.05,
                   help="max relative regression of B vs A at the final "
                   "common checkpoint (spectral distance)")
    p.add_argument("--ema", action="store_true")
    p.add_argument("--label_a", default="A")
    p.add_argument("--label_b", default="B")
    p.add_argument("--steps", type=int, nargs="*", default=None,
                   help="restrict the sweep to these checkpoint steps "
                   "(e.g. on a time budget); default: all common steps")
    args = p.parse_args()
    run_a = sorted(glob.glob(args.a))[-1]
    run_b = sorted(glob.glob(args.b))[-1]
    steps = sorted(set(_ckpt_steps(run_a)) & set(_ckpt_steps(run_b)))
    if args.steps:
        missing = set(args.steps) - set(steps)
        if missing:
            sys.exit(f"steps not present in both runs: {sorted(missing)}")
        steps = sorted(args.steps)
    if not steps:
        sys.exit("no common checkpoint steps between the two runs")

    print(f"| step | {args.label_a} spectral | {args.label_b} spectral "
          f"| {args.label_a} L1 | {args.label_b} L1 "
          f"| {args.label_a} FMD | {args.label_b} FMD |")
    print("|---|---|---|---|---|---|---|")
    final = {}
    for s in steps:
        ea = _eval(run_a, args.db_path, s, args.ema)
        eb = _eval(run_b, args.db_path, s, args.ema)
        print(f"| {s} | {ea['spectral_distance']:.4f} "
              f"| {eb['spectral_distance']:.4f} "
              f"| {ea['waveform_l1']:.4f} | {eb['waveform_l1']:.4f} "
              f"| {ea['frechet_mel_distance']:.3f} "
              f"| {eb['frechet_mel_distance']:.3f} |",
              flush=True)
        final = {"a": ea, "b": eb, "step": s}

    ca, cb = _val_curve(run_a), _val_curve(run_b)
    common = sorted(set(ca) & set(cb))
    if common:
        print(f"\ntrainer val curve ({args.label_a} / {args.label_b}):")
        print(" ".join(f"{s}:{ca[s]:.3f}/{cb[s]:.3f}" for s in common))

    ra = final["a"]["spectral_distance"]
    rb = final["b"]["spectral_distance"]
    rel = (rb - ra) / ra
    ok = rel <= args.tol
    print(json.dumps({
        "final_step": final["step"],
        f"{args.label_a}_spectral": ra, f"{args.label_b}_spectral": rb,
        f"{args.label_a}_fmd": final["a"]["frechet_mel_distance"],
        f"{args.label_b}_fmd": final["b"]["frechet_mel_distance"],
        "relative_regression": round(rel, 4), "tolerance": args.tol,
        "pass": bool(ok),
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
