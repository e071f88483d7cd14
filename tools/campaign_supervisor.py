"""Supervised full-scale training campaign (round 5).

The remote TPU relay occasionally drops mid-run and leaves the trainer
hard-wedged in a device wait (0 CPU, futex) rather than raising — a bash
retry loop never fires because the process never exits. This supervisor
watches each run's *observable progress* (mtime of metrics.jsonl /
status.json in the run dir) and, when a run goes stale past a threshold,
kills the whole process group and relaunches it; orbax checkpoints make
each relaunch resume where the last attempt saved.

Campaign (VERDICT r4 items 3+4): v2 fp32 vs bf16_all quality A/B, then
full-scale discrete (RVQ codebook health) and v3 (packed descript
critics), 40k steps each on /tmp/db_full.

Usage: python tools/campaign_supervisor.py [--only NAME ...]
Writes logs under /tmp/runs_r5/, one file per attempt.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DB = "/tmp/db_full"
OUT = "/tmp/runs_r5"

COMMON = [
    "--db_path", DB, "--out_path", OUT, "--batch", "8",
    "--n_signal", "131072", "--val_every", "2500", "--save_every", "5000",
    "--ema", "0.999", "--seed", "0", "--no_progress", "--device_data", "on",
]

RUNS = [
    ("ab_fp32", ["--config", "v2",
                 "--override", "train.phase_1_duration=20000",
                 "--max_steps", "40000"]),
    ("ab_bf16", ["--config", "v2",
                 "--override", "train.phase_1_duration=20000",
                 "--override", "train.bf16=true",
                 "--override", "train.bf16_dis=true",
                 "--max_steps", "40000"]),
    ("full_discrete", ["--config", "discrete",
                       "--override", "train.phase_1_duration="
                       + os.environ.get("RAVE_TPU_CAMPAIGN_DISCRETE_PHASE1",
                                        "20000"),
                       "--max_steps",
                       os.environ.get("RAVE_TPU_CAMPAIGN_DISCRETE_STEPS",
                                      "40000")]),
    ("full_v3", ["--config", "v3",
                 "--override", "train.phase_1_duration="
                 + os.environ.get("RAVE_TPU_CAMPAIGN_V3_PHASE1", "20000"),
                 "--max_steps",
                 os.environ.get("RAVE_TPU_CAMPAIGN_V3_STEPS", "40000")]),
]

# Staleness thresholds. Before the first metric lands the run is
# compiling (full-size v3 can take several minutes per program on the
# TPU). After that, steps land every ~6 s — but schedule boundaries
# (quantize activation, the adversarial phase switch) compile a NEW
# program mid-run, which looks identical to a wedge for 10+ minutes, so
# the warm threshold must sit above the longest mid-run compile (a real
# wedge just costs that much longer to catch; checkpoints bound the
# rework). Both are env-overridable.
COLD_STALL_S = float(os.environ.get("RAVE_TPU_CAMPAIGN_COLD_STALL", "2400"))
WARM_STALL_S = float(os.environ.get("RAVE_TPU_CAMPAIGN_WARM_STALL", "1200"))
MAX_ATTEMPTS = 10


def _run_dir(name: str) -> str | None:
    dirs = sorted(glob.glob(os.path.join(OUT, f"{name}_*")))
    return dirs[-1] if dirs else None


def _progress_mtime(run_dir: str | None) -> float:
    """mtime of the newest *training-progress* file, or 0.0 before any
    training step has landed. config/status files are written at process
    start, so only a non-empty metrics.jsonl counts as progress — a run
    must stay on the generous cold threshold through its entire first
    compile+RF-probe phase (10+ min fresh on full-size bf16 configs)."""
    if not run_dir:
        return 0.0
    best = 0.0
    metrics = os.path.join(run_dir, "metrics.jsonl")
    try:
        if os.path.getsize(metrics) > 0:
            best = os.path.getmtime(metrics)
            # once training is live, status.json ticks every step and is
            # the freshest signal (metrics flush every 100 steps)
            try:
                best = max(best, os.path.getmtime(
                    os.path.join(run_dir, "status.json")))
            except OSError:
                pass
    except OSError:
        pass
    return best


def _status_step(run_dir: str | None) -> int:
    if not run_dir:
        return -1
    try:
        with open(os.path.join(run_dir, "status.json")) as fh:
            return int(json.load(fh).get("step", -1))
    except Exception:
        return -1


def _kill_group(proc: subprocess.Popen) -> None:
    try:
        os.killpg(proc.pid, signal.SIGKILL)
    except ProcessLookupError:
        pass
    try:
        proc.wait(timeout=30)
    except subprocess.TimeoutExpired:
        pass


def supervise(name: str, args: list) -> bool:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))

    for attempt in range(1, MAX_ATTEMPTS + 1):
        existing = _run_dir(name)
        cmd = [sys.executable, "-m", "rave_tpu.cli", "train", "--name", name,
               *COMMON, *args]
        if not existing:
            cmd.append("--no_resume")
        log_path = os.path.join(OUT, f"{name}.log.{attempt}")
        print(f"[{name}] attempt {attempt} "
              f"({'resume' if existing else 'fresh'}) -> {log_path}",
              flush=True)
        with open(log_path, "w") as log:
            proc = subprocess.Popen(
                cmd, stdout=log, stderr=subprocess.STDOUT, env=env,
                cwd=REPO, start_new_session=True,
            )
        launched = time.time()
        stale_since = None
        while True:
            rc = proc.poll()
            if rc is not None:
                break
            time.sleep(20)
            run_dir = _run_dir(name)
            mtime = _progress_mtime(run_dir)
            warmed = mtime > launched
            ref = max(mtime, launched)
            limit = WARM_STALL_S if warmed else COLD_STALL_S
            if time.time() - ref > limit:
                stale_since = ref
                print(f"[{name}] stale {time.time() - ref:.0f}s "
                      f"(warmed={warmed}, step={_status_step(run_dir)}) "
                      f"— killing pg {proc.pid}", flush=True)
                _kill_group(proc)
                rc = "stalled"
                break
        if rc == 0:
            print(f"[{name}] done after {attempt} attempt(s)", flush=True)
            return True
        print(f"[{name}] attempt {attempt} ended rc={rc} "
              f"(step={_status_step(_run_dir(name))})", flush=True)
        time.sleep(30)
    print(f"[{name}] FAILED after {MAX_ATTEMPTS} attempts", flush=True)
    return False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of run names to execute, in order")
    a = ap.parse_args()
    os.makedirs(OUT, exist_ok=True)
    todo = [(n, args) for n, args in RUNS
            if a.only is None or n in a.only]
    t0 = time.time()
    ok = True
    for name, args in todo:
        ok = supervise(name, args) and ok
    print(f"campaign {'complete' if ok else 'INCOMPLETE'} "
          f"in {(time.time() - t0) / 60:.1f} min", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    main()
