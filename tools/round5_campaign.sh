#!/bin/bash
# Round-5 full-scale training campaign: one TPU chip, sequential.
#
# 1. v2 fp32 vs bf16_all quality A/B (same seed/corpus/geometry, 40k steps,
#    phase switch at 20k) — the gate for making bf16 the recommended mode
#    (VERDICT r4 item 3).
# 2. discrete at scale (codebook health over time, VERDICT r4 item 4).
# 3. v3 at scale (packed descript critics throughput trajectory).
#
# Corpus: /tmp/db_full — 142 pieces / 2.28 h 44.1 kHz (tools/synth_corpus.py),
# the same preprocessed ARS db as the committed 120k-step round-4 run.
set -e
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
DB=/tmp/db_full
OUT=/tmp/runs_r5
mkdir -p "$OUT"

COMMON="--db_path $DB --out_path $OUT --batch 8 --n_signal 131072 \
  --val_every 2500 --save_every 10000 --ema 0.999 --seed 0 \
  --no_progress --device_data on"

run() {  # run <name> <logfile> <args...>
  local name=$1 log=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ==="
  # the remote TPU relay occasionally drops a compile mid-flight
  # ("response body closed"); resume-retry up to 3 times — checkpoints
  # make each retry pick up where the last attempt died
  local attempt rc
  for attempt in 1 2 3; do
    rc=0
    python -m rave_tpu.cli train --name "$name" \
      $COMMON $([ "$attempt" -eq 1 ] && echo --no_resume) "$@" \
      > "$OUT/$log.$attempt" 2>&1 || rc=$?
    [ $rc -eq 0 ] && break
    echo "--- $name attempt $attempt failed rc=$rc, retrying"
    sleep 30
  done
  cat "$OUT/$log".* > "$OUT/$log" 2>/dev/null || true
  [ $rc -eq 0 ] || { echo "=== $name FAILED after retries ==="; return $rc; }
  echo "=== $name done  $(date -u +%H:%M:%S) ==="
}

run ab_fp32 ab_fp32.log --config v2 \
  --override train.phase_1_duration=20000 --max_steps 40000

run ab_bf16 ab_bf16.log --config v2 \
  --override train.phase_1_duration=20000 \
  --override train.bf16=true --override train.bf16_dis=true \
  --max_steps 40000

run full_discrete discrete.log --config discrete \
  --override train.phase_1_duration=20000 --max_steps 40000

run full_v3 v3.log --config v3 \
  --override train.phase_1_duration=20000 --max_steps 40000

echo "=== campaign complete $(date -u +%H:%M:%S) ==="
