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
  --val_every 2500 --save_every 10000 --ema 0.999 --seed 0 --no_resume \
  --no_progress --device_data on"

run() {  # run <name> <logfile> <args...>
  local name=$1 log=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ==="
  python -m rave_tpu.cli train --name "$name" $COMMON "$@" \
    > "$OUT/$log" 2>&1
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
