#!/bin/bash
# Continuation of run_chip_agenda_r4.sh: bench_bf16 already captured
# (logs/chip_r4/bench_bf16.log, 180.8 tiles/s); resume from int8 onward.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/chip_r4
export BENCH_TPU_RETRY_S=120

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 2400 "$@" > "logs/chip_r4/$name.log" 2>&1
  echo "--- exit=$? tail:"
  tail -5 "logs/chip_r4/$name.log"
}

run bench_int8      python bench.py --int8
run bench_wsi       python bench.py --wsi
run train_remat     python scripts/profile_train_r3b.py \
  '[("full",16),("dots",8),("fc1",16),("fc1",8),("mlp_only",16),("mlp_only",8)]'
run attn_variants   python scripts/profile_attn_r4.py
run attn_batchpack  python scripts/profile_attn_r3b.py
run dec_im2col      python scripts/profile_dec_r4.py
echo "agenda done"
