#!/bin/bash
# Round-4 on-chip measurement agenda (VERDICT r3 #1-4, #8).
# Run SOLO on the tunneled chip; each step is timeout-bounded and logs to
# logs/chip_r4/. Order: official bench rows first (the round artifact),
# then the experiment sweeps. Tunnel discipline: one TPU client at a time.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/chip_r4

# the agenda only runs when the chip is known reachable: fail fast on a
# probe miss instead of burning bench.py's default 20-min retry budget
# inside the step timeout
export BENCH_TPU_RETRY_S=120

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 2400 "$@" > "logs/chip_r4/$name.log" 2>&1
  echo "--- exit=$? tail:"
  tail -5 "logs/chip_r4/$name.log"
}

run bench_bf16      python bench.py
run bench_int8      python bench.py --int8
run bench_wsi       python bench.py --wsi
run train_remat     python scripts/profile_train_r3b.py \
  '[("full",16),("dots",8),("fc1",16),("fc1",8),("mlp_only",16),("mlp_only",8)]'
run attn_variants   python scripts/profile_attn_r4.py
run attn_batchpack  python scripts/profile_attn_r3b.py
run dec_im2col      python scripts/profile_dec_r4.py
echo "agenda done"
