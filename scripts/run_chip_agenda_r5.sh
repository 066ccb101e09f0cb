#!/bin/bash
# Round-5 solo re-measure: staged attention default, rebuilt WSI stitcher
# (ring buffer + device window + uint8 fetch). Requires an otherwise idle
# chip AND host (the r4b --wsi row was contaminated by concurrent ad-hoc
# jax processes that silently attached to the TPU — see
# memory/axon-cpu-override-pitfall).
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/chip_r5
export BENCH_TPU_RETRY_S=120

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 2400 "$@" > "logs/chip_r5/$name.log" 2>&1
  echo "--- exit=$? tail:"
  tail -5 "logs/chip_r5/$name.log"
}

run bench_bf16_staged python bench.py
run bench_int8_staged python bench.py --int8
run bench_wsi_r5      python bench.py --wsi
echo "agenda r5 done"
