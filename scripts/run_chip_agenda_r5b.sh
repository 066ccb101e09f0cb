#!/bin/bash
# Round-5 batch B (after run_chip_agenda_r5.sh):
#  1. int8 regression isolation — r5's int8+staged measured 102.5 tiles/s
#     vs r4b's 195.9 with interleaved emission; run both variants solo to
#     pin the cause before choosing the per-mode default.
#  2. hpb=24 in-model trial (kernel-level -5% in attn_batchpack.log).
#  3. whole-region on-chip datum (VERDICT r4 #9).
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/chip_r5
export BENCH_TPU_RETRY_S=300

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 2400 env "$@" > "logs/chip_r5/$name.log" 2>&1
  echo "--- exit=$? tail:"
  tail -4 "logs/chip_r5/$name.log"
}

run int8_interleaved MIPHEI_ATTN_VARIANT=interleaved python bench.py --int8
run int8_staged      MIPHEI_ATTN_VARIANT=staged      python bench.py --int8
run bf16_hpb24       MIPHEI_ATTN_HPB=24 python bench.py --headline-only
run region_fwd       python scripts/profile_region_r5.py
echo "agenda r5b done"
