#!/bin/bash
# Round-4 follow-up agenda: re-runs whose first attempt was invalid.
#   - bench --int8: first run OOM'd HBM (f32 im2col patches; fixed by
#     ops/quant.py::int8_conv3x3's fused-scale formulation).
#   - attention sweeps: first run was contaminated by a concurrent bench
#     process on the same chip (two agenda launches raced); re-measure solo.
#   - attn_batchpack: first run crashed on sys.path (fixed).
# Same discipline as run_chip_agenda_r4.sh: solo on the chip, bounded,
# logged to logs/chip_r4/.
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

run bench_int8_v2    python bench.py --int8
run attn_variants_v2 python scripts/profile_attn_r4.py
run attn_batchpack_v2 python scripts/profile_attn_r3b.py
echo "agenda r4b done"
