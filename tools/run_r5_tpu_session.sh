#!/bin/bash
# Round-5 TPU measurement session (VERDICT tasks 2 + 8): run SERIALLY on
# the chip with no concurrent host load (CLAUDE.md: contention corrupts
# timings up to 3x).  Each section appends to runs/r5_tpu_session.log.
set -u
cd "$(dirname "$0")/.."
LOG=runs/r5_tpu_session.log
mkdir -p runs
echo "=== r5 TPU session $(date -u +%FT%TZ) ===" | tee -a "$LOG"

run() {
  echo "--- $* ---" | tee -a "$LOG"
  timeout "$1" "${@:2}" 2>&1 | grep -vE "^(E0|W0|WARNING)" | tee -a "$LOG"
}

# 1. d_phase=batched vs ref (VERDICT #2a).  ref numbers re-measured in the
#    same session for comparability; batched are fresh compiles (~11 min).
run 2400 python tools/bench_train.py --bf16 --batch 32 --d_phase ref
run 2400 python tools/bench_train.py --bf16 --batch 32 --d_phase batched
run 2400 python tools/bench_train.py --bf16 --batch 64 --remat r1 --d_phase ref
run 2400 python tools/bench_train.py --bf16 --batch 64 --remat r1 --d_phase batched
run 2400 python tools/bench_train.py --bf16 --batch 112 --remat stem,r1 --d_phase ref
run 2400 python tools/bench_train.py --bf16 --batch 112 --remat stem,r1 --d_phase batched

# 2. Pallas attention A/B (VERDICT #2b)
run 2400 python tools/bench_attention.py infer --batch 48 --frames 75
run 2400 python tools/bench_attention.py train --batch 64 --window 40 --remat r1

# 3. scoped-VMEM probe (VERDICT #8): ONE option-ful fresh compile attempt
run 2400 python tools/bench_train.py --bf16 --batch 32 --d_phase batched \
    --compiler_opts xla_tpu_scoped_vmem_limit_kib=65536

echo "=== session done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
