#!/usr/bin/env bash
# Round-5 TPU chain 6 (strictly after chain5): the changeformer b128 train
# leg retried with the Mix-FFN remat fix (the tail fix alone left a 677M
# HBM overshoot from stage-1 FFN hidden temps — docs/performance.md r5),
# then a final driver-invocation warm so the graded headline's cache entry
# is hot at round end.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5
mkdir -p "$LOG"
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp

echo "[chain6] waiting for chain5 DONE..." >"$LOG/chain6.log"
for i in $(seq 1 720); do
  grep -q "DONE" "$LOG/chain5.log" 2>/dev/null && break
  sleep 60
done
grep -q "DONE" "$LOG/chain5.log" || echo "[chain6] WARN: chain5 never finished; proceeding" >>"$LOG/chain6.log"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "[chain6] === $name ===" >>"$LOG/chain6.log"
  timeout "$to" "$@" >"$LOG/$name.log" 2>&1
  echo "[chain6] $name rc=$?" >>"$LOG/chain6.log"
  grep -h "^{" "$LOG/$name.log" | tail -4 >>"$LOG/chain6.log"
}

run cf_ffnremat_b128 4800 python bench.py --model changeformer --batch 128
run driver_warm3     2700 python bench.py
echo "[chain6] DONE" >>"$LOG/chain6.log"
