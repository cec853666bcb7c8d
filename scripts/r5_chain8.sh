#!/usr/bin/env bash
# Round-5 TPU chain 8 (after chain7): confirm the marginal stem-s2d win
# with a second serialized A/B pair (both programs compile-cached by
# chain7, so each leg is ~1 min). Decision rule: default the fold on for
# TPU only if BOTH pairs show s2d > control.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5
mkdir -p "$LOG"
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp

echo "[chain8] waiting for chain7 DONE..." >"$LOG/chain8.log"
for i in $(seq 1 240); do
  grep -q "DONE" "$LOG/chain7.log" 2>/dev/null && break
  sleep 30
done
grep -q "DONE" "$LOG/chain7.log" || echo "[chain8] WARN: chain7 never finished; proceeding" >>"$LOG/chain8.log"

run() {
  local name=$1 to=$2; shift 2
  echo "[chain8] === $name ===" >>"$LOG/chain8.log"
  timeout "$to" "$@" >"$LOG/$name.log" 2>&1
  echo "[chain8] $name rc=$?" >>"$LOG/chain8.log"
  grep -h "^{" "$LOG/$name.log" | tail -4 >>"$LOG/chain8.log"
}

run stem_s2d_unet_b  2700 env KUROSIWO_STEM_S2D=1 python bench.py
run stem_ctrl_unet_b 2700 python bench.py
echo "[chain8] DONE" >>"$LOG/chain8.log"
