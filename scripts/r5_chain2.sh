#!/usr/bin/env bash
# Round-5 TPU chain 2 (runs strictly after chain1 — one process on the
# tunnel at a time). VERDICT r4 items 2/3/4/5:
#   in-step Pallas-dW A/B, ring-flash hardware validation, bit-cd +
#   changeformer b128 bench rows, eval-throughput rows (unet/snunet,
#   bf16 + f32-twin), batch-160 UNet probe.
# Ordered by VERDICT priority: the dW A/B (last lever toward 4,000) runs
# first so a mid-chain tunnel death still lands the highest-value numbers.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5
mkdir -p "$LOG"
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp

echo "[chain2] waiting for chain1 DONE..." >"$LOG/chain2.log"
for i in $(seq 1 720); do
  grep -q "DONE" "$LOG/chain1.log" 2>/dev/null && break
  sleep 60
done
grep -q "DONE" "$LOG/chain1.log" || echo "[chain2] WARN: chain1 never finished; proceeding" >>"$LOG/chain2.log"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "[chain2] === $name ===" >>"$LOG/chain2.log"
  timeout "$to" "$@" >"$LOG/$name.log" 2>&1
  echo "[chain2] $name rc=$?" >>"$LOG/chain2.log"
  grep -h "^{" "$LOG/$name.log" | tail -12 >>"$LOG/chain2.log"
}

run dw_ab        2400 python scripts/bench_dw.py
run dw_instep    2700 env KUROSIWO_PALLAS_DW=1 python bench.py --model unet --batch 128
run dw_ctrl      2400 python bench.py --model unet --batch 128
run ring_flash   1800 python scripts/hw_ring_flash.py
run bitcd_b128   2700 python bench.py --model bit-cd --batch 128
run cf_b128      2700 python bench.py --model changeformer --batch 128
run unet_eval    1800 python bench.py --model unet --batch 128 --eval
run unet_evalf32 1800 python bench.py --model unet --batch 128 --eval --f32_eval
run snunet_eval  2400 python bench.py --model snunet --batch 128 --eval
run snunet_evalf32 2400 python bench.py --model snunet --batch 128 --eval --f32_eval
run unet_b160    2400 python bench.py --model unet --batch 160
echo "[chain2] DONE" >>"$LOG/chain2.log"
