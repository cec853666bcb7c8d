#!/usr/bin/env bash
# Round-5 TPU chain 3 (runs strictly after chain2): re-runs of the two legs
# chain2 surfaced bugs in —
#   * dw_instep: pick_batch_block's VMEM model under-counted Mosaic's scoped
#     footprint (layer3 bb=16 OOM'd by 20 KB); recalibrated to 3*(x+dy)+acc.
#   * ring_flash: f32 tolerance was CPU-calibrated (5e-4) but TPU f32 dots
#     run bf16 multiplies at DEFAULT precision; measured 5.7e-4 — hardware
#     band now 2e-3/5e-3.
# Ends with the exact driver invocation to re-warm whatever cache entries
# the day's code changes touched.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5
mkdir -p "$LOG"
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp

echo "[chain3] waiting for chain2 DONE..." >"$LOG/chain3.log"
for i in $(seq 1 720); do
  grep -q "DONE" "$LOG/chain2.log" 2>/dev/null && break
  sleep 60
done
grep -q "DONE" "$LOG/chain2.log" || echo "[chain3] WARN: chain2 never finished; proceeding" >>"$LOG/chain3.log"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "[chain3] === $name ===" >>"$LOG/chain3.log"
  timeout "$to" "$@" >"$LOG/$name.log" 2>&1
  echo "[chain3] $name rc=$?" >>"$LOG/chain3.log"
  grep -h "^{" "$LOG/$name.log" | tail -12 >>"$LOG/chain3.log"
}

run ring_flash2  1800 python scripts/hw_ring_flash.py
run dw_instep2   3000 env KUROSIWO_PALLAS_DW=1 python bench.py --model unet --batch 128
run dw_ctrl2     2400 python bench.py --model unet --batch 128
run driver_warm  2700 python bench.py
echo "[chain3] DONE" >>"$LOG/chain3.log"
