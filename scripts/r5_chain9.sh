#!/usr/bin/env bash
# Round-5 TPU chain 9 (after chain8): eval_microbatch sweep for the
# changeformer f32-twin b128 cell — mb=16 landed 436.8 p/s; mb=32/64 halve
# and quarter the scan length (a 64-chunk is known to fit: un-chunked b64
# ran at 543.9). Best point goes in the README table.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5
mkdir -p "$LOG"
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp

echo "[chain9] waiting for chain8 end..." >"$LOG/chain9.log"
for i in $(seq 1 240); do
  # anchored: a bare "DONE" grep also matches chain8's own "waiting for
  # chain7 DONE..." line, which let this chain start concurrently with
  # chain8's last leg in the first run (mb32 leg = lower bound only)
  grep -q "^\[chain8\] DONE" "$LOG/chain8.log" 2>/dev/null && break
  sleep 30
done

run() {
  local name=$1 to=$2; shift 2
  echo "[chain9] === $name ===" >>"$LOG/chain9.log"
  timeout "$to" "$@" >"$LOG/$name.log" 2>&1
  echo "[chain9] $name rc=$?" >>"$LOG/chain9.log"
  grep -h "^{" "$LOG/$name.log" | tail -4 >>"$LOG/chain9.log"
}

run cf_evalf32_mb32 4800 python bench.py --model changeformer --batch 128 --eval --f32_eval --set eval_microbatch=32
run cf_evalf32_mb64 4800 python bench.py --model changeformer --batch 128 --eval --f32_eval --set eval_microbatch=64
echo "[chain9] DONE" >>"$LOG/chain9.log"
