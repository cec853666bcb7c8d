#!/usr/bin/env bash
# Round-5 TPU chain 1 (serialized; one process on the tunnel at a time):
#   1. poll a trivial op until the axon tunnel answers
#   2. driver-condition bench: `python bench.py` EXACT default invocation
#      (warms the compile cache for the driver's end-of-round run)
#   3. /verify CLI drive: main.py unet b32 synthetic e2e on the real chip
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5
mkdir -p "$LOG"
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp

echo "[chain1] polling tunnel..." >"$LOG/chain1.log"
for i in $(seq 1 200); do
  if timeout 120 python -c "import jax, jax.numpy as jnp; assert float(jnp.ones((8,8)).sum())==64.0; print('tunnel OK')" >>"$LOG/chain1.log" 2>&1; then
    echo "[chain1] tunnel answered after attempt $i" >>"$LOG/chain1.log"
    break
  fi
  echo "[chain1] probe $i failed; sleeping 30s" >>"$LOG/chain1.log"
  sleep 30
done

echo "[chain1] === bench: exact driver default invocation ===" >>"$LOG/chain1.log"
timeout 2700 python bench.py >"$LOG/bench_default.log" 2>&1
echo "[chain1] bench rc=$?" >>"$LOG/chain1.log"
tail -1 "$LOG/bench_default.log" >>"$LOG/chain1.log"

echo "[chain1] === verify: main.py unet b32 ===" >>"$LOG/chain1.log"
timeout 1200 python main.py --method=unet --backbone=resnet18 --batch_size=32 --seed 7 \
  >"$LOG/verify_cli.log" 2>&1
echo "[chain1] verify rc=$?" >>"$LOG/chain1.log"
echo "[chain1] DONE" >>"$LOG/chain1.log"
