#!/usr/bin/env bash
# Round-5 TPU chain 5b: scoped-VMEM A/B, take 2. Chain 5's XLA_FLAGS route is
# dead on arrival: the CLIENT jaxlib parses XLA_FLAGS at startup and fatals on
# TPU-only flags (F parse_flags_from_env: Unknown flag) before anything reaches
# the remote compiler. The working route is jax.jit(compiler_options=...),
# which rides the PJRT compile request to the backend that actually owns the
# flag — bench.py --compiler_opt threads it through both jit sites and tags
# the metric label so these rows can never be confused with the headline.
# Also retries the changeformer f32-twin eval at batch 64 (b128 OOMed:
# RESOURCE_EXHAUSTED, /tmp/r5/cf_evalf32.log).
# Each vmem leg is a cold compile (compiler options key the cache).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5
mkdir -p "$LOG"
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "[chain5b] === $name ===" >>"$LOG/chain5b.log"
  timeout "$to" "$@" >"$LOG/$name.log" 2>&1
  echo "[chain5b] $name rc=$?" >>"$LOG/chain5b.log"
  grep -h "^{" "$LOG/$name.log" | tail -4 >>"$LOG/chain5b.log"
}

echo "[chain5b] start $(date -u +%H:%M:%S)" >"$LOG/chain5b.log"
run cf_evalf32_b64 3600 python bench.py --model changeformer --eval --f32_eval --batch 64
run vmem64b_unet 4200 python bench.py --model unet --batch 128 --compiler_opt xla_tpu_scoped_vmem_limit_kib=65536
run vmem32b_unet 4200 python bench.py --model unet --batch 128 --compiler_opt xla_tpu_scoped_vmem_limit_kib=32768
run vmem_ctrl 2400 python bench.py --model unet --batch 128
echo "[chain5b] DONE" >>"$LOG/chain5b.log"
