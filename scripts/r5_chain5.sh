#!/usr/bin/env bash
# SUPERSEDED by r5_chain5b.sh — this route is INVALID and the script is kept
# only as the record of the measured dead end (docs/performance.md r5): the
# CLIENT jaxlib parses XLA_FLAGS at startup and fatals on TPU-only flags
# (F parse_flags_from_env: Unknown flag), so no leg below can ever reach the
# remote compiler; bench.py --compiler_opt (jit compiler_options) is the
# working mechanism. Do not run this script.
#
# Round-5 TPU chain 5 (strictly after chain4): scoped-VMEM XLA-flag A/B on
# the UNet b128 headline. xla_tpu_scoped_vmem_limit_kib bounds the VMEM XLA
# may give a single fusion/conv; the v5e default (16 MB) can force smaller
# conv tiles than the 128 MB physical VMEM allows. This is the one compiler
# knob never A/B'd here (docs/performance.md has no XLA-flag entries); it is
# a proto-backed DebugOptions flag, so the axon compile helper forwards it
# per-compile (client XLA_FLAGS only lose for the terminal's own two flags).
# Each leg is a cold compile (flags key the cache) — budget accordingly.
# Control = chain4's driver_warm2 (same session, no flags).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5
mkdir -p "$LOG"
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp

echo "[chain5] waiting for chain4 DONE..." >"$LOG/chain5.log"
for i in $(seq 1 720); do
  grep -q "DONE" "$LOG/chain4.log" 2>/dev/null && break
  sleep 60
done
grep -q "DONE" "$LOG/chain4.log" || echo "[chain5] WARN: chain4 never finished; proceeding" >>"$LOG/chain5.log"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "[chain5] === $name ===" >>"$LOG/chain5.log"
  timeout "$to" "$@" >"$LOG/$name.log" 2>&1
  echo "[chain5] $name rc=$?" >>"$LOG/chain5.log"
  grep -h "^{" "$LOG/$name.log" | tail -4 >>"$LOG/chain5.log"
}

run vmem64_unet 3600 env XLA_FLAGS="--xla_tpu_scoped_vmem_limit_kib=65536" python bench.py --model unet --batch 128
run vmem32_unet 3600 env XLA_FLAGS="--xla_tpu_scoped_vmem_limit_kib=32768" python bench.py --model unet --batch 128
run vmem_ctrl   2400 python bench.py --model unet --batch 128
echo "[chain5] DONE" >>"$LOG/chain5.log"
