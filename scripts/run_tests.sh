#!/usr/bin/env bash
# Full test suite in compile-bounded chunks (each < ~6 min on CPU).
# The suite forces an 8-device virtual CPU mesh (tests/conftest.py); the
# compile-heavy model/e2e files must not share a chunk or they exceed
# sensible timeouts.
set -e
cd "$(dirname "$0")/.."

run() { echo ">>> $*"; python -m pytest "$@" -q; }

run tests/test_losses.py tests/test_metrics.py tests/test_pipeline.py \
    tests/test_augment.py tests/test_catalogue.py tests/test_native_decoder.py \
    tests/test_pallas_attention.py tests/test_pallas_conv.py \
    tests/test_convert_parity.py tests/test_schedules_optim.py \
    tests/test_inference.py tests/test_slc.py tests/test_fused_bn.py \
    tests/test_fused_ln.py
run tests/test_models.py tests/test_parallel.py tests/test_ring_attention.py \
    tests/test_phase.py tests/test_pallas_tail.py tests/test_pallas_conv_bn.py \
    tests/test_pallas_dw.py \
    tests/test_grad_norm.py
run tests/test_models_extended.py tests/test_multihost.py tests/test_pallas_bn.py
run tests/test_train_e2e.py   # ~9.5 min: 7 end-to-end trainings
run tests/test_learning.py    # ~8 min: loss-decrease assertions, 4 task engines
run tests/test_diffusion_and_utils.py tests/test_parity_harness.py tests/test_shards.py
run tests/test_resume.py tests/test_bench_robustness.py tests/test_eval_microbatch.py
echo "ALL CHUNKS GREEN"
