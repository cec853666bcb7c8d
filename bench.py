"""Throughput benchmark — ONE JSON line on stdout.

Metric: 224x224 SAR patches/sec/chip, train fwd+bwd on the primary BASELINE
config (UNet-ResNet18 flood segmentation, 6 input channels = 3 acquisitions
x vv/vh, 3 classes, weighted CE) in bf16. vs_baseline is measured against
the BASELINE.json north-star of 4,000 patches/sec/chip on v5e.

Usage: python bench.py [--model unet|snunet|vit] [--batch N] [--steps N]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import threading
import time

import numpy as np

BASELINE_PATCHES_PER_SEC = 4000.0

# ---------------------------------------------------------------------------
# Tunnel-proofing (round-3 lesson: BENCH_r03 graded rc=1/parsed=null because
# jax.devices() crashed on a transient UNAVAILABLE at t=0; the axon tunnel
# stalls for 10-25 min stretches). Three layers of defense:
#   1. the backend is probed in a SUBPROCESS with a timeout (an in-process
#      jax.devices() on a stalled tunnel HANGS rather than raising — it
#      cannot be retried once wedged), retried with backoff for up to
#      KUROSIWO_BENCH_MAX_WAIT seconds;
#   2. a watchdog thread guarantees ONE parseable JSON line even if the
#      bench wedges mid-run (KUROSIWO_BENCH_DEADLINE seconds);
#   3. any terminal failure emits a JSON error line (value 0) instead of a
#      traceback, so the driver's parse never comes back null.
# `_KUROSIWO_FAKE_OUTAGE=N` makes the first N probe attempts fail (exit 17
# in the probe child) so tests can exercise the retry path without a tunnel.
# ---------------------------------------------------------------------------

_RESULT_PRINTED = threading.Event()
_EMIT_LOCK = threading.Lock()

# updated from args in main() so error lines carry the leg actually being
# run — a failed `--model changeformer` run must NOT emit a 0-valued row
# labeled as the driver-graded unet train headline
_METRIC_LABEL = "224x224 SAR patches/sec/chip (train fwd+bwd, unet, bf16)"


def emit(payload: dict) -> None:
    """Print the one driver-graded JSON line (exactly once per process).

    Atomic check-print-set under a lock: the watchdog's emit_error and the
    main thread's emit can race at the deadline, and the watchdog os._exits
    right after its emit — without the lock that window could end the
    process with zero output lines (the null-parse failure this file
    defends against) or with two."""
    with _EMIT_LOCK:
        if _RESULT_PRINTED.is_set():
            return
        print(json.dumps(payload), flush=True)
        _RESULT_PRINTED.set()


def emit_error(msg: str) -> None:
    emit(
        {
            "metric": _METRIC_LABEL,
            "value": 0.0,
            "unit": "patches/sec/chip",
            "vs_baseline": 0.0,
            "error": msg,
        }
    )


def _start_watchdog() -> None:
    """Start the wedge watchdog. Called AFTER the backend probe succeeds so
    the deadline budgets the bench itself, not the (separately bounded)
    tunnel-stall wait — a 20-min stall plus a cold SNUNet compile must not
    get a healthy run killed."""
    # Sized to worst-case cold compile + one max stall: a cache-wiped SNUNet
    # remote compile is ~15 min and a tunnel stall mid-bench can add 25 min;
    # killing a healthy cold run replaces the graded headline with 0 at
    # rc=0, which is strictly worse than finishing late.
    deadline = float(os.environ.get("KUROSIWO_BENCH_DEADLINE", "4800"))

    def _fire():
        if not _RESULT_PRINTED.wait(timeout=deadline):
            emit_error(f"bench wedged: no result within {deadline:.0f}s (axon tunnel stall?)")
            sys.stdout.flush()
            os._exit(0)

    threading.Thread(target=_fire, daemon=True).start()


_PROBE_CODE = """
import os, sys
n = int(os.environ.get("_KUROSIWO_FAKE_OUTAGE", "0"))
if int(os.environ.get("_KUROSIWO_PROBE_ATTEMPT", "0")) <= n:
    sys.exit(17)  # simulated outage (test hook)
import jax, jax.numpy as jnp
print(len(jax.devices()), flush=True)
x = float(jnp.ones((8, 8)).sum())  # full host round-trip through the tunnel
assert x == 64.0
"""


def wait_for_backend() -> None:
    """Poll a trivial op in a bounded subprocess until the backend answers.

    CLAUDE.md's own prescription ("poll a trivial op until the tunnel
    answers") — now applied to bench.py itself. Raises RuntimeError with a
    summary of attempts on final failure.
    """
    # Default sized to the OBSERVED tunnel-stall distribution, not hope:
    # CLAUDE.md documents 10-25 min stalls and BENCH_r04 died at 20 min into
    # a stall the chain scripts were still (correctly) waiting out at probe
    # 108 (~54 min). The watchdog guarantees one parseable JSON line either
    # way, so patience here is nearly free — only a genuinely dead tunnel
    # pays the full wait.
    max_wait = float(os.environ.get("KUROSIWO_BENCH_MAX_WAIT", "5400"))
    probe_timeout = float(os.environ.get("KUROSIWO_BENCH_PROBE_TIMEOUT", "120"))
    retry_delay = float(os.environ.get("KUROSIWO_BENCH_RETRY_DELAY", "20"))
    deadline = time.monotonic() + max_wait
    attempt = 0
    last_err = "never attempted"
    while True:
        attempt += 1
        env = dict(os.environ)
        env["_KUROSIWO_PROBE_ATTEMPT"] = str(attempt)
        try:
            proc = subprocess.run(
                [sys.executable, "-c", _PROBE_CODE],
                env=env,
                timeout=probe_timeout,
                capture_output=True,
                text=True,
            )
            if proc.returncode == 0:
                return
            last_err = f"probe rc={proc.returncode}: {proc.stderr.strip()[-300:]}"
        except subprocess.TimeoutExpired:
            last_err = f"probe hung >{probe_timeout:.0f}s (backend init stall)"
        if time.monotonic() >= deadline:
            raise RuntimeError(
                f"backend unavailable after {attempt} probes over {max_wait:.0f}s; last: {last_err}"
            )
        print(f"[bench] probe {attempt} failed ({last_err}); retrying...", file=sys.stderr, flush=True)
        time.sleep(min(retry_delay, max(0.0, deadline - time.monotonic())))


def _init_jax():
    """Import jax + set the compilation cache, only after the probe passed."""
    import jax

    # persistent compilation cache: the UNet train step is a ~2-4 min remote
    # compile on the axon tunnel (SNUNet ~15 min); one warm run amortizes it
    # for every later bench invocation
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp")),
    )
    return jax


CD_MODELS = ("snunet", "bit-cd", "changeformer")


def build_config(model: str, batch: int):
    cfg = {
        "task": "cd" if model in CD_MODELS else "segmentation",
        "method": model,
        "num_classes": 3,
        "mixed_precision": True,
        "batch_size": batch,
        "weighted": True,
        "track": "RandomEvents",
        "class_weights": [0.3715753140309927, 14.009780283125977, 8.20405370357821],
        "loss_function": "cross_entropy",
        "inputs": ["pre_event_1", "post_event"] if model in CD_MODELS else ["pre_event_1", "pre_event_2", "post_event"],
        "channels": ["vv", "vh"],
        "dem": False,
        "log_zone_metrics": False,
        "log_AOI_metrics": False,
        "num_channels": 2 if model in CD_MODELS else 6,
    }
    return cfg


def _co_tag(args) -> str:
    """Metric-label suffix for compiler-option A/B legs ('' on the default path)."""
    co = getattr(args, "compiler_options", None)
    return (", " + ",".join(f"{k}={v}" for k, v in co.items())) if co else ""


def bench_mae(args, n_dev: int):
    """FloodViT MAE pretraining step (ViT-L dim1024/depth24, mask 0.75)."""
    import jax
    import jax.numpy as jnp

    from kurosiwo_tpu.models.factory import build_mae
    from kurosiwo_tpu.ops import optim
    from kurosiwo_tpu.parallel.mesh import batch_sharding, create_mesh, replicated, shard_batch
    from kurosiwo_tpu.training.mae import make_mae_train_step
    from kurosiwo_tpu.training.state import create_train_state

    batch = args.batch or 64
    cfg = {"num_channels": 6, "mixed_precision": True}
    mcfg = {"image_size": 224, "patch_size": 16, "dim": 1024, "depth": 24, "heads": 16,
            "mlp_dim": 2048, "decoder_dim": 512, "decoder_depth": 8, "decoder_heads": 16,
            "masked_ratio": 0.75}
    for kv in args.set:  # --set works for the MAE bench too (A/B overrides)
        k, _, v = kv.partition("=")
        try:
            val = json.loads(v)
        except json.JSONDecodeError:
            val = v
        (mcfg if k in mcfg else cfg)[k] = val
    model = build_mae(cfg, mcfg)
    tx = optim.create_optimizer(cfg, {"learning_rate": 1e-4}, task="mae")
    plan = create_mesh()
    rng = jax.random.PRNGKey(0)
    state, _ = create_train_state(model, tx, rng, (jnp.zeros((2, 224, 224, 6), jnp.float32),))
    step = jax.jit(
        make_mae_train_step(model, tx, accum=1),
        in_shardings=(replicated(plan), batch_sharding(plan), replicated(plan), replicated(plan)),
        out_shardings=(replicated(plan), replicated(plan)),
        donate_argnums=(0,),
        compiler_options=getattr(args, "compiler_options", None) or None,
    )
    x = {"image": np.random.RandomState(0).randn(batch, 224, 224, 6).astype(np.float32)}
    db = shard_batch(plan, x)
    lr = jnp.asarray(1e-4, jnp.float32)
    for _ in range(args.warmup):
        state, loss = step(state, db, lr, rng)
    if args.warmup:
        _ = float(loss)  # host fetch: block_until_ready under-blocks on the tunnel
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, loss = step(state, db, lr, rng)
    _ = float(loss)
    dt = time.perf_counter() - t0
    per_chip = args.steps * batch / dt / n_dev
    emit(
        {
            "metric": f"224x224 SAR patches/sec/chip (MAE pretrain step, ViT-L, bf16{_co_tag(args)}, batch {batch})",
            "value": round(per_chip, 2),
            "unit": "patches/sec/chip",
            "vs_baseline": round(per_chip / BASELINE_PATCHES_PER_SEC, 4),
        }
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="unet",
                   choices=["unet", "snunet", "vit", "bit-cd", "changeformer"])
    p.add_argument("--batch", type=int, default=0)  # 0 = auto
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--remat", action="store_true", help="gradient checkpointing")
    p.add_argument("--eval", action="store_true",
                   help="benchmark the no-grad eval step instead of train fwd+bwd")
    p.add_argument("--f32_eval", action="store_true",
                   help="with --eval: run the f32-twin eval step (the engine's "
                        "f32_eval: true config) instead of the bf16 policy")
    p.add_argument("--set", action="append", default=[], metavar="KEY=JSONVAL",
                   help="config override(s) for A/B experiments, e.g. --set snunet_save_bn_stats=false")
    p.add_argument("--compiler_opt", action="append", default=[], metavar="FLAG=VAL",
                   help="per-compile XLA option(s) forwarded via jax.jit(compiler_options=...), "
                        "e.g. --compiler_opt xla_tpu_scoped_vmem_limit_kib=65536. This is the "
                        "ONLY route that works through the axon tunnel: client XLA_FLAGS are "
                        "parsed by the local jaxlib, which fatals on TPU-only flags.")
    p.add_argument("--fused_tail", default=None, choices=["phase", "plane", "off"],
                   help="loss/metrics tail override; default auto = phase-native "
                        "Pallas kernel for unet on one TPU chip (measured +2.4%%)")
    args = p.parse_args()

    global _METRIC_LABEL
    kind = "eval fwd" if args.eval else "train fwd+bwd"
    # dtype tag must match the success-path label: a failed `--eval
    # --f32_eval` leg must not emit a 0-valued row attributable to the
    # bf16 eval leg.
    dtype_tag = "f32-twin" if (args.eval and args.f32_eval) else "bf16"
    # compiler-option A/B legs get their own label so a failed/0 row can never
    # be attributed to the flag-free headline (same rule as the f32-twin tag)
    args.compiler_options = {}
    for kv in args.compiler_opt:
        k, _, v = kv.partition("=")
        args.compiler_options[k] = v
    _METRIC_LABEL = f"224x224 SAR patches/sec/chip ({kind}, {args.model}, {dtype_tag}{_co_tag(args)})"

    try:
        wait_for_backend()
        _start_watchdog()
        _run_bench(args)
    except Exception as e:  # noqa: BLE001 — terminal failures become a JSON line
        emit_error(f"{type(e).__name__}: {e}")


def _run_bench(args):
    jax = _init_jax()
    import jax.numpy as jnp

    from kurosiwo_tpu.models.factory import (
        initialize_cd_model,
        initialize_segmentation_model,
    )
    from kurosiwo_tpu.ops import optim
    from kurosiwo_tpu.ops.losses import create_loss
    from kurosiwo_tpu.ops.metrics import MetricState
    from kurosiwo_tpu.parallel.mesh import batch_sharding, create_mesh, replicated, shard_batch
    from kurosiwo_tpu.training.engine import example_inputs_for_task
    from kurosiwo_tpu.training.state import create_train_state
    from kurosiwo_tpu.training.steps import make_train_step

    n_dev = len(jax.devices())
    if args.model == "vit":
        return bench_mae(args, n_dev)
    batch = args.batch or (128 * n_dev)
    cfg = build_config(args.model, batch)
    if args.fused_tail:
        cfg["fused_tail"] = {"phase": "phase", "plane": True, "off": False}[args.fused_tail]
    if args.remat:
        cfg["remat"] = True
    for kv in args.set:
        k, _, v = kv.partition("=")
        try:
            cfg[k] = json.loads(v)
        except json.JSONDecodeError:
            cfg[k] = v
    task = "cd" if cfg["task"] == "cd" else "segmentation"
    mcfg = {"backbone": "resnet18", "learning_rate": 1e-3, "base_channel": 32, "optimizer": "adam"}

    if task == "cd":
        model = initialize_cd_model(cfg, mcfg)
    else:
        model = initialize_segmentation_model(cfg, mcfg)

    plan = create_mesh()
    tx = optim.create_optimizer(cfg, mcfg, task)
    rng = jax.random.PRNGKey(0)
    state, _ = create_train_state(model, tx, rng, example_inputs_for_task(task, cfg, 2, 224))
    bsh, rep = batch_sharding(plan), replicated(plan)

    rs = np.random.RandomState(0)
    host_batch = {
        "post": rs.randn(batch, 224, 224, 2).astype(np.float32),
        "pre1": rs.randn(batch, 224, 224, 2).astype(np.float32),
        "pre2": rs.randn(batch, 224, 224, 2).astype(np.float32),
        "mask": rs.randint(0, 4, (batch, 224, 224)).astype(np.int32),
        "clz": rs.randint(1, 4, (batch,)).astype(np.int32),
        "activation": np.full((batch,), 130, np.int32),
        "sample_weight": np.ones((batch,), np.float32),
    }
    device_batch = shard_batch(plan, host_batch)
    metric = MetricState.create()

    if args.eval:
        # no-grad eval step, mirroring the engine's construction: default is
        # the f32-twin (reference parity: autocast force-off at eval,
        # segmentation_trainer.py:321) only when --f32_eval is passed; plain
        # --eval measures the bf16-policy eval the engine runs with
        # "f32_eval": false.
        from kurosiwo_tpu.training.steps import make_eval_step

        eval_model = model
        if args.f32_eval and getattr(model, "dtype", None) == jnp.bfloat16:
            import dataclasses

            eval_model = dataclasses.replace(model, dtype=jnp.float32)
        eval_criterion = create_loss(cfg, mode="val")
        jit_eval = jax.jit(
            make_eval_step(eval_model, eval_criterion, cfg, mcfg, task),
            in_shardings=(rep, bsh, rep),
            out_shardings=(rep, rep, rep),
            compiler_options=args.compiler_options or None,
        )
        for _ in range(args.warmup):
            metric, loss, _aux = jit_eval(state, device_batch, metric)
        if args.warmup:
            _ = float(loss)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            metric, loss, _aux = jit_eval(state, device_batch, metric)
        _ = float(loss)
        dt = time.perf_counter() - t0
        per_chip = args.steps * batch / dt / n_dev
        dtype_tag = "f32-twin" if args.f32_eval else "bf16"
        emit(
            {
                "metric": f"224x224 SAR patches/sec/chip (eval fwd, {args.model}, {dtype_tag}{_co_tag(args)}, batch {batch})",
                "value": round(per_chip, 2),
                "unit": "patches/sec/chip",
                "vs_baseline": round(per_chip / BASELINE_PATCHES_PER_SEC, 4),
            }
        )
        return

    criterion = create_loss(cfg, mode="train")
    step_fn = make_train_step(model, tx, criterion, cfg, mcfg, task)

    jit_step = jax.jit(
        step_fn,
        in_shardings=(rep, bsh, rep, rep, rep),
        out_shardings=(rep, rep, rep),
        donate_argnums=(0,),
        compiler_options=args.compiler_options or None,
    )

    lr = jnp.asarray(1e-3, jnp.float32)

    # warmup (compile); a host fetch forces real completion — on the axon
    # tunnel block_until_ready can return before remote execution finishes
    for _ in range(args.warmup):
        state, metric, loss = jit_step(state, device_batch, metric, lr, rng)
    _ = float(loss)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metric, loss = jit_step(state, device_batch, metric, lr, rng)
    _ = float(loss)
    dt = time.perf_counter() - t0

    patches_per_sec = args.steps * batch / dt
    per_chip = patches_per_sec / n_dev
    emit(
        {
            "metric": f"224x224 SAR patches/sec/chip (train fwd+bwd, {args.model}, bf16{_co_tag(args)}, batch {batch})",
            "value": round(per_chip, 2),
            "unit": "patches/sec/chip",
            "vs_baseline": round(per_chip / BASELINE_PATCHES_PER_SEC, 4),
        }
    )


if __name__ == "__main__":
    main()
