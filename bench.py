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
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: the UNet train step is a ~2-4 min remote
# compile on the axon tunnel (SNUNet ~15 min); one warm run amortizes it
# for every later bench invocation
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp")),
)

BASELINE_PATCHES_PER_SEC = 4000.0


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
    print(
        json.dumps(
            {
                "metric": f"224x224 SAR patches/sec/chip (MAE pretrain step, ViT-L, bf16, batch {batch})",
                "value": round(per_chip, 2),
                "unit": "patches/sec/chip",
                "vs_baseline": round(per_chip / BASELINE_PATCHES_PER_SEC, 4),
            }
        )
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="unet",
                   choices=["unet", "snunet", "vit", "bit-cd", "changeformer"])
    p.add_argument("--batch", type=int, default=0)  # 0 = auto
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--remat", action="store_true", help="gradient checkpointing")
    p.add_argument("--set", action="append", default=[], metavar="KEY=JSONVAL",
                   help="config override(s) for A/B experiments, e.g. --set snunet_save_bn_stats=false")
    p.add_argument("--fused_tail", default=None, choices=["phase", "plane", "off"],
                   help="loss/metrics tail override; default auto = phase-native "
                        "Pallas kernel for unet on one TPU chip (measured +2.4%%)")
    args = p.parse_args()

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
    criterion = create_loss(cfg, mode="train")
    step_fn = make_train_step(model, tx, criterion, cfg, mcfg, task)

    bsh, rep = batch_sharding(plan), replicated(plan)
    jit_step = jax.jit(
        step_fn,
        in_shardings=(rep, bsh, rep, rep, rep),
        out_shardings=(rep, rep, rep),
        donate_argnums=(0,),
    )

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
    print(
        json.dumps(
            {
                "metric": f"224x224 SAR patches/sec/chip (train fwd+bwd, {args.model}, bf16, batch {batch})",
                "value": round(per_chip, 2),
                "unit": "patches/sec/chip",
                "vs_baseline": round(per_chip / BASELINE_PATCHES_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
