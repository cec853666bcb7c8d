"""Profile the train step: capture a jax.profiler trace and print the top
HLO ops/fusions by accumulated device time.

The reference has no profiler story (SURVEY.md §5.1); this is the TPU-native
hot-spot tool used to drive the optimization log in docs/performance.md.

Usage: python scripts/profile_step.py [--model unet|snunet] [--batch N]
       [--steps N] [--top K] [--dump-dir DIR]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(args, log_dir: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_config
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
        return _capture_mae(args, log_dir)
    batch = args.batch or (128 * n_dev)
    cfg = build_config(args.model, batch)
    if args.remat:
        cfg["remat"] = True
    task = "cd" if cfg["task"] == "cd" else "segmentation"
    mcfg = {"backbone": "resnet18", "learning_rate": 1e-3, "base_channel": 32, "optimizer": "adam"}
    model = initialize_cd_model(cfg, mcfg) if task == "cd" else initialize_segmentation_model(cfg, mcfg)

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
    for _ in range(3):
        state, metric, loss = jit_step(state, device_batch, metric, lr, rng)
    _ = float(loss)
    jax.profiler.start_trace(log_dir)
    for _ in range(args.steps):
        state, metric, loss = jit_step(state, device_batch, metric, lr, rng)
    _ = float(loss)
    jax.profiler.stop_trace()


def _capture_mae(args, log_dir: str) -> None:
    """Profile the FloodViT MAE pretrain step (mirrors bench.bench_mae)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

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
    for _ in range(3):
        state, loss = step(state, db, lr, rng)
    _ = float(loss)
    jax.profiler.start_trace(log_dir)
    for _ in range(args.steps):
        state, loss = step(state, db, lr, rng)
    _ = float(loss)
    jax.profiler.stop_trace()


def parse_xplane(log_dir: str, top: int, steps: int):
    """Aggregate device-plane op durations from the newest .xplane.pb."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    paths = sorted(glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"), recursive=True),
                   key=os.path.getmtime)
    if not paths:
        raise SystemExit(f"no xplane.pb under {log_dir}")
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    per_op = collections.Counter()
    per_kind = collections.Counter()
    total_ps = 0
    for plane in xspace.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                name = meta[ev.metadata_id].name
                kind = name.lstrip("%").split(".")[0].split(" ")[0]
                # async '*-start' events span their whole in-flight window
                # (overlapped with compute) — not real busy time; the '-done'
                # op carries the blocking remainder.
                if kind.endswith("-start"):
                    continue
                per_op[name] += ev.duration_ps
                per_kind[kind] += ev.duration_ps
                total_ps += ev.duration_ps
    if not per_op:
        raise SystemExit("no 'XLA Ops' line found on a TPU plane — trace empty?")
    print(f"busy device op time (async-start excluded): {total_ps / 1e12 * 1e3:.2f} ms "
          f"over {steps} steps ({total_ps / 1e12 * 1e3 / steps:.2f} ms/step)")
    print(f"\n{'kind':<28} {'ms/step':>9} {'%':>6}")
    for kind, ps in per_kind.most_common(15):
        print(f"{kind:<28} {ps / 1e12 * 1e3 / steps:>9.3f} {100 * ps / total_ps:>6.2f}")
    print(f"\n{'op':<86} {'ms/step':>9} {'%':>6}")
    for name, ps in per_op.most_common(top):
        print(f"{name[:86]:<86} {ps / 1e12 * 1e3 / steps:>9.3f} {100 * ps / total_ps:>6.2f}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="unet", choices=["unet", "snunet", "vit"])
    p.add_argument("--batch", type=int, default=0)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--dump-dir", default="/tmp/kurosiwo_profile")
    p.add_argument("--parse-only", action="store_true")
    args = p.parse_args()
    if not args.parse_only:
        capture(args, args.dump_dir)
    parse_xplane(args.dump_dir, args.top, args.steps)


if __name__ == "__main__":
    main()
