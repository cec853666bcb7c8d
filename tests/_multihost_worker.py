"""Worker + shared step-runner for the multi-host tests.

Run as a script by tests/test_multihost.py: one process per "host", each
owning 4 virtual CPU devices, joined by jax.distributed (Gloo collectives).
The same `run_two_steps` is imported by the test for the single-process
reference run — identical code path, so any numeric drift is the
multi-process machinery's fault, not the harness's.
"""

from __future__ import annotations

import sys


BATCH = 16
SIZE = 64  # must be divisible by 32 (UNet's 5-stage encoder)


def _config():
    return {
        "task": "segmentation",
        "method": "unet",
        "num_classes": 3,
        "mixed_precision": False,
        "num_channels": 2,
        "inputs": ["post_event"],
        "channels": ["vv", "vh"],
        "dem": False,
        "weighted": True,
        "class_weights": [0.3716, 14.0098, 8.2041],
        "loss_function": "cross_entropy",
        "log_zone_metrics": False,
        "log_AOI_metrics": False,
        "batch_size": BATCH,
        "synthetic_data": True,
        "synthetic_size": 32,
        "synthetic_patch_size": SIZE,
        "num_workers": 2,
        "oversampling": False,
    }


def run_two_steps(n_steps: int = 2):
    """Build loader + UNet train step on the GLOBAL mesh, run n steps,
    return the per-step losses. Works single- or multi-process."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from kurosiwo_tpu.data.pipeline import Loader
    from kurosiwo_tpu.models.factory import initialize_segmentation_model
    from kurosiwo_tpu.ops import optim
    from kurosiwo_tpu.ops.losses import create_loss
    from kurosiwo_tpu.ops.metrics import MetricState
    from kurosiwo_tpu.parallel.mesh import batch_sharding, create_mesh, replicated, shard_batch
    from kurosiwo_tpu.training.state import create_train_state
    from kurosiwo_tpu.training.steps import make_train_step

    cfg = _config()
    mcfg = {"backbone": "resnet18", "learning_rate": 1e-3, "optimizer": "adam"}
    loader = Loader("train", cfg, seed=5)

    plan = create_mesh()  # 1-axis data mesh over all global devices
    model = initialize_segmentation_model(cfg, mcfg)
    tx = optim.create_optimizer(cfg, mcfg, "segmentation")
    rng = jax.random.PRNGKey(0)
    state, _ = create_train_state(model, tx, rng, (jnp.zeros((2, SIZE, SIZE, 2)),))
    criterion = create_loss(cfg, mode="train")
    step_fn = make_train_step(model, tx, criterion, cfg, mcfg, "segmentation")
    bsh, rep = batch_sharding(plan), replicated(plan)
    jit_step = jax.jit(
        step_fn, in_shardings=(rep, bsh, rep, rep, rep), out_shardings=(rep, rep, rep)
    )

    losses = []
    metric = MetricState.create()
    step_rng = jax.random.PRNGKey(123)  # fixed: augmentations are off
    for i, batch in enumerate(loader):
        db = shard_batch(plan, batch)
        state, metric, loss = jit_step(
            state, db, metric, jnp.asarray(1e-3, jnp.float32), step_rng
        )
        losses.append(float(loss))
        if i + 1 >= n_steps:
            break
    return losses


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    import os

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from kurosiwo_tpu.parallel.distributed import initialize

    pi, pc = initialize(
        {"coordinator_address": f"127.0.0.1:{port}", "num_processes": nproc, "process_id": pid}
    )
    assert (pi, pc) == (pid, nproc), (pi, pc)
    assert len(jax.devices()) == 4 * nproc, len(jax.devices())
    losses = run_two_steps()
    print(f"LOSSES {pid} " + " ".join(f"{v:.9f}" for v in losses), flush=True)


if __name__ == "__main__":
    main()
