"""wandb.watch-equivalent gradient tracking (reference main.py:144)."""

import jax
import jax.numpy as jnp
import numpy as np


def test_train_step_emits_grad_norm():
    from kurosiwo_tpu.models.factory import initialize_segmentation_model
    from kurosiwo_tpu.ops import optim
    from kurosiwo_tpu.ops.losses import create_loss
    from kurosiwo_tpu.ops.metrics import MetricState
    from kurosiwo_tpu.training.state import create_train_state
    from kurosiwo_tpu.training.steps import make_train_step

    cfg = {
        "task": "segmentation", "method": "unet", "num_classes": 3,
        "mixed_precision": False, "num_channels": 2, "inputs": ["post_event"],
        "weighted": False, "loss_function": "cross_entropy",
        "log_zone_metrics": False, "log_AOI_metrics": False,
    }
    mcfg = {"backbone": "resnet18", "learning_rate": 1e-3, "optimizer": "adam"}
    model = initialize_segmentation_model(cfg, mcfg)
    tx = optim.create_optimizer(cfg, mcfg, "segmentation")
    rng = jax.random.PRNGKey(0)
    state, _ = create_train_state(model, tx, rng, (jnp.zeros((2, 64, 64, 2)),))
    criterion = create_loss(cfg, mode="train")
    step = jax.jit(make_train_step(model, tx, criterion, cfg, mcfg, "segmentation",
                                   with_grad_norm=True))
    rs = np.random.RandomState(0)
    batch = {
        "post": jnp.asarray(rs.randn(2, 64, 64, 2), jnp.float32),
        "mask": jnp.asarray(rs.randint(0, 4, (2, 64, 64)), jnp.int32),
        "sample_weight": jnp.ones((2,), jnp.float32),
    }
    state, metrics, (loss, gnorm) = step(
        state, batch, MetricState.create(), jnp.asarray(1e-3, jnp.float32), rng
    )
    assert float(gnorm) > 0.0 and np.isfinite(float(gnorm))
    assert np.isfinite(float(loss))


def test_watch_plumbing_and_log_watch(base_config, monkeypatch):
    """wandb.watch parity: with_watch plumbs per-layer grad-norm trees out of
    the step, and MetricLogger.log_watch emits parameter histograms +
    per-layer gradient norms to the wandb sink."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from kurosiwo_tpu.data.pipeline import Loader
    from kurosiwo_tpu.models.factory import initialize_segmentation_model
    from kurosiwo_tpu.training.engine import TaskEngine
    from kurosiwo_tpu.utils.logging import MetricLogger

    cfg = dict(base_config, batch_size=8, synthetic_size=8, synthetic_patch_size=64,
               log_grad_norm=True, wandb_watch=True)
    mcfg = {"backbone": "resnet18", "learning_rate": 1e-3, "lr_schedule": None, "optimizer": "adam"}
    tr = Loader("train", cfg, 1)
    engine = TaskEngine(
        initialize_segmentation_model(cfg, mcfg), cfg, mcfg, "segmentation",
        steps_per_epoch=len(tr), seed=1, init_size=64,
    )
    # with_watch requires the wandb flag path; force it on the built engine
    assert engine.with_grad_norm
    # log_watch with a stub wandb sink
    logged = {}

    class FakeWandb:
        class Histogram:
            def __init__(self, arr):
                self.n = len(arr)

        @staticmethod
        def log(payload):
            logged.update(payload)

    logger = MetricLogger({"wandb_activate": False})
    logger.wandb = FakeWandb()
    params = {"layer": {"kernel": jnp.ones((3, 3))}}
    norms = {"layer": {"kernel": jnp.asarray(3.0)}}
    logger.log_watch(params, norms)
    assert "parameters/layer/kernel" in logged
    assert logged["gradients/layer/kernel.norm"] == 3.0
