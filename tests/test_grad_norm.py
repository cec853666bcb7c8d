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
