"""Learning assertions: each task engine demonstrably *reduces its training
loss* on a tiny synthetic set. Plumbing-only e2e tests (test_train_e2e.py)
would stay green if grads/lr wiring silently broke; these would not.

The synthetic labels are image-independent random blobs, so the guaranteed
learning signal from random init is class-prior fitting plus small-set
memorization — enough for a strict first-epoch vs last-epoch loss decrease
at these step counts (protects reference behavior:
training/segmentation_trainer.py:153-164 loss.backward()/optimizer.step()).
"""

import numpy as np
import pytest


def _cfg(base, **kw):
    out = dict(base)
    out.update(
        batch_size=8,
        synthetic_size=16,
        synthetic_patch_size=64,
        print_frequency=10_000,
    )
    out.update(kw)
    return out


def _epoch_losses(engine, loader, epochs):
    losses = []
    for e in range(epochs):
        losses.append(engine.run_train_epoch(loader, e)["mean_loss"])
    assert np.isfinite(losses).all(), losses
    return losses


def test_segmentation_learns(base_config):
    from kurosiwo_tpu.data.pipeline import Loader
    from kurosiwo_tpu.models.factory import initialize_segmentation_model
    from kurosiwo_tpu.training.engine import TaskEngine

    cfg = _cfg(base_config)
    mcfg = {"backbone": "resnet18", "learning_rate": 1e-3, "lr_schedule": None,
            "optimizer": "adam"}
    tr = Loader("train", cfg, 1)
    engine = TaskEngine(
        initialize_segmentation_model(cfg, mcfg), cfg, mcfg, "segmentation",
        steps_per_epoch=len(tr), seed=1, init_size=64,
    )
    losses = _epoch_losses(engine, tr, epochs=8)
    assert losses[-1] < losses[0], losses


def test_cd_learns(base_config):
    from kurosiwo_tpu.data.pipeline import Loader
    from kurosiwo_tpu.models.factory import initialize_cd_model
    from kurosiwo_tpu.training.engine import TaskEngine

    cfg = _cfg(
        base_config, task="cd", method="siam-diff",
        inputs=["pre_event_1", "post_event"], num_channels=2,
    )
    mcfg = {"learning_rate": 1e-3, "lr_schedule": None, "optimizer": "adam"}
    tr = Loader("train", cfg, 1)
    engine = TaskEngine(
        initialize_cd_model(cfg, mcfg), cfg, mcfg, "cd",
        steps_per_epoch=len(tr), seed=1, init_size=64,
    )
    losses = _epoch_losses(engine, tr, epochs=8)
    assert losses[-1] < losses[0], losses


def test_recurrent_learns(base_config):
    from kurosiwo_tpu.data.pipeline import Loader
    from kurosiwo_tpu.models.factory import initialize_recurrent_model
    from kurosiwo_tpu.training.engine import TaskEngine

    cfg = _cfg(base_config, method="convlstm", num_channels=2)
    mcfg = {"learning_rate": 1e-3, "lr_schedule": None, "optimizer": "adam"}
    tr = Loader("train", cfg, 1)
    engine = TaskEngine(
        initialize_recurrent_model(cfg, mcfg), cfg, mcfg, "recurrent",
        steps_per_epoch=len(tr), seed=1, init_size=64,
    )
    losses = _epoch_losses(engine, tr, epochs=8)
    assert losses[-1] < losses[0], losses


def test_mae_learns(base_config, tmp_path):
    import kurosiwo_tpu.training.mae as mae_training

    cfg = _cfg(
        base_config, task="mae", method="mae", num_channels=6,
        checkpoint_path=str(tmp_path / "mae"), epochs=10,
    )
    mcfg = {
        "image_size": 64, "patch_size": 16, "dim": 64, "depth": 1, "heads": 2,
        "mlp_dim": 64, "decoder_dim": 32, "decoder_depth": 1, "decoder_heads": 2,
        "masked_ratio": 0.75, "accumulate_gradients": 1, "warmup_epochs": 1,
        "learning_rate": 1e-3, "min_lr": 0,
    }
    losses: list[float] = []
    mae_training.train(cfg, seed=1, model_configs=mcfg, max_steps=20,
                       record_losses=losses)
    assert len(losses) >= 12 and np.isfinite(losses).all()
    # MAE regresses masked pixels — genuinely learnable structure even on
    # synthetic data (gamma-noise statistics); compare step windows
    assert np.mean(losses[-4:]) < np.mean(losses[:4]), losses
