"""End-to-end training on the virtual 8-device CPU mesh: the full
config -> loaders -> model -> pjit train/eval -> checkpoint slice, synthetic
data, tiny shapes. This is the multi-device test story the reference lacks
(SURVEY.md §4)."""

import numpy as np
import pytest

import jax


def _small(cfg, **kw):
    out = dict(cfg)
    out.update(
        batch_size=8,  # divisible by the 8-device data axis
        synthetic_size=16,
        synthetic_patch_size=64,  # tiny patches keep CPU compile fast
        epochs=1,
        print_frequency=1000,
    )
    out.update(kw)
    return out


def test_segmentation_e2e(base_config, tmp_path):
    from kurosiwo_tpu.data.pipeline import Loader
    from kurosiwo_tpu.models.factory import initialize_segmentation_model
    from kurosiwo_tpu.training.segmentation import (
        eval_semantic_segmentation,
        train_semantic_segmentation,
    )

    cfg = _small(base_config, checkpoint_path=str(tmp_path / "ckpt"))
    mcfg = {"backbone": "resnet18", "learning_rate": 1e-3, "lr_schedule": "cosine", "optimizer": "adam"}
    tr, va, te = Loader("train", cfg, 1), Loader("val", cfg, 1), Loader("test", cfg, 1)
    model = initialize_segmentation_model(cfg, mcfg)
    engine = train_semantic_segmentation(model, tr, va, te, cfg, mcfg)
    acc, f1, miou = eval_semantic_segmentation(engine, te, settype="Test")
    assert 0 <= miou <= 100 and 0 <= acc <= 100
    assert (tmp_path / "ckpt" / "best_segmentation.txt").exists()


def test_cd_e2e_snunet(base_config, tmp_path):
    from kurosiwo_tpu.data.pipeline import Loader
    from kurosiwo_tpu.models.factory import initialize_cd_model
    from kurosiwo_tpu.training.change_detection import (
        eval_change_detection,
        train_change_detection,
    )

    cfg = _small(
        base_config,
        task="cd",
        method="snunet",
        inputs=["pre_event_1", "post_event"],
        num_channels=2,
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    mcfg = {"base_channel": 8, "learning_rate": 1e-3, "lr_schedule": None, "optimizer": "adam"}
    tr, va, te = Loader("train", cfg, 1), Loader("val", cfg, 1), Loader("test", cfg, 1)
    model = initialize_cd_model(cfg, mcfg)
    engine = train_change_detection(model, tr, va, te, cfg, mcfg)
    acc, f1, miou = eval_change_detection(engine, te, settype="Test")
    assert 0 <= miou <= 100


def test_recurrent_e2e_convlstm(base_config, tmp_path):
    from kurosiwo_tpu.data.pipeline import Loader
    from kurosiwo_tpu.models.factory import initialize_recurrent_model
    from kurosiwo_tpu.training.recurrent import (
        eval_recurrent_segmentation,
        train_recurrent_segmentation,
    )

    cfg = _small(
        base_config,
        method="convlstm",
        num_channels=2,
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    mcfg = {"learning_rate": 1e-3, "lr_schedule": None, "optimizer": "adam"}
    tr, va, te = Loader("train", cfg, 1), Loader("val", cfg, 1), Loader("test", cfg, 1)
    model = initialize_recurrent_model(cfg, mcfg)
    engine = train_recurrent_segmentation(model, tr, va, te, cfg, mcfg)
    _, _, miou = eval_recurrent_segmentation(engine, te)
    assert 0 <= miou <= 100


def test_mae_e2e(base_config, tmp_path):
    import kurosiwo_tpu.training.mae as mae_training

    cfg = _small(
        base_config,
        task="mae",
        method="mae",
        checkpoint_path=str(tmp_path / "mae"),
        synthetic_size=16,
        num_channels=6,
    )
    mcfg = {
        "image_size": 64, "patch_size": 16, "dim": 64, "depth": 1, "heads": 2,
        "mlp_dim": 64, "decoder_dim": 32, "decoder_depth": 1, "decoder_heads": 2,
        "masked_ratio": 0.75, "accumulate_gradients": 2, "warmup_epochs": 1,
        "learning_rate": 1e-4, "min_lr": 0,
    }
    state = mae_training.train(cfg, seed=1, model_configs=mcfg, max_steps=2)
    assert int(state.step) >= 1


def test_checkpoint_roundtrip(base_config, tmp_path):
    import jax.numpy as jnp

    from kurosiwo_tpu.ops import optim
    from kurosiwo_tpu.models.factory import initialize_segmentation_model
    from kurosiwo_tpu.training.checkpoint import CheckpointManager
    from kurosiwo_tpu.training.state import create_train_state

    cfg = dict(base_config, num_channels=2)
    model = initialize_segmentation_model(cfg, {"backbone": "resnet18"})
    tx = optim.create_optimizer(cfg, {"learning_rate": 1e-3}, "segmentation")
    state, _ = create_train_state(model, tx, jax.random.PRNGKey(0), (jnp.zeros((1, 32, 32, 2)),))
    mgr = CheckpointManager(tmp_path / "ck")
    mgr.save_best(state, epoch=3, metric=55.5)
    mgr.wait()
    restored, extra = mgr.restore("best_segmentation", state)
    assert extra["epoch"] == 3
    l0 = jax.tree.leaves(state.params)[0]
    r0 = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(r0))


def test_changeformer_multiscale_train_e2e(base_config, tmp_path):
    """Deep-supervision training (multi_scale_train) with the weighted
    multi-head loss (change_detection_trainer.py:138-166 parity)."""
    from kurosiwo_tpu.data.pipeline import Loader
    from kurosiwo_tpu.models.factory import initialize_cd_model
    from kurosiwo_tpu.training.change_detection import train_change_detection

    cfg = _small(
        base_config, task="cd", method="changeformer",
        inputs=["pre_event_1", "post_event"], num_channels=2,
        checkpoint_path=str(tmp_path / "ckpt"), synthetic_size=8,
    )
    mcfg = {"embed_dim": 32, "decoder_softmax": False, "learning_rate": 1e-4,
            "lr_schedule": "linear", "optimizer": "sgd", "momentum": 0.9,
            "weight_decay": 0.0, "multi_scale_train": True, "multi_scale_infer": True,
            "multi_pred_weights": [0.5, 0.5, 0.5, 0.8, 1.0]}
    tr, va, te = Loader("train", cfg, 1), Loader("val", cfg, 1), Loader("test", cfg, 1)
    model = initialize_cd_model(cfg, mcfg)
    engine = train_change_detection(model, tr, va, te, cfg, mcfg)
    assert int(np.asarray(engine.state.step)) == len(tr)


def test_finetune_train_e2e(base_config, tmp_path):
    """FloodViT finetune path through the full engine (ViT encoder + mlp head)."""
    from kurosiwo_tpu.data.pipeline import Loader
    from kurosiwo_tpu.models.factory import initialize_segmentation_model
    from kurosiwo_tpu.training.segmentation import train_semantic_segmentation

    cfg = _small(
        base_config, method="finetune", num_channels=6, mlp=True, decoder=False,
        linear_eval=False, image_size=64, finetuning_patch_size=16,
        dim=32, depth=1, heads=2, mlp_dim=64, synthetic_size=8,
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    mcfg = {"learning_rate": 1e-4, "lr_schedule": None, "optimizer": "adam"}
    tr, va, te = Loader("train", cfg, 1), Loader("val", cfg, 1), Loader("test", cfg, 1)
    model = initialize_segmentation_model(cfg, mcfg)
    engine = train_semantic_segmentation(model, tr, va, te, cfg, mcfg)
    assert int(np.asarray(engine.state.step)) == len(tr)
