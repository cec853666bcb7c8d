"""Preemption-safe resume: the rolling 'latest' checkpoint restores epoch and
best-metric state so a killed run continues where it stopped."""

import numpy as np
import pytest


def test_latest_checkpoint_resume(base_config, tmp_path, capsys):
    from kurosiwo_tpu.data.pipeline import Loader
    from kurosiwo_tpu.models.factory import initialize_segmentation_model
    from kurosiwo_tpu.training.engine import train_task

    cfg = dict(
        base_config,
        batch_size=8,
        synthetic_size=16,
        synthetic_patch_size=64,
        epochs=1,
        print_frequency=1000,
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    mcfg = {"backbone": "resnet18", "learning_rate": 1e-3, "lr_schedule": None, "optimizer": "adam"}
    tr, va, te = Loader("train", cfg, 1), Loader("val", cfg, 1), Loader("test", cfg, 1)
    model = initialize_segmentation_model(cfg, mcfg)

    # epoch 0 runs and writes 'latest' (alternating-slot layout + pointer)
    from kurosiwo_tpu.training.checkpoint import CheckpointManager as _CM

    engine1 = train_task(model, tr, va, te, cfg, mcfg, "segmentation")
    assert _CM(cfg["checkpoint_path"]).has("latest")
    step_after_first = int(np.asarray(engine1.state.step))

    # simulate a restart asking for 2 epochs total: epoch 0 must be skipped
    cfg2 = dict(cfg, epochs=2, resume_checkpoint=True)
    engine2 = train_task(model, tr, va, te, cfg2, mcfg, "segmentation")
    out = capsys.readouterr().out
    assert "Resumed from latest checkpoint at epoch 1" in out
    # exactly one more epoch of steps ran on top of the restored state.
    # engine2.state itself now holds the BEST-val weights (reference-parity
    # final-test semantics), so the step count is read from 'latest'
    from kurosiwo_tpu.training.checkpoint import CheckpointManager

    latest, extra = CheckpointManager(cfg["checkpoint_path"]).restore("latest", engine2.state)
    assert int(np.asarray(latest.step)) == 2 * step_after_first
    assert int(extra["epoch"]) == 1


def test_final_state_is_best_checkpoint(base_config, tmp_path):
    """train_task must hand back the BEST-val weights for the final test eval
    (reference main.py reloads best_segmentation.pt before testing)."""
    import jax
    import numpy as np

    from kurosiwo_tpu.data.pipeline import Loader
    from kurosiwo_tpu.models import initialize_segmentation_model
    from kurosiwo_tpu.training.checkpoint import CheckpointManager
    from kurosiwo_tpu.training.engine import train_task

    cfg = dict(
        base_config,
        batch_size=8,
        synthetic_size=16,
        synthetic_patch_size=64,
        epochs=2,
        print_frequency=1000,
        checkpoint_path=str(tmp_path / "run"),
    )
    mcfg = {"backbone": "resnet18", "learning_rate": 1e-3, "lr_schedule": None, "optimizer": "adam"}
    model = initialize_segmentation_model(cfg, mcfg)
    loaders = [Loader(m, cfg, seed=3) for m in ("train", "val", "test")]
    engine = train_task(model, *loaders, cfg, mcfg, "segmentation")

    ckpt = CheckpointManager(cfg["checkpoint_path"])
    best_state, extra = ckpt.restore("best_segmentation", engine.state)
    for a, b in zip(jax.tree.leaves(engine.state.params), jax.tree.leaves(best_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_evaluate_task_eval_only(base_config, tmp_path):
    """'"test": true' surface: evaluate_task restores best_segmentation
    without training; with no checkpoint it raises instead of scoring a
    random-init model."""
    import jax
    import numpy as np

    from kurosiwo_tpu.data.pipeline import Loader
    from kurosiwo_tpu.models.factory import initialize_segmentation_model
    from kurosiwo_tpu.training.engine import evaluate_task, train_task

    cfg = dict(
        base_config,
        batch_size=8,
        synthetic_size=16,
        synthetic_patch_size=64,
        epochs=1,
        print_frequency=1000,
        checkpoint_path=str(tmp_path / "run"),
    )
    mcfg = {"backbone": "resnet18", "learning_rate": 1e-3, "lr_schedule": None, "optimizer": "adam"}

    with pytest.raises(FileNotFoundError, match="best_segmentation"):
        evaluate_task(initialize_segmentation_model(cfg, mcfg), cfg, mcfg, "segmentation")

    model = initialize_segmentation_model(cfg, mcfg)
    loaders = [Loader(m, cfg, seed=3) for m in ("train", "val", "test")]
    trained = train_task(model, *loaders, cfg, mcfg, "segmentation")
    evaluated = evaluate_task(initialize_segmentation_model(cfg, mcfg), cfg, mcfg, "segmentation")
    for a, b in zip(jax.tree.leaves(trained.state.params), jax.tree.leaves(evaluated.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    _, _, miou, _ = evaluated.run_eval(loaders[2], "Test")
    assert 0.0 <= miou <= 100.0


def test_checkpoint_slots_never_delete_committed_copy(base_config, tmp_path):
    """Preemption safety: overwriting a name must not remove the previously
    committed checkpoint before the replacement commits. With alternating
    slots, the pointer always targets a fully-written directory, and stale
    metadata can't outlive the weights it described."""
    import jax.numpy as jnp

    from kurosiwo_tpu.training.checkpoint import CheckpointManager
    from kurosiwo_tpu.training.state import TrainState

    def mkstate(v):
        return TrainState(step=jnp.asarray(v), params={"w": jnp.full((4,), float(v))},
                          batch_stats={}, opt_state=())

    ckpt = CheckpointManager(tmp_path / "ck")
    ckpt.save("latest", mkstate(1), extra={"epoch": 1})
    ckpt.wait()
    p1 = ckpt._read_ptr("latest")
    assert p1 and (tmp_path / "ck" / p1["slot"]).exists()

    # second save goes to the OTHER slot; the first slot survives until the
    # new one is committed and the pointer flips
    ckpt.save("latest", mkstate(2), extra={"epoch": 2})
    ckpt.wait()
    p2 = ckpt._read_ptr("latest")
    assert p2["slot"] != p1["slot"]
    restored, extra = ckpt.restore("latest", mkstate(0))
    assert int(restored.step) == 2 and extra["epoch"] == 2

    # a save WITHOUT extra must not leak the previous metadata
    ckpt.save("latest", mkstate(3))
    ckpt.wait()
    _, extra3 = ckpt.restore("latest", mkstate(0))
    assert extra3 == {}
