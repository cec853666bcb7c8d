"""Diffusion-unsup engine + visualization + profiling utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_ddpm_loss_and_grad():
    from kurosiwo_tpu.models.diffusion import DDPMUnet, GaussianDiffusion

    model = GaussianDiffusion(model=DDPMUnet(dim=8, dim_mults=(1, 2), channels=2), timesteps=10)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 2), jnp.float32)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng}, x, rng=rng)
    loss = model.apply(variables, x, rng=rng)
    assert loss.shape == () and float(loss) > 0
    g = jax.grad(lambda p: model.apply({"params": p}, x, rng=rng))(variables["params"])
    assert np.isfinite(float(jnp.sum(jax.tree.leaves(g)[0])))


def test_ddpm_sampling_shape():
    from kurosiwo_tpu.models.diffusion import DDPMUnet, GaussianDiffusion

    model = GaussianDiffusion(model=DDPMUnet(dim=8, dim_mults=(1, 2), channels=2), timesteps=5)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 16, 16, 2))
    variables = model.init({"params": rng}, x, rng=rng)
    out = model.apply(variables, rng, (1, 16, 16, 2), method=model.sample)
    assert out.shape == (1, 16, 16, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_diffusion_training_e2e(base_config, tmp_path):
    import kurosiwo_tpu.training.diffusion as dtrain

    cfg = dict(
        base_config,
        task="diffusion-unsup",
        batch_size=8,
        synthetic_size=8,  # -> 24 typed records
        synthetic_patch_size=32,
        epochs=1,
        checkpoint_path=str(tmp_path / "diff"),
        print_frequency=100,
    )
    state = dtrain.train(cfg, {"learning_rate": 1e-4}, seed=1, max_steps=2)
    assert int(state.step) >= 1


def test_prediction_triptych():
    from kurosiwo_tpu.utils.visualize import prediction_triptych

    img = np.random.RandomState(0).rand(32, 32, 2).astype(np.float32)
    mask = np.random.RandomState(1).randint(0, 4, (32, 32))
    pred = np.random.RandomState(2).randint(0, 3, (32, 32))
    cfg = {"scale_input": "normalize", "channels": ["vv", "vh"]}
    out = prediction_triptych(img, pred, mask, ([0.1, 0.02], [0.04, 0.02]), cfg)
    assert set(out) == {"image", "ground_truth", "prediction"}
    for v in out.values():
        assert v.shape == (32, 32, 3) and v.dtype == np.uint8
    # overlay changes flood pixels, leaves no-water pixels untouched
    flood = mask == 2
    nowater = mask == 0
    assert not np.array_equal(out["ground_truth"][flood], out["image"][flood])
    np.testing.assert_array_equal(out["ground_truth"][nowater], out["image"][nowater])


def test_step_timer():
    from kurosiwo_tpu.utils.profiling import StepTimer

    t = StepTimer(batch_size=32, num_chips=2)
    t.start()
    t.stop(jnp.asarray(1.0))
    s = t.summary()
    assert s["steps_measured"] == 1
    assert s["patches_per_sec_per_chip"] > 0


def test_model_stats():
    from kurosiwo_tpu.utils.profiling import model_stats

    params = {"a": jnp.zeros((4, 4)), "b": {"c": jnp.zeros((2,))}}
    s = model_stats(params)
    assert s["num_params"] == 18


def test_diffusion_cli_dispatch(monkeypatch, tmp_path):
    """`python main.py --method diffusion` reaches the diffusion engine.

    The reference advertises diffusion-unsup (model built at
    models/model_utilities.py:98-108) but its main.py never dispatches the
    task; ours does. The trainer itself is covered by
    test_diffusion_training_e2e — here we assert only the CLI wiring."""
    import os

    import main as cli

    calls = {}

    def fake_train(configs, model_configs=None, seed=999, max_steps=None):
        calls["task"] = configs["task"]
        calls["method"] = configs["method"]
        calls["seed"] = seed

    import kurosiwo_tpu.training.diffusion as dtrain

    monkeypatch.setattr(dtrain, "train", fake_train)
    repo_configs = os.path.join(os.path.dirname(cli.__file__), "configs")
    monkeypatch.chdir(tmp_path)  # checkpoint dir lands under tmp
    cli.main(["--method", "diffusion", "--config_root", repo_configs, "--seed", "7"])
    assert calls == {"task": "diffusion-unsup", "method": "diffusion", "seed": 7}
