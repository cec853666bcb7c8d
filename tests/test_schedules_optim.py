"""LR schedules and optimizer factory: parity with the reference semantics
(torch CosineAnnealingLR / linear lambda / MAE warmup-cosine, optimizer
selection rules incl. forced SGD for bit-cd/hfa-net)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kurosiwo_tpu.ops import optim, schedules


def test_cosine_matches_torch_formula():
    import torch

    base, tmax = 1e-3, 10
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base)
    sch = torch.optim.lr_scheduler.CosineAnnealingLR(opt, tmax)
    ours = schedules.cosine_annealing(base, tmax)
    for epoch in range(8):
        np.testing.assert_allclose(float(ours(epoch)), sch.get_last_lr()[0], rtol=1e-6)
        opt.step()
        sch.step()


def test_linear_decay_formula():
    s = schedules.linear_decay(1.0, epochs=9)
    np.testing.assert_allclose(float(s(0)), 1.0)
    np.testing.assert_allclose(float(s(5)), 1.0 - 5 / 10)


def test_mae_warmup_cosine():
    s = schedules.mae_warmup_cosine(1e-4, 0.0, warmup_epochs=10, total_epochs=100)
    # linear warmup
    np.testing.assert_allclose(float(s(5.0)), 1e-4 * 0.5, rtol=1e-6)
    # peak at warmup end
    np.testing.assert_allclose(float(s(10.0)), 1e-4, rtol=1e-6)
    # decays after
    assert float(s(60.0)) < 1e-4
    # half-cycle cosine midpoint
    np.testing.assert_allclose(float(s(55.0)), 1e-4 * 0.5, rtol=1e-5)


def test_create_lr_schedule_dispatch():
    cfg = {"epochs": 4}
    assert float(schedules.create_lr_schedule(cfg, {"lr_schedule": None, "learning_rate": 2e-3}, 10)(3)) == pytest.approx(2e-3)
    cos = schedules.create_lr_schedule(cfg, {"lr_schedule": "cosine", "learning_rate": 1e-3}, 10)
    assert float(cos(0)) == pytest.approx(1e-3)
    with pytest.raises(NotImplementedError):
        schedules.create_lr_schedule(cfg, {"lr_schedule": "bogus"}, 10)


def test_optimizer_forced_sgd_for_bit_and_hfa():
    import optax

    for method in ("bit-cd", "hfa-net"):
        cfg = {"method": method}
        mcfg = {"learning_rate": 1e-3, "momentum": 0.9, "weight_decay": 5e-4, "optimizer": "adam"}
        tx = optim.create_optimizer(cfg, mcfg, task="cd")
        state = tx.init({"w": jnp.ones((2, 2))})
        # forced SGD regardless of the config's 'adam': the state must carry a
        # momentum trace, not adam moments
        inner = state.inner_state
        flat = str(inner)
        assert "nu" not in flat  # no adam second moment


def test_optimizer_adamw_betas():
    cfg = {"method": "transunet-cd"}
    mcfg = {"optimizer": "adamw", "learning_rate": 6e-5, "betas": [0.9, 0.009], "weight_decay": 0.01}
    tx = optim.create_optimizer(cfg, mcfg, task="cd")
    state = tx.init({"w": jnp.ones((2, 2))})
    assert state is not None


def test_set_learning_rate_updates():
    cfg = {"method": "unet"}
    tx = optim.create_optimizer(cfg, {"learning_rate": 1e-3}, task="segmentation")
    state = tx.init({"w": jnp.ones((2,))})
    state = optim.set_learning_rate(state, jnp.asarray(5e-4))
    assert float(state.hyperparams["learning_rate"]) == pytest.approx(5e-4)


def test_step_decay():
    s = schedules.step_decay(1.0, epochs=9, gamma=0.1)
    assert float(s(0)) == pytest.approx(1.0)
    assert float(s(3)) == pytest.approx(0.1)
    assert float(s(6)) == pytest.approx(0.01)


def test_inject_lr_drives_update_inside_jit():
    """The train step's lr ARGUMENT must drive the update (VERDICT r1 #9):
    same state, different lr -> proportionally different SGD deltas, with no
    host mutation of the (donated) opt_state."""
    import jax

    cfg = {"method": "unet"}
    tx = optim.create_optimizer(cfg, {"learning_rate": 1e-3}, task="segmentation")
    params = {"w": jnp.ones((4,))}
    opt_state = tx.init(params)
    grads = {"w": jnp.full((4,), 2.0)}

    @jax.jit
    def step(opt_state, lr):
        updates, _ = tx.update(grads, optim.inject_lr(opt_state, lr), params)
        return updates

    u1 = step(opt_state, jnp.asarray(1e-3, jnp.float32))
    u2 = step(opt_state, jnp.asarray(2e-3, jnp.float32))
    # adam normalizes by |g| so the update magnitude equals lr on step 1
    np.testing.assert_allclose(np.asarray(u1["w"]), -1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(u2["w"]), -2e-3, rtol=1e-4)
    # the input state is untouched (inject_lr is functional)
    assert float(opt_state.hyperparams["learning_rate"]) == pytest.approx(1e-3)


def test_lr_scale_groups_mae():
    """Per-param-group lr_scale (reference train_mae.py:24-31): params whose
    path matches a pattern get update = lr * scale, others lr * 1."""
    import jax

    cfg = {"method": "mae"}
    mcfg = {"learning_rate": 1e-3, "lr_scales": {"encoder/": 0.25}}
    tx = optim.create_optimizer(cfg, mcfg, task="mae")
    params = {"encoder": {"w": jnp.ones((4,))}, "head": {"w": jnp.ones((4,))}}
    state = tx.init(params)
    grads = jax.tree.map(lambda p: jnp.full_like(p, 2.0), params)
    updates, _ = tx.update(grads, state, params)
    # adam step-1 magnitude == lr; encoder scaled by 0.25
    np.testing.assert_allclose(np.asarray(updates["head"]["w"]), -1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(updates["encoder"]["w"]), -0.25e-3, rtol=1e-4)
    # inject_lr still reaches the inner adam through the chain
    updates2, _ = tx.update(grads, optim.inject_lr(state, 2e-3), params)
    np.testing.assert_allclose(np.asarray(updates2["head"]["w"]), -2e-3, rtol=1e-4)


def test_adam_bf16_moments_parity_vs_torch():
    """bf16-moment Adam (ops/optim.scale_by_adam_bf16, the MAE-task default)
    tracks torch f32 Adam: after 50 steps on shared gradients, params agree to
    the bf16-moment rounding tolerance. Reference optimizer being matched:
    train_mae.py Adam(lr)."""
    import torch

    from kurosiwo_tpu.ops.optim import adam_bf16_moments

    rs = np.random.RandomState(0)
    p0 = rs.randn(64, 32).astype(np.float32) * 0.1
    grads = [rs.randn(64, 32).astype(np.float32) for _ in range(50)]
    lr = 1e-3

    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    topt = torch.optim.Adam([tp], lr=lr, betas=(0.9, 0.999), eps=1e-8)
    for g in grads:
        topt.zero_grad()
        tp.grad = torch.from_numpy(g)
        topt.step()

    tx = adam_bf16_moments(lr)
    params = {"w": jnp.asarray(p0)}
    state = tx.init(params)

    @jax.jit
    def step(params, state, g):
        u, state = tx.update({"w": g}, state, params)
        return jax.tree.map(lambda p, du: p + du, params, u), state

    for g in grads:
        params, state = step(params, state, jnp.asarray(g))

    ours = np.asarray(params["w"])
    theirs = tp.detach().numpy()
    # bf16 moment rounding: ~0.4% relative noise on a smoothed statistic;
    # after 50 steps of lr=1e-3 updates the params agree to ~1e-4 absolute
    np.testing.assert_allclose(ours, theirs, atol=5e-4)
    # and the moments really are stored in bf16
    leaf = jax.tree.leaves(state)[1]
    assert leaf.dtype == jnp.bfloat16


def test_create_optimizer_mae_defaults_bf16_moments():
    from kurosiwo_tpu.ops import optim

    tx = optim.create_optimizer({"task": "mae"}, {"learning_rate": 1e-4}, task="mae")
    state = tx.init({"w": jnp.zeros((4, 4), jnp.float32)})
    mus = [l for l in jax.tree.leaves(state) if l.dtype == jnp.bfloat16]
    assert len(mus) == 2  # mu and nu
    # segmentation stays f32
    tx2 = optim.create_optimizer({}, {"learning_rate": 1e-4}, task="segmentation")
    state2 = tx2.init({"w": jnp.zeros((4, 4), jnp.float32)})
    assert not [l for l in jax.tree.leaves(state2) if l.dtype == jnp.bfloat16]
    # explicit opt-out
    tx3 = optim.create_optimizer(
        {"optimizer_moment_dtype": "float32"}, {"learning_rate": 1e-4}, task="mae"
    )
    state3 = tx3.init({"w": jnp.zeros((4, 4), jnp.float32)})
    assert not [l for l in jax.tree.leaves(state3) if l.dtype == jnp.bfloat16]


def test_hyperparams_stay_f32_under_bf16_grads():
    """inject_hyperparams must not flip stored hyperparams to bf16 on a bf16
    gradient handoff: the flipped learning_rate leaf changes the opt_state
    aval (full retrace of the jitted step at step 2) and quantizes the lr;
    flipped b2/eps blew up the bias correction (historical NaN)."""
    import jax
    import jax.numpy as jnp

    from kurosiwo_tpu.ops import optim

    cfg = {"learning_rate": 1e-4}
    tx = optim.create_optimizer(cfg, {"learning_rate": 1e-4}, task="mae")
    params = {"w": jnp.ones((8,), jnp.float32)}
    state = tx.init(params)
    grads = {"w": jnp.full((8,), 0.5, jnp.bfloat16)}
    _, new_state = tx.update(grads, state, params)

    def hyper_dtypes(s):
        return {k: getattr(v, "dtype", None) for k, v in s.hyperparams.items()}

    assert all(d == jnp.float32 for d in hyper_dtypes(new_state).values()), hyper_dtypes(new_state)
    # identical avals across steps = no retrace
    assert jax.tree.structure(state) == jax.tree.structure(new_state)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(new_state)):
        assert jnp.asarray(a).dtype == jnp.asarray(b).dtype


def test_resolve_moment_dtype_single_source():
    from kurosiwo_tpu.ops import optim

    assert optim.resolve_moment_dtype({}, None, "mae") == "bfloat16"
    assert optim.resolve_moment_dtype({}, None, "segmentation") == "float32"
    assert optim.resolve_moment_dtype({"optimizer_moment_dtype": "float32"}, None, "mae") == "float32"
    assert optim.resolve_moment_dtype({}, {"optimizer_moment_dtype": "bfloat16"}, "segmentation") == "bfloat16"
