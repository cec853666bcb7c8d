"""Optimizer factory (optax), mirroring the reference's selection semantics.

Reference behaviors replicated:
  * segmentation trainer: plain Adam(lr) regardless of method config
    (`/root/reference/training/segmentation_trainer.py:35`).
  * CD/recurrent trainers: SGD forced for bit-cd / hfa-net with
    momentum + weight_decay; otherwise adam / adamw(betas, wd) / sgd by
    method config (`/root/reference/training/change_detection_trainer.py:44-66`).
  * MAE: Adam(lr) with lr pre-scaled by the gradient-accumulation factor
    (`/root/reference/training/train_mae.py:159-186`).

The learning rate is injected as a mutable hyperparameter so epoch-level
schedules (stepped once per epoch, like torch lr_scheduler.step()) and
per-iteration schedules (MAE) both work without re-jitting.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def _sgd(lr, momentum, weight_decay):
    tx = optax.chain(
        optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
        optax.sgd(learning_rate=lr, momentum=momentum),
    )
    return tx


def lr_scale_by_path(scales: dict):
    """Per-param-group lr_scale, the torch param_groups mechanism the
    reference MAE schedule supports (`/root/reference/training/train_mae.py:24-31`:
    `param_group["lr"] = lr * param_group["lr_scale"]`).

    `scales` maps a substring pattern -> multiplier; each param whose
    '/'-joined path contains a pattern gets its UPDATE scaled by that factor
    (first match wins; default 1.0). Scaling the final update is exactly
    scaling the group lr: adam's update is linear in lr, and adamw's decoupled
    weight decay term is -lr*wd*param, which torch scales identically.

    Layer-decay finetuning (MAE appendix recipe) is expressed as e.g.
    {f"layers_{i}/": decay**(depth - i) for i in range(depth)}."""
    patterns = list(scales.items())

    def scale_for(path) -> float:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        for pat, s in patterns:
            if pat in name:
                return float(s)
        return 1.0

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        import jax

        scaled = jax.tree_util.tree_map_with_path(lambda p, u: u * scale_for(p), updates)
        return scaled, state

    return optax.GradientTransformation(init, update)


def scale_by_adam_bf16(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """optax.scale_by_adam with the moment buffers STORED in bfloat16.

    Motivation (docs/performance.md, MAE profile): the ViT-L optimizer tail is
    pure HBM traffic — 307M params x 7 f32 tensor passes ~= 13 ms/step at the
    measured 630 GB/s elementwise stream rate, with XLA already at bandwidth.
    Moment dtype is the only lever left: bf16 m/v halve 4 of those passes
    (20 B/param vs 28 B/param) and halve optimizer-state HBM residency.

    All ARITHMETIC stays f32 (moments are upcast, updated, rounded back once
    per step); params remain f32 masters. Accuracy: bf16 rounding of the
    moments is ~0.4% relative noise on a heavily smoothed statistic;
    tests/test_schedules_optim.py checks multi-step parity against torch
    f32 Adam. Opt out with config "optimizer_moment_dtype": "float32"."""
    import jax

    def init(params):
        zeros = lambda p: jnp.zeros(jnp.shape(p), jnp.bfloat16)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(zeros, params),
            nu=jax.tree.map(zeros, params),
        )

    def update(updates, state, params=None):
        del params
        count = state.count + 1
        cf = count.astype(jnp.float32)
        bc1 = 1.0 - b1**cf
        bc2 = 1.0 - b2**cf

        mf = jax.tree.map(
            lambda g, m: b1 * m.astype(jnp.float32) + (1.0 - b1) * g.astype(jnp.float32),
            updates, state.mu,
        )
        vf = jax.tree.map(
            lambda g, v: b2 * v.astype(jnp.float32)
            + (1.0 - b2) * jnp.square(g.astype(jnp.float32)),
            updates, state.nu,
        )
        u = jax.tree.map(lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mf, vf)
        new_state = optax.ScaleByAdamState(
            count=count,
            mu=jax.tree.map(lambda t: t.astype(jnp.bfloat16), mf),
            nu=jax.tree.map(lambda t: t.astype(jnp.bfloat16), vf),
        )
        return u, new_state

    return optax.GradientTransformation(init, update)


def adam_bf16_moments(learning_rate, b1=0.9, b2=0.999, eps=1e-8):
    """optax.adam drop-in with bf16 moment storage (see scale_by_adam_bf16)."""
    return optax.chain(
        scale_by_adam_bf16(b1=b1, b2=b2, eps=eps),
        optax.scale_by_learning_rate(learning_rate),
    )


def resolve_moment_dtype(config: dict, model_config: dict | None, task: str) -> str:
    """Single source of truth for the Adam moment-storage dtype (the train
    step's gradient-handoff dtype must match it — training/mae.py consumes
    this too, so the two can't silently diverge)."""
    return str(
        (model_config or {}).get(
            "optimizer_moment_dtype",
            config.get("optimizer_moment_dtype",
                       "bfloat16" if task == "mae" else "float32"))
    )


# inject_hyperparams with hyperparam_dtype=None derives the stored
# hyperparam dtype from the UPDATES' leaves: a bf16 gradient handoff flips
# every stored hyperparam (learning_rate, b2, eps...) to bf16 after step 1 —
# rounding b2=0.999/eps blew up the bias correction (measured NaN), and the
# changed opt_state aval forces a full retrace of the jitted step at step 2.
# Pinning f32 fixes the mechanism.
_F32_HYPER = dict(hyperparam_dtype=jnp.float32)


def create_optimizer(config: dict, model_config: dict, task: str = "segmentation"):
    """Returns an optax.GradientTransformation with injected 'learning_rate'."""
    lr = float(model_config.get("learning_rate", config.get("learning_rate", 1e-3)))
    lr_scales = model_config.get("lr_scales") or config.get("lr_scales")

    if task in ("segmentation", "mae"):
        # MAE pretraining defaults to bf16 moment storage (ViT-L: ~4 ms/step
        # and 1.2 GB of HBM saved; see scale_by_adam_bf16). f32 opt-out via
        # config. Segmentation/CD keep plain f32 Adam (small params, and the
        # torch-Adam checkpoint-resume parity is exact there).
        moment_dtype = resolve_moment_dtype(config, model_config, task)
        adam = adam_bf16_moments if moment_dtype == "bfloat16" else optax.adam
        if lr_scales:
            return optax.inject_hyperparams(
                lambda learning_rate: optax.chain(
                    adam(learning_rate), lr_scale_by_path(lr_scales)
                ), **_F32_HYPER
            )(learning_rate=lr)
        if adam is optax.adam:
            # direct injection keeps {learning_rate, b1, b2, eps, eps_root}
            # in opt_state.hyperparams — the structure existing f32-Adam
            # checkpoints were saved with
            return optax.inject_hyperparams(optax.adam, **_F32_HYPER)(learning_rate=lr)
        return optax.inject_hyperparams(
            lambda learning_rate: adam(learning_rate), **_F32_HYPER
        )(learning_rate=lr)

    # change detection / recurrent
    method = config.get("method", "")
    if method in ("bit-cd", "hfa-net"):
        mom = float(model_config.get("momentum", 0.9))
        wd = float(model_config.get("weight_decay", 0.0))
        return optax.inject_hyperparams(
            lambda learning_rate: _sgd(learning_rate, mom, wd), **_F32_HYPER
        )(learning_rate=lr)

    opt_name = model_config.get("optimizer", "adam")
    if opt_name == "adam":
        return optax.inject_hyperparams(optax.adam, **_F32_HYPER)(learning_rate=lr)
    if opt_name == "adamw":
        b1, b2 = model_config.get("betas", [0.9, 0.999])
        wd = float(model_config.get("weight_decay", 0.0))
        return optax.inject_hyperparams(
            lambda learning_rate: optax.adamw(learning_rate, b1=b1, b2=b2, weight_decay=wd),
            **_F32_HYPER,
        )(learning_rate=lr)
    if opt_name == "sgd":
        mom = float(model_config.get("momentum", 0.9))
        wd = float(model_config.get("weight_decay", 0.0))
        return optax.inject_hyperparams(
            lambda learning_rate: _sgd(learning_rate, mom, wd), **_F32_HYPER
        )(learning_rate=lr)
    raise NotImplementedError(f"optimizer {opt_name!r} is not supported")


def set_learning_rate(opt_state, lr):
    """Update the injected learning rate in-place in the optimizer state pytree
    (host-side use, e.g. after restoring a checkpoint)."""
    opt_state.hyperparams["learning_rate"] = lr
    return opt_state


def inject_lr(opt_state, lr):
    """Device-side learning-rate injection for use INSIDE a jitted train step.

    The train steps take `lr` as a plain argument and route it into the
    optax.inject_hyperparams state here, so the schedule changes the rate
    without re-jitting and without host-mutating a donated state pytree.
    Returns a new opt_state pytree; the input is untouched.
    """
    if not hasattr(opt_state, "hyperparams"):
        return opt_state
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state._replace(hyperparams=hp)
