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


def create_optimizer(config: dict, model_config: dict, task: str = "segmentation"):
    """Returns an optax.GradientTransformation with injected 'learning_rate'."""
    lr = float(model_config.get("learning_rate", config.get("learning_rate", 1e-3)))
    lr_scales = model_config.get("lr_scales") or config.get("lr_scales")

    if task in ("segmentation", "mae"):
        if lr_scales:
            return optax.inject_hyperparams(
                lambda learning_rate: optax.chain(
                    optax.adam(learning_rate), lr_scale_by_path(lr_scales)
                )
            )(learning_rate=lr)
        return optax.inject_hyperparams(optax.adam)(learning_rate=lr)

    # change detection / recurrent
    method = config.get("method", "")
    if method in ("bit-cd", "hfa-net"):
        mom = float(model_config.get("momentum", 0.9))
        wd = float(model_config.get("weight_decay", 0.0))
        return optax.inject_hyperparams(
            lambda learning_rate: _sgd(learning_rate, mom, wd)
        )(learning_rate=lr)

    opt_name = model_config.get("optimizer", "adam")
    if opt_name == "adam":
        return optax.inject_hyperparams(optax.adam)(learning_rate=lr)
    if opt_name == "adamw":
        b1, b2 = model_config.get("betas", [0.9, 0.999])
        wd = float(model_config.get("weight_decay", 0.0))
        return optax.inject_hyperparams(
            lambda learning_rate: optax.adamw(learning_rate, b1=b1, b2=b2, weight_decay=wd)
        )(learning_rate=lr)
    if opt_name == "sgd":
        mom = float(model_config.get("momentum", 0.9))
        wd = float(model_config.get("weight_decay", 0.0))
        return optax.inject_hyperparams(
            lambda learning_rate: _sgd(learning_rate, mom, wd)
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
