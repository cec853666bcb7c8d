"""Train state pytree: params (f32), batch_stats, optimizer state, step.

Functional replacement for the reference's (model, optimizer, scaler,
lr_scheduler) object tangle. bf16 autocast is a module dtype policy (no
GradScaler needed on TPU — bf16 has f32-range exponent, so the reference's
torch.cuda.amp loss-scaling machinery, segmentation_trainer.py:45-47, has no
TPU equivalent by design).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any

    def replace(self, **kw) -> "TrainState":
        return dataclasses.replace(self, **kw)


def create_train_state(
    model,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    example_inputs: tuple,
    method_kwargs: dict | None = None,
) -> tuple[TrainState, Any]:
    """Initialize params/batch_stats with a pure init and build opt state."""
    method_kwargs = dict(method_kwargs or {})
    variables = model.init({"params": rng, "dropout": rng, "mask": rng}, *example_inputs, **method_kwargs)
    params = variables.get("params", {})
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)
    return (
        TrainState(step=jnp.zeros((), jnp.int32), params=params, batch_stats=batch_stats, opt_state=opt_state),
        variables,
    )


def num_params(params) -> int:
    from ..utils.profiling import count_params

    return count_params(params)
