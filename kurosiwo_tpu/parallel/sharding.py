"""Parameter partition rules for tensor parallelism.

The reference has no parallelism at all (SURVEY.md §2.10); here parameters
can be sharded over the mesh "model" axis with simple, robust rules:

  * Dense/Conv kernels: shard the OUTPUT-features (last) axis over "model"
    when it divides evenly and the tensor is large enough to be worth it —
    XLA/GSPMD then inserts the matching all-gathers/reduce-scatters on ICI;
  * biases / norms / small tensors: replicated.

This is column-wise (megatron-style first-linear) sharding; for the ViT/MAE
stack (dim-1024 encoder) it splits attention heads and MLP hidden across the
axis. Row-wise pairing is left to GSPMD's propagation, which resolves the
obvious contractions.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import MeshPlan


def _spec_for(path: tuple, leaf, num_model: int, min_size: int) -> P:
    if num_model <= 1:
        return P()
    shape = getattr(leaf, "shape", ())
    if len(shape) < 2 or int(np.prod(shape)) < min_size:
        return P()
    out_features = shape[-1]
    if out_features % num_model != 0 or out_features // num_model < 8:
        return P()
    return P(*([None] * (len(shape) - 1) + ["model"]))


def param_shardings(plan: MeshPlan, params: Any, min_size: int = 1 << 16) -> Any:
    """Pytree of NamedShardings matching `params`."""

    def to_sharding(path, leaf):
        return NamedSharding(plan.mesh, _spec_for(path, leaf, plan.num_model, min_size))

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def state_shardings(plan: MeshPlan, state: Any, min_size: int = 1 << 16) -> Any:
    """Shard every array in a TrainState-like pytree with the same rules
    (optimizer moments follow their parameters' layout) — one rule set,
    shared with param_shardings."""
    return param_shardings(plan, state, min_size)


def apply_shardings(tree: Any, shardings: Any) -> Any:
    return jax.tree.map(lambda x, s: jax.device_put(x, s), tree, shardings)
