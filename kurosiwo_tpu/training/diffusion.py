"""diffusion-unsup training engine.

Reference status: the model is constructed (model_utilities.py:98-108) and a
checkpoint directory convention exists (utilities.py:31-32), but main.py never
dispatches the task — the reference's diffusion path is unreachable as
shipped. Here it is a working engine: per-observation records (pre1 / pre2 /
flood as independent 2-channel images), jitted DDPM loss step, per-epoch
orbax checkpoints.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import optax

from ..data.pipeline import Loader
from ..models.factory import initialize_segmentation_model
from ..ops import optim
from ..parallel.mesh import batch_sharding, create_mesh, replicated, shard_batch
from .checkpoint import CheckpointManager
from .state import TrainState, create_train_state


def train(configs: dict, model_configs: dict | None = None, seed: int = 999, max_steps=None):
    model_configs = model_configs or {"learning_rate": configs.get("learning_rate", 1e-4)}
    configs = dict(configs, task="diffusion-unsup")
    loader = Loader("train", configs, seed=seed)
    model = initialize_segmentation_model(configs, model_configs)
    tx = optim.create_optimizer(configs, model_configs, "segmentation")
    plan = create_mesh()
    rng = jax.random.PRNGKey(seed)
    size = int(configs.get("synthetic_patch_size", 224))
    state, _ = create_train_state(
        model, tx, rng, (jnp.zeros((2, size, size, 2)),), method_kwargs={"rng": rng}
    )

    def train_step(state: TrainState, batch, rng):
        def loss_fn(params):
            return model.apply({"params": params}, batch["image"], rng=rng)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, new_params, state.batch_stats, new_opt), loss

    bsh, rep = batch_sharding(plan), replicated(plan)
    jit_step = jax.jit(train_step, in_shardings=(rep, bsh, rep), out_shardings=(rep, rep),
                       donate_argnums=(0,))
    ckpt = CheckpointManager(configs.get("checkpoint_path", "checkpoints/diffusion-unsup"))
    steps = 0
    for epoch in range(int(configs.get("epochs", 1))):
        for idx, batch in enumerate(loader):
            rng, k = jax.random.split(rng)
            state, loss = jit_step(state, shard_batch(plan, batch), k)
            steps += 1
            if idx % int(configs.get("print_frequency", 10)) == 0:
                print(f"diffusion epoch {epoch} iter {idx}: loss={float(loss):.5f}")
            if max_steps and steps >= max_steps:
                break
        ckpt.save(f"diffusion_{epoch}", state)
        if max_steps and steps >= max_steps:
            break  # also end the EPOCH loop — a capped smoke run must stop
    ckpt.wait()
    return state
