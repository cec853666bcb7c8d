"""MAE (FloodViT) self-supervised pretraining engine.

Reference: /root/reference/training/train_mae.py:40-232. Parity points:
  * lr scaled by the gradient-accumulation factor (train_mae.py:159-165);
  * per-iteration warmup + half-cycle cosine schedule on fractional epochs;
  * gradient accumulation — here folded INSIDE the jitted step as a
    lax.scan over microbatches (one optimizer update per scan, identical
    math to the reference's .backward() accumulation, no host round-trips);
  * per-epoch checkpoints mae_{e} (full) and vit_{e} (encoder subtree).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import optax

from ..config import load_json5
from ..data.ssl import SSLLoader
from ..models.factory import build_mae
from ..ops import optim
from ..ops.schedules import mae_warmup_cosine
from ..parallel.mesh import batch_sharding, create_mesh, replicated, shard_batch
from .checkpoint import CheckpointManager
from .state import TrainState, create_train_state


def make_mae_train_step(model, tx, accum: int, bf16_grads: bool = True):
    def train_step(state: TrainState, batch, lr, rng):
        images = batch["image"]
        b = images.shape[0]
        micro = b // accum
        micro_batches = images[: accum * micro].reshape((accum, micro) + images.shape[1:])
        rngs = jax.random.split(rng, accum)

        def loss_for(params, imgs, r):
            return model.apply({"params": params}, imgs, rngs={"mask": r, "dropout": r})

        if accum == 1:
            # no-accumulation fast path: the scan formulation would carry a
            # full 307M-param zero-grad pytree (zeros write + add + carry
            # copy = ~5 GB of pure HBM traffic per step on ViT-L f32)
            loss_sum, grads = jax.value_and_grad(loss_for)(state.params, micro_batches[0], rngs[0])
        else:

            def scan_body(carry, xs):
                grads_acc, loss_acc = carry
                imgs, r = xs
                loss, grads = jax.value_and_grad(loss_for)(state.params, imgs, r)
                grads_acc = jax.tree.map(lambda a, g: a + g, grads_acc, grads)
                return (grads_acc, loss_acc + loss), None

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            (grads, loss_sum), _ = jax.lax.scan(
                scan_body, (zero_grads, jnp.zeros((), jnp.float32)), (micro_batches, rngs)
            )
        # bf16 gradient handoff to the optimizer: the 307M-param f32 gradient
        # costs ~2 full HBM passes between backward and optimizer; bf16
        # halves them. Arithmetic inside scale_by_adam_bf16 upcasts to f32,
        # and the accumulation above stays f32 (scan carry) — only the final
        # handoff is rounded (same tolerance class as the bf16 moments;
        # covered by test_schedules_optim torch-parity).
        gdt = jnp.bfloat16 if bf16_grads else jnp.float32
        grads = jax.tree.map(lambda g: (g / accum).astype(gdt), grads)
        updates, new_opt = tx.update(grads, optim.inject_lr(state.opt_state, lr), state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(step=state.step + 1, params=new_params, batch_stats=state.batch_stats, opt_state=new_opt),
            loss_sum / accum,
        )

    return train_step


def train(configs: dict, seed: int = 999, model_configs: dict | None = None, max_steps: int | None = None,
          record_losses: list | None = None):
    """Entry mirroring training.train_mae.train(configs).

    `record_losses`: optional list the per-step loss floats are appended to
    (used by the learning-assertion tests; None in production = no host sync
    beyond print_frequency)."""
    if model_configs is None:
        model_configs = load_json5("configs/method/mae/mae.json")
    configs = {**configs, **model_configs}
    accum = int(configs.get("accumulate_gradients", 1))
    # reference: lr scaled by accumulation factor
    configs["lr"] = float(configs["learning_rate"]) * accum

    loader = SSLLoader(configs, seed=seed)
    model = build_mae(configs, configs)

    tx = optim.create_optimizer(configs, {"learning_rate": configs["lr"]}, task="mae")
    plan = create_mesh()
    rng = jax.random.PRNGKey(seed)
    example = (jnp.zeros((2, configs.get("image_size", 224), configs.get("image_size", 224), configs["num_channels"]), jnp.float32),)
    state, _ = create_train_state(model, tx, rng, example)

    schedule = mae_warmup_cosine(
        configs["lr"], float(configs.get("min_lr", 0.0)), float(configs.get("warmup_epochs", 10)), float(configs.get("epochs", 1))
    )
    step_fn = jax.jit(
        make_mae_train_step(model, tx, accum,
                            bf16_grads=optim.resolve_moment_dtype(configs, None, "mae") == "bfloat16"),
        in_shardings=(replicated(plan), batch_sharding(plan), replicated(plan), replicated(plan)),
        out_shardings=(replicated(plan), replicated(plan)),
        donate_argnums=(0,),
    )

    ckpt = CheckpointManager(configs.get("checkpoint_path", "checkpoints/mae"))
    steps_per_epoch = max(len(loader), 1)
    total_steps = 0
    for epoch in range(int(configs.get("epochs", 1))):
        t0 = time.time()
        data_time = 0.0
        t_data = time.time()
        for idx, batch in enumerate(loader):
            data_time += time.time() - t_data
            # per-iteration schedule; the step consumes lr via optim.inject_lr
            lr_value = float(schedule(idx / steps_per_epoch + epoch))
            rng, step_rng = jax.random.split(rng)
            state, loss = step_fn(state, shard_batch(plan, batch), jnp.asarray(lr_value, jnp.float32), step_rng)
            total_steps += 1
            if record_losses is not None:
                record_losses.append(float(loss))
            if idx % int(configs.get("print_frequency", 10)) == 0:
                print(f"MAE epoch {epoch} iter {idx}: loss={float(loss):.5f} lr={lr_value:.3e}")
            if max_steps is not None and total_steps >= max_steps:
                break
            t_data = time.time()
        print(f"MAE epoch {epoch}: {time.time() - t0:.1f}s (data {data_time:.1f}s)")
        if max_steps is not None and total_steps >= max_steps:
            # a capped smoke run must also end the EPOCH loop (the inner
            # break alone would run one extra step + save per epoch)
            ckpt.save(f"mae_{epoch}", state)
            break
        ckpt.save(f"mae_{epoch}", state)
        # encoder-only save (reference's vit_{e}.pt whole-encoder save)
        enc_state = TrainState(
            step=state.step, params=state.params.get("encoder", state.params), batch_stats={}, opt_state=()
        )
        ckpt.save(f"vit_{epoch}", enc_state)
    ckpt.wait()
    return state
