"""pjit-compiled train/eval steps, shared by all task engines.

Input assembly parity with the reference trainers:
  * segmentation (`segmentation_trainer.py:109-147`): channel-concat of the
    configured acquisitions (post / post+pre1 / post+pre2 / all three), DEM
    appended first when enabled;
  * cd (`change_detection_trainer.py:117-136`): two separate frames
    [pre_event_X (+DEM), post_event (+DEM)] -> model(x1, x2);
  * recurrent (`recurrent_trainer.py:130-131`): stack to (B, T=3, H, W, C)
    in order (pre2, pre1, post);
  * ChangeFormer multi-scale deep supervision and averaged multi-scale
    inference (`change_detection_trainer.py:138-166`).

Parallelism: steps are jit-compiled with batch inputs sharded over the mesh's
"data" axis and state replicated; the loss is a mean over the global batch, so
GSPMD inserts the gradient all-reduce over ICI — no explicit psum and no
torch-DDP analogue.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..ops.metrics import MetricState, per_sample_confusion
from ..ops.optim import inject_lr
from .state import TrainState


def assemble_segmentation_input(batch: dict, config: dict) -> jnp.ndarray:
    """Channel-concat input assembly (NHWC)."""
    inputs = config["inputs"]
    image = batch["post"]
    if config.get("dem"):
        image = jnp.concatenate([image, batch["dem"]], axis=-1)
    parts = [image]
    in_set = set(inputs)
    if in_set == {"post_event"}:
        pass
    elif in_set == {"pre_event_1", "post_event"}:
        parts.append(batch["pre1"])
    elif in_set == {"pre_event_2", "post_event"}:
        parts.append(batch["pre2"])
    elif in_set == {"pre_event_1", "pre_event_2", "post_event"}:
        parts.append(batch["pre1"])
        parts.append(batch["pre2"])
    else:
        raise ValueError(f'Invalid configuration for "inputs": {inputs}')
    return jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]


def assemble_cd_inputs(batch: dict, config: dict) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Two-frame assembly; each frame optionally concat DEM."""
    inputs = config["inputs"]
    assert len(inputs) == 2, "Change detection requires exactly 2 inputs"
    frames = []
    for name in inputs:
        key = {"pre_event_1": "pre1", "pre_event_2": "pre2", "post_event": "post"}[name]
        f = batch[key]
        if config.get("dem"):
            f = jnp.concatenate([f, batch["dem"]], axis=-1)
        frames.append(f)
    return tuple(frames)


def assemble_recurrent_input(batch: dict, config: dict) -> jnp.ndarray:
    """(B, T, H, W, C) in reference order: (pre_event_2, pre_event_1, post)."""
    frames = [batch["pre2"], batch["pre1"], batch["post"]]
    if config.get("dem"):
        frames = [jnp.concatenate([f, batch["dem"]], axis=-1) for f in frames]
    return jnp.stack(frames, axis=1)


def _forward(model, params, batch_stats, model_inputs, train, rngs=None):
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    kwargs = dict(train=train)
    if train and batch_stats:
        out, mutated = model.apply(
            variables, *model_inputs, mutable=["batch_stats"], rngs=rngs, **kwargs
        )
        return out, mutated.get("batch_stats", batch_stats)
    out = model.apply(variables, *model_inputs, rngs=rngs, **kwargs)
    return out, batch_stats


def _combine_multiscale(outputs, config, model_config, train):
    """ChangeFormer list-output handling (change_detection_trainer.py:138-166)."""
    if not isinstance(outputs, (list, tuple)):
        return outputs, None
    if train:
        return outputs[-1], outputs  # last head for metrics; all for deep supervision
    if model_config.get("multi_scale_infer"):
        from ..ops.nn import resize_nearest

        h, w = outputs[-1].shape[1:3]
        acc = jnp.zeros_like(outputs[-1])
        for o in outputs:
            if o.shape[1:3] != (h, w):
                # integer-factor nearest is broadcast+reshape (ops/nn.py) —
                # jax.image.resize's gather loops are a measured TPU pathology
                o = resize_nearest(o, (h, w))
            acc = acc + o
        return acc / len(outputs), None
    return outputs[-1], None


def make_train_step(
    model,
    tx,
    criterion: Callable,
    config: dict,
    model_config: dict,
    task: str = "segmentation",
    with_grad_norm: bool = False,
    with_watch: bool = False,
):
    """Returns train_step(state, batch, metric_state, lr, rng) -> (state, metrics, aux).
    aux is the scalar loss, or (loss, global_grad_norm) when with_grad_norm —
    the TPU equivalent of the reference's wandb.watch gradient tracking
    (main.py:144), as a norm scalar instead of host-side histograms."""
    # the per-layer watch tree rides on the grad-norm return shape, so watch
    # implies grad_norm (otherwise with_watch=True alone would silently
    # never return the norm tree)
    with_grad_norm = with_grad_norm or with_watch
    assemble = {
        "segmentation": assemble_segmentation_input,
        "cd": assemble_cd_inputs,
        "recurrent": assemble_recurrent_input,
    }[task]
    multi_weights = model_config.get("multi_pred_weights")
    use_multiscale_loss = bool(model_config.get("multi_scale_train"))
    use_augment = bool(config.get("data_augmentations")) and bool(config.get("augmentations"))
    # rematerialization: recompute activations in the backward pass instead of
    # saving them — unlocks larger batches for the dense-decoder models
    # (SNUNet at 224^2 OOMs a 16GB v5e above batch ~48 without it).
    # SNUNet applies remat per nested block inside the model (factory wires
    # config["remat"] there); the whole-forward wrap would force a full
    # recompute and negate the block-level savings.
    use_remat = bool(config.get("remat")) and config.get("method") != "snunet"
    # fused Pallas loss/metrics tail (ops/pallas_tail.py): one pass for the
    # weighted CE + confusion matrix, replacing the one-hot formulations.
    # Auto-default (resolve_fused_tail): the PHASE-native variant for the
    # UNet segmentation step on one TPU chip — it consumes the decoder's
    # phase-space logits in their interleaved lane order and was measured
    # +2.4% end-to-end (3,279 -> 3,357, r3 same-session A/B). The plane-split
    # variant ("fused_tail": true) stays opt-in only: slicing class planes
    # out of phase-layout logits materializes three (B,112,2,112,2)
    # reshapes + copies (~11 ms, 3,266 -> 2,657 — same lesson as
    # ops/pallas_bn.py: opaque consumers of conv outputs force relayouts).
    # CPU runs interpret-mode (tests); "fused_tail": false forces XLA tail.
    from ..ops.pallas_tail import resolve_fused_tail

    # eligibility (CE/3-class/no-multiscale/no-zones/single-device) lives in
    # resolve_fused_tail so the model factory's phase-logits wiring can never
    # disagree with the step's tail choice; an ineligible explicit flag
    # raises there instead of silently feeding phase logits to the XLA tail
    fused_flag = resolve_fused_tail(config, task, model_config)
    from ..ops.backend import is_tpu_backend

    on_tpu = is_tpu_backend()
    use_fused_tail = bool(fused_flag)
    # "phase" variant: the model emits phase-space logits (factory wires
    # return_phase_logits for unet) and the kernel consumes them natively —
    # no interleave in fwd and dlogits stay in phase layout for the head conv
    fused_phase = use_fused_tail and fused_flag == "phase" and task == "segmentation"
    fused_interpret = not on_tpu
    if use_fused_tail:
        # train-mode CE weights (create_loss mode="train" semantics: the
        # weighted/unweighted choice is already folded into class_weights)
        fused_cw = jnp.asarray(config.get("class_weights", [1.0, 1.0, 1.0]), jnp.float32)

    def train_step(state: TrainState, batch: dict, metric_state: MetricState, lr, rng):
        if use_augment:
            from ..data.augment import augment_batch

            rng, aug_rng = jax.random.split(rng)
            batch = augment_batch(aug_rng, batch, config)
        inputs = assemble(batch, config)
        model_inputs = inputs if isinstance(inputs, tuple) else (inputs,)
        mask = batch["mask"]

        def loss_fn(params):
            def fwd(params, *mi):
                return _forward(
                    model, params, state.batch_stats, mi, True, rngs={"dropout": rng, "mask": rng}
                )

            if use_remat:
                fwd = jax.checkpoint(fwd, policy=jax.checkpoint_policies.nothing_saveable)
            out, new_bs = fwd(params, *model_inputs)
            logits, all_heads = _combine_multiscale(out, config, model_config, True)
            if fused_phase and logits.ndim == 4 and logits.shape[-1] == 12:
                from ..ops.pallas_tail import fused_ce_cm_phase

                loss, cm = fused_ce_cm_phase(logits, mask, fused_cw, fused_interpret)
                return loss, (cm, new_bs)
            if use_fused_tail:
                from ..ops.pallas_tail import fused_ce_cm

                loss, cm = fused_ce_cm(logits, mask, fused_cw, fused_interpret)
                return loss, (cm, new_bs)
            if use_multiscale_loss and all_heads is not None and multi_weights is not None:
                h, w = mask.shape[1:3]
                loss = 0.0
                for wgt, head in zip(multi_weights, all_heads):
                    if head.shape[1:3] != (h, w):
                        head = jax.image.resize(
                            head, (head.shape[0], h, w, head.shape[-1]), "bilinear"
                        )
                    loss = loss + wgt * criterion(head, mask)
            else:
                loss = criterion(logits, mask)
            return loss, (logits, new_bs)

        (loss, (aux_out, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        opt_state = inject_lr(state.opt_state, lr)
        updates, new_opt = tx.update(grads, opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        bsz = jnp.asarray(mask.shape[0], jnp.float32)
        if use_fused_tail:
            metric_state = metric_state.update_from_cm(aux_out, loss, bsz)
        else:
            preds = jnp.argmax(aux_out, axis=-1)
            metric_state = metric_state.update(
                preds, mask, loss, bsz,
                clz=batch.get("clz") if config.get("log_zone_metrics") else None,
            )
        new_state = TrainState(
            step=state.step + 1, params=new_params, batch_stats=new_bs, opt_state=new_opt
        )
        if with_grad_norm:
            if with_watch:
                # per-layer gradient norms (wandb.watch telemetry; scalars,
                # negligible device->host traffic)
                norm_tree = jax.tree.map(lambda g: jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32)))), grads)
                return new_state, metric_state, (loss, optax.global_norm(grads), norm_tree)
            return new_state, metric_state, (loss, optax.global_norm(grads))
        return new_state, metric_state, loss

    return train_step


def make_eval_step(
    model,
    criterion: Callable,
    config: dict,
    model_config: dict,
    task: str = "segmentation",
    with_aoi: bool = False,
    with_preds: bool = False,
):
    """with_preds gates the (B, H, W) prediction map out of aux: the engine
    only reads it for the one visualization batch per eval, but a replicated
    out_sharding all-gathers it on EVERY eval step on a mesh (~25 MB/batch
    at b128) — so it is emitted only when a consumer exists.

    config["eval_microbatch"] = M (0/absent = off) runs the eval forward as a
    lax.scan over B//M micro-chunks inside the one jitted step. Eval has no
    remat escape hatch (no backward pass to recompute in), so memory-bound
    eval configs — ChangeFormer's f32 twin at batch 128 keeps five full-res
    deep-supervision heads live and OOMs 16 GB HBM — get a fit knob that
    caps live activations at one chunk. Metric banks are EXACT under
    chunking (confusion-matrix/count accumulation is associative, and
    per-sample aux rows are concatenated back to (B, ...)); only the LOGGED
    eval loss changes definition from batch-pixel-mean to mean of
    chunk-pixel-means (chunks are equal-sized; the difference is the usual
    mean-of-means reweighting across chunks with different valid-pixel
    counts). The reference has no equivalent lever — its eval at this
    config would OOM the same way (change_detection_trainer.py:325 runs
    full batches under no_grad with autocast off)."""
    assemble = {
        "segmentation": assemble_segmentation_input,
        "cd": assemble_cd_inputs,
        "recurrent": assemble_recurrent_input,
    }[task]
    microbatch = int(config.get("eval_microbatch") or 0)

    def eval_step(state: TrainState, batch: dict, metric_state: MetricState):
        inputs = assemble(batch, config)
        model_inputs = inputs if isinstance(inputs, tuple) else (inputs,)
        mask = batch["mask"]
        out, _ = _forward(model, state.params, state.batch_stats, model_inputs, False)
        logits, _ = _combine_multiscale(out, config, model_config, False)
        from ..ops.pallas_tail import resolve_fused_tail

        if (
            resolve_fused_tail(config, task, model_config, strict=False) == "phase"
            and logits.ndim == 4
            and logits.shape[1] * 2 == mask.shape[1]
        ):
            # model emits phase-space logits for the fused train tail;
            # eval interleaves them back for preds/viz (cold path)
            from ..ops.phase import depth_to_space

            logits = depth_to_space(logits)
        # Eval loss is unweighted CE in the reference (create_loss mode="val").
        loss = criterion(logits, mask)
        preds = jnp.argmax(logits, axis=-1)
        # drop padded samples (weight 0) from the banks
        sample_w = batch.get("sample_weight")
        if sample_w is not None:
            mask = jnp.where(sample_w[:, None, None] > 0, mask, 3)
        bsz = jnp.sum(sample_w) if sample_w is not None else jnp.asarray(mask.shape[0], jnp.float32)
        metric_state = metric_state.update(
            preds, mask, loss, bsz, clz=batch.get("clz") if config.get("log_zone_metrics") else None
        )
        aux = {}
        if with_aoi:
            aux["per_sample_cm"] = per_sample_confusion(preds, mask)
        if with_preds:
            aux["preds"] = preds
        return metric_state, loss, aux

    if not microbatch:
        return eval_step

    def chunked_eval_step(state: TrainState, batch: dict, metric_state: MetricState):
        bsz = batch["mask"].shape[0]
        if bsz <= microbatch or bsz % microbatch:
            # trace-time fallback: last ragged eval batch (the loader pads to
            # full batches, but keep the step total for any direct caller)
            return eval_step(state, batch, metric_state)
        n_chunks = bsz // microbatch
        chunks = jax.tree.map(
            lambda v: v.reshape((n_chunks, microbatch) + v.shape[1:]), batch
        )

        def body(ms, chunk):
            ms, loss, aux = eval_step(state, chunk, ms)
            return ms, (loss, aux)

        metric_state, (losses, auxes) = jax.lax.scan(body, metric_state, chunks)
        aux = jax.tree.map(lambda v: v.reshape((bsz,) + v.shape[2:]), auxes)
        return metric_state, jnp.mean(losses), aux

    return chunked_eval_step
