"""Shared epoch-loop engine for segmentation / cd / recurrent training.

The reference's three trainers (segmentation_trainer.py, cd_trainer.py,
recurrent_trainer.py, ~2,500 LoC combined) share one skeleton: epoch loop ->
per-batch fwd/bwd -> torchmetrics updates -> per-epoch val eval -> best-mIoU
checkpoint -> final test eval. Here that skeleton exists once; the task
engines differ only in input assembly (steps.py) and optimizer selection
(ops/optim.py).

Mesh-first: ONE jitted train step and ONE eval step, compiled with the batch
sharded over the mesh "data" axis and state replicated; metrics accumulate on
device and cross the host boundary once per epoch.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data.pipeline import Loader
from ..ops import optim
from ..ops.losses import create_loss
from ..ops.metrics import HostAOIMetrics, MetricState
from ..ops.schedules import create_lr_schedule
from ..parallel.mesh import MeshPlan, batch_sharding, create_mesh, replicated, shard_batch
from ..utils.logging import MetricLogger
from .checkpoint import CheckpointManager
from .state import TrainState, create_train_state
from .steps import make_eval_step, make_train_step


def device_prefetch(loader, plan: MeshPlan, depth: int = 2):
    """Iterate device-resident batches, transferring batch k+1 while batch k
    computes (jax device_put is async; holding `depth` batches in flight
    overlaps H2D with the step). The reference's pin_memory+workers only
    overlaps decode, not the transfer."""
    import collections

    queue: collections.deque = collections.deque()
    it = iter(loader)
    try:
        for _ in range(depth):
            queue.append(shard_batch(plan, next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(shard_batch(plan, next(it)))
        except StopIteration:
            pass
        yield out


def example_inputs_for_task(task: str, config: dict, batch_size: int = 2, size: int = 224):
    """Tiny abstract inputs for model.init, matching the task's assembly."""
    nch = config["num_channels"]
    if task == "cd":
        x = jnp.zeros((batch_size, size, size, nch), jnp.float32)
        return (x, x)
    if task == "recurrent":
        return (jnp.zeros((batch_size, 3, size, size, nch), jnp.float32),)
    return (jnp.zeros((batch_size, size, size, nch), jnp.float32),)


class TaskEngine:
    """Owns model/state/steps for one task; used by the 3 trainer frontends."""

    def __init__(
        self,
        model,
        config: dict,
        model_config: dict,
        task: str,
        steps_per_epoch: int,
        mesh_plan: MeshPlan | None = None,
        seed: int = 999,
        init_size: int = 224,
    ):
        self.model = model
        self.config = config
        self.model_config = model_config
        self.task = task
        self.plan = mesh_plan or create_mesh()
        self.logger = MetricLogger(config)

        opt_task = "segmentation" if task in ("segmentation", "recurrent") else "cd"
        # reference quirk: seg/recurrent trainers always use plain Adam
        self.tx = optim.create_optimizer(config, model_config, opt_task)
        self.lr_schedule = create_lr_schedule(config, model_config, steps_per_epoch)

        rng = jax.random.PRNGKey(seed)
        self.state, _ = create_train_state(
            self.model, self.tx, rng, example_inputs_for_task(task, config, size=init_size)
        )
        self.rng = rng
        self._load_pretrained_weights()

        train_criterion = create_loss(config, mode="train")
        eval_criterion = create_loss(config, mode="val")
        with_aoi = bool(config.get("log_AOI_metrics"))
        # wandb.watch-equivalent gradient tracking (reference main.py:144)
        self.with_grad_norm = bool(config.get("wandb_activate") or config.get("log_grad_norm"))
        # wandb.watch parity (main.py:144): per-layer parameter histograms +
        # per-layer gradient norms every print_frequency steps
        self.with_watch = bool(config.get("wandb_activate")) and bool(
            config.get("wandb_watch", True)
        )
        self._train_step_fn = make_train_step(
            self.model, self.tx, train_criterion, config, model_config, task,
            with_grad_norm=self.with_grad_norm, with_watch=self.with_watch,
        )
        # eval in f32 like the reference (autocast force-off at eval,
        # segmentation_trainer.py:321): same f32 params, f32 compute twin.
        # Disable with f32_eval: false to eval under the bf16 policy.
        eval_model = self.model
        if config.get("f32_eval", True) and getattr(self.model, "dtype", None) == jnp.bfloat16:
            import dataclasses

            eval_model = dataclasses.replace(self.model, dtype=jnp.float32)
        self.viz_enabled = bool(
            config.get("wandb_activate") or config.get("save_visualizations")
        )
        self._eval_step_fn = make_eval_step(
            eval_model, eval_criterion, config, model_config, task,
            with_aoi=with_aoi, with_preds=self.viz_enabled,
        )
        self.with_aoi = with_aoi

        bsh = batch_sharding(self.plan)
        rep = replicated(self.plan)
        # per-compile XLA options (config key `compiler_options`, a
        # {flag: value} dict). This is the ONLY way to set backend-owned
        # flags on the axon stack: client XLA_FLAGS are parsed by the local
        # jaxlib, which fatals on TPU-only flags before the compile RPC.
        # Options demonstrably reach the remote compiler (a garbage name
        # fails the compile); measured A/B results live in
        # docs/performance.md — the scoped-VMEM sweep REGRESSED, so nothing
        # is defaulted here.
        copts = config.get("compiler_options") or None
        self._train_step = jax.jit(
            self._train_step_fn,
            in_shardings=(rep, bsh, rep, rep, rep),
            out_shardings=(rep, rep, rep),
            donate_argnums=(0,),
            compiler_options=copts,
        )
        self._eval_step = jax.jit(
            self._eval_step_fn,
            in_shardings=(rep, bsh, rep),
            out_shardings=(rep, rep, rep),
            compiler_options=copts,
        )

    # ------------------------------------------------------------------
    def _load_pretrained_weights(self):
        """Initialization-time weight loading (reference surface:
        smp's pretrained="imagenet" encoders, model_utilities.py:110-157, and
        UperNet from_pretrained, upernet.py:28-77):
          * pretrained_checkpoint: a torch checkpoint for THIS method,
            converted wholesale (convert.CONVERTERS);
          * pretrained_encoder: a torchvision resnet state-dict path grafted
            into the model's `encoder` subtree (stem kept random when the
            input-channel count differs);
          * pretrained_upernet: an HF hub name/path loaded via
            from_pretrained + first-conv/classifier patching."""
        cfg = self.config

        def apply_variables(variables: dict) -> None:
            # one reconstruction path for every weight source; an empty/absent
            # batch_stats subtree keeps the initialized one
            self.state = TrainState(
                step=self.state.step,
                params=variables["params"],
                batch_stats=variables.get("batch_stats") or self.state.batch_stats,
                opt_state=self.state.opt_state,
            )

        if cfg.get("pretrained_checkpoint"):
            from ..convert import convert

            apply_variables(convert(cfg["pretrained_checkpoint"], cfg["method"]))
        elif cfg.get("pretrained_encoder"):
            from ..convert import convert_torchvision_resnet, graft_encoder, load_torch_state_dict

            enc = convert_torchvision_resnet(load_torch_state_dict(cfg["pretrained_encoder"]))
            apply_variables(graft_encoder(
                {"params": self.state.params, "batch_stats": self.state.batch_stats}, enc
            ))
        elif cfg.get("pretrained_upernet"):
            from ..convert import load_pretrained_upernet

            apply_variables(load_pretrained_upernet(
                cfg["pretrained_upernet"], cfg["num_channels"], cfg.get("num_classes", 3)
            ))
        elif cfg.get("pretrained") or cfg.get("encoder_weights"):
            # The reference DEFAULTS these methods to ImageNet-pretrained
            # encoders (model_utilities.py:110-157 passes
            # encoder_weights="imagenet" to smp; upernet.py:28-77 pulls HF hub
            # weights). Without weights the convergence behavior differs
            # materially from the reference — make the gap loud.
            import warnings

            warnings.warn(
                f"config requests pretrained weights (pretrained="
                f"{cfg.get('pretrained')!r}, encoder_weights="
                f"{cfg.get('encoder_weights')!r}) for method "
                f"{cfg.get('method')!r} but no weight source is set — "
                "training starts from RANDOM init, unlike the reference "
                "default. Supply 'pretrained_encoder' (torchvision resnet "
                ".pth), 'pretrained_checkpoint' (reference .pt), or "
                "'pretrained_upernet' (HF name/path); see README "
                "'Pretrained weights' for the one-command graft.",
                stacklevel=2,
            )

    def run_train_epoch(self, loader: Loader, epoch: int) -> dict:
        cfg = self.config
        metric_state = MetricState.create()
        # epoch-level schedule (torch lr_scheduler.step() analogue); the step
        # consumes the lr argument on-device via optim.inject_lr
        lr_value = float(self.lr_schedule(epoch))
        t0 = time.time()
        nbatches = 0
        for index, device_batch in enumerate(device_prefetch(loader, self.plan)):
            self.rng, step_rng = jax.random.split(self.rng)
            self.state, metric_state, aux = self._train_step(
                self.state, device_batch, metric_state, jnp.asarray(lr_value, jnp.float32), step_rng
            )
            norm_tree = None
            if self.with_watch:
                loss, grad_norm, norm_tree = aux
            elif self.with_grad_norm:
                loss, grad_norm = aux
            else:
                loss, grad_norm = aux, None
            nbatches += 1
            if index % int(cfg.get("print_frequency", 10)) == 0:
                # per-iteration metric snapshot from the cumulative device bank
                # (a 4x4 transfer; the reference recomputes torchmetrics per
                # batch, segmentation_trainer.py:166-171)
                from ..ops.metrics import derive

                snap = derive(np.asarray(metric_state.cm))
                self.logger.log_train_iteration(
                    epoch, index, float(loss), lr_value, snap,
                    grad_norm=None if grad_norm is None else float(grad_norm),
                )
                if norm_tree is not None:
                    self.logger.log_watch(self.state.params, norm_tree)
        summary = metric_state.summarize()
        summary["epoch_time_s"] = time.time() - t0
        summary["batches"] = nbatches
        # the device bank already accumulates loss_sum/count inside the step;
        # a host-side per-step scalar list would add one blocking fetch per
        # step through the tunnel and pin every loss buffer all epoch
        summary["mean_loss"] = float(summary.get("val_loss", float("nan")))
        return summary

    def run_eval(self, loader: Loader, settype: str = "Val") -> tuple[float, float, float, dict]:
        metric_state = MetricState.create()
        aoi = HostAOIMetrics() if self.with_aoi else None
        # one random batch gets its first sample visualized, like the
        # reference's wandb.Image logging (segmentation_trainer.py:516-587);
        # the eval step only emits preds when this is on (aux gating)
        viz_index = int(np.random.randint(0, max(len(loader), 1))) if self.viz_enabled else -1
        for index, batch in enumerate(loader):
            device_batch = shard_batch(self.plan, batch)
            metric_state, loss, aux = self._eval_step(self.state, device_batch, metric_state)
            if aoi is not None:
                aoi.update(np.asarray(aux["per_sample_cm"]), batch["activation"])
            if index == viz_index:
                self._log_visualization(batch, np.asarray(aux["preds"]), settype)
        summary = metric_state.summarize()
        self.logger.log_eval(settype, summary, aoi.summarize() if aoi else None)
        acc = 100.0 * summary["micro_accuracy"]
        mean_f1 = 100.0 * summary["mean_f1"]
        miou = 100.0 * summary["mean_iou"]
        return acc, mean_f1, miou, summary

    def _log_visualization(self, batch: dict, preds: np.ndarray, settype: str):
        """Reverse-scale sample 0 and emit image/GT/prediction overlays to
        wandb (when active) or PNG files under the checkpoint dir."""
        from ..utils.visualize import prediction_triptych, to_wandb_images

        sv = None
        if "flood_sv1" in batch and self.config.get("scale_input") is not None:
            sv = (batch["flood_sv1"][0], batch["flood_sv2"][0])
        trip = prediction_triptych(
            batch["post"][0], preds[0], batch["mask"][0], sv, self.config
        )
        wimgs = to_wandb_images(trip) if self.config.get("wandb_activate") else None
        if wimgs is not None and self.logger.wandb is not None:
            self.logger.wandb.log({f"{settype} {k}": v for k, v in wimgs.items()})
        elif self.config.get("save_visualizations"):
            import cv2
            from pathlib import Path

            out_dir = Path(self.config.get("checkpoint_path", "checkpoints/run")) / "viz"
            out_dir.mkdir(parents=True, exist_ok=True)
            panel = np.concatenate(list(trip.values()), axis=1)
            cv2.imwrite(str(out_dir / f"{settype.lower()}_sample.png"), panel[..., ::-1])


def train_task(
    model,
    train_loader: Loader,
    val_loader: Loader,
    test_loader: Loader,
    config: dict,
    model_config: dict,
    task: str,
    seed: int = 999,
) -> TaskEngine:
    """The shared training driver: epochs -> val -> best-mIoU checkpoint.
    Mirrors train_semantic_segmentation / train_change_detection /
    train_recurrent_segmentation control flow."""
    # ViT-finetune models fix their patch grid at image_size (init must run
    # the forward at exactly that size); conv models are size-agnostic, so a
    # small init keeps the tracer cheap
    if config.get("method") == "finetune":
        init_size = int(config.get("image_size", 224))
    else:
        init_size = min(224, int(config.get("synthetic_patch_size", 224) or 224))
    engine = TaskEngine(
        model, config, model_config, task, steps_per_epoch=len(train_loader), seed=seed,
        init_size=init_size,
    )
    ckpt = CheckpointManager(config.get("checkpoint_path", "checkpoints/run"))

    start_epoch = int(config.get("start_epoch", 0))
    best_val = 0.0
    if config.get("resume_checkpoint"):
        # preemption-safe resume: prefer the rolling "latest" checkpoint
        # (carries epoch + best metric); fall back to best_segmentation
        # (reference semantics, utilities/utilities.py:300-303)
        if ckpt.has("latest"):
            engine.state, extra = ckpt.restore("latest", engine.state)
            start_epoch = int(extra.get("epoch", -1)) + 1
            best_val = float(extra.get("best_val", 0.0))
            engine.logger.info(f"Resumed from latest checkpoint at epoch {start_epoch}")
        elif ckpt.has("best_segmentation"):
            engine.state, extra = ckpt.restore("best_segmentation", engine.state)
            # carry the checkpoint's metric so the next epoch can't clobber
            # a better best with a worse model (save_best stores it)
            best_val = float(extra.get("metric", 0.0))
            engine.logger.info(
                f"Resumed from best_segmentation (val mIoU {best_val:.3f})")

    for epoch in range(start_epoch, int(config.get("epochs", 1))):
        train_summary = engine.run_train_epoch(train_loader, epoch)
        engine.logger.log_train_epoch(epoch, train_summary)
        if task in ("cd", "recurrent") and config.get("train_save_checkpoint_freq"):
            if epoch % int(config["train_save_checkpoint_freq"]) == 0:
                ckpt.save_epoch(engine.state, epoch)
        _, _, miou, _ = engine.run_eval(val_loader, "Val")
        if miou > best_val:
            best_val = miou
            engine.logger.info(f"Epoch {epoch}: new best validation mIoU {miou:.3f}")
            ckpt.save_best(engine.state, epoch, miou)
        ckpt.save("latest", engine.state, extra={"epoch": epoch, "best_val": best_val})
    ckpt.wait()
    # reference parity: the final Test eval runs on the BEST-val checkpoint,
    # not the last epoch's weights (reference main.py:151-158 reloads
    # best_segmentation.pt before model.eval())
    if ckpt.has("best_segmentation"):
        engine.state, _ = ckpt.restore("best_segmentation", engine.state)
        engine.logger.info("Restored best_segmentation for the final test eval")
    return engine


def evaluate_task(
    model,
    config: dict,
    model_config: dict,
    task: str,
    seed: int = 999,
) -> TaskEngine:
    """Eval-only engine: restore best_segmentation and skip training
    (reference `"test": true` surface, main.py:86-128 — it reloads the
    checkpoint and only evaluates). A `pretrained_checkpoint` config key
    loads at engine init instead; with neither source this raises rather
    than silently scoring a random-init model."""
    if config.get("method") == "finetune":
        init_size = int(config.get("image_size", 224))
    else:
        init_size = min(224, int(config.get("synthetic_patch_size", 224) or 224))
    engine = TaskEngine(
        model, config, model_config, task, steps_per_epoch=1, seed=seed,
        init_size=init_size,
    )
    ckpt = CheckpointManager(config.get("checkpoint_path", "checkpoints/run"))
    if ckpt.has("best_segmentation"):
        engine.state, extra = ckpt.restore("best_segmentation", engine.state)
        engine.logger.info(
            f"Eval-only: restored best_segmentation (val mIoU "
            f"{float(extra.get('metric', float('nan'))):.3f})")
    elif not config.get("pretrained_checkpoint"):
        raise FileNotFoundError(
            f"\"test\": true but no best_segmentation checkpoint in "
            f"{ckpt.dir} and no pretrained_checkpoint configured")
    return engine
