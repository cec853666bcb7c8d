"""Metric logging sinks: stdout (`on_screen_prints`) and optional wandb
(`wandb_activate`), behind the same config keys as the reference
(segmentation_trainer.py:166-228, :829-1009). wandb is not installed in this
image, so the sink degrades to a no-op with a single warning.
"""

from __future__ import annotations

import json
from typing import Any

from ..ops.metrics import CLASS_LABELS, NUM_CLASSES


class MetricLogger:
    def __init__(self, config: dict):
        self.config = config
        self.on_screen = bool(config.get("on_screen_prints"))
        self.wandb = None
        if config.get("wandb_activate"):
            try:
                import wandb

                # run-id persistence for resumable runs (reference:
                # change_detection_trainer.py:22-31 stores id.json)
                run_id = None
                ckpt_path = config.get("checkpoint_path")
                if ckpt_path:
                    from pathlib import Path

                    id_file = Path(ckpt_path) / "id.json"
                    if config.get("resume_wandb") and id_file.exists():
                        run_id = json.loads(id_file.read_text()).get("run_id")
                    else:
                        run_id = wandb.util.generate_id()
                        id_file.parent.mkdir(parents=True, exist_ok=True)
                        id_file.write_text(json.dumps({"run_id": run_id}))
                self.wandb = wandb
                wandb.init(
                    project=config.get("wandb_project"),
                    entity=config.get("wandb_entity"),
                    id=run_id,
                    resume="allow",
                    config={k: v for k, v in config.items() if isinstance(v, (int, float, str, bool))},
                )
            except ImportError:
                print("[kurosiwo_tpu] wandb requested but not installed; logging to stdout")
                self.on_screen = True

    def info(self, msg: str):
        print(msg)

    def _emit(self, payload: dict):
        # independent sinks like the reference (segmentation_trainer.py:174):
        # on_screen_prints keeps a local record even when wandb is active
        if self.wandb is not None:
            self.wandb.log(payload)
        if self.on_screen:
            print(json.dumps({k: (round(v, 5) if isinstance(v, float) else v) for k, v in payload.items()}))

    def log_train_iteration(
        self, epoch: int, index: int, loss: float, lr: float, snap: dict | None = None,
        grad_norm: float | None = None,
    ):
        payload = {"Epoch": epoch, "Iteration": index, "Train Loss": loss, "lr": lr}
        if grad_norm is not None:
            # wandb.watch(log_freq=20) equivalent (reference main.py:144)
            payload["Gradient norm"] = grad_norm
        if snap is not None:
            for c in range(NUM_CLASSES):
                payload[f"Train Accuracy ({CLASS_LABELS[c]})"] = 100 * float(snap["accuracy"][c])
                payload[f"Train F-Score ({CLASS_LABELS[c]})"] = 100 * float(snap["fscore"][c])
                payload[f"Train Precision ({CLASS_LABELS[c]})"] = 100 * float(snap["precision"][c])
                payload[f"Train Recall ({CLASS_LABELS[c]})"] = 100 * float(snap["recall"][c])
                payload[f"Train IoU ({CLASS_LABELS[c]})"] = 100 * float(snap["iou"][c])
            payload["Train MeanIoU"] = 100 * snap["mean_iou"]
        self._emit(payload)

    def log_watch(self, params: Any, grad_norms: Any = None, prefix: str = ""):
        """wandb.watch-equivalent telemetry (reference main.py:144,
        segmentation_trainer.py:30): per-layer parameter histograms and
        per-layer gradient norms. Called by the engine every print_frequency
        steps when `wandb_watch` is enabled (params come from the host copy
        of the train state; gradient norms are device scalars computed in
        the step)."""
        if self.wandb is None:
            return
        import jax
        import numpy as np

        params = jax.device_get(params)  # ONE batched D2H transfer, not one per leaf
        payload = {}

        def leaf_name(path):
            return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)

        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
            payload[f"parameters/{prefix}{leaf_name(path)}"] = self.wandb.Histogram(
                np.asarray(leaf, np.float32).ravel()
            )
        if grad_norms is not None:
            for path, leaf in jax.tree_util.tree_flatten_with_path(grad_norms)[0]:
                payload[f"gradients/{prefix}{leaf_name(path)}.norm"] = float(leaf)
        self.wandb.log(payload)

    def log_train_epoch(self, epoch: int, summary: dict):
        payload = {"Epoch": epoch, "Train MeanIoU": summary["mean_iou"] * 100}
        for c in range(NUM_CLASSES):
            payload[f"Train F-Score ({CLASS_LABELS[c]})"] = 100 * float(summary["fscore"][c])
            payload[f"Train IoU ({CLASS_LABELS[c]})"] = 100 * float(summary["iou"][c])
        payload["Train epoch time (s)"] = summary.get("epoch_time_s", 0.0)
        self._emit(payload)

    def log_eval(self, settype: str, summary: dict, aoi_summary: dict | None = None):
        payload = {f"{settype} Loss": summary["val_loss"], f"{settype} MeanIoU": 100 * summary["mean_iou"]}
        for c in range(NUM_CLASSES):
            payload[f"{settype} Accuracy ({CLASS_LABELS[c]})"] = 100 * float(summary["accuracy"][c])
            payload[f"{settype} F-Score ({CLASS_LABELS[c]})"] = 100 * float(summary["fscore"][c])
            payload[f"{settype} Precision ({CLASS_LABELS[c]})"] = 100 * float(summary["precision"][c])
            payload[f"{settype} Recall ({CLASS_LABELS[c]})"] = 100 * float(summary["recall"][c])
            payload[f"{settype} IoU ({CLASS_LABELS[c]})"] = 100 * float(summary["iou"][c])
        if self.config.get("evaluate_water") and "water_fscore" in summary:
            payload[f"{settype} F-Score Only Water"] = 100 * float(summary["water_fscore"][1])
        if self.config.get("log_zone_metrics") and "zones" in summary:
            for z, zsum in enumerate(summary["zones"]):
                payload[f"{settype} Zone {z + 1} MeanIoU"] = 100 * zsum["mean_iou"]
        if aoi_summary:
            for act, asum in aoi_summary.items():
                payload[f"{settype} AOI {act} MeanIoU"] = 100 * asum["mean_iou"]
        self._emit(payload)
