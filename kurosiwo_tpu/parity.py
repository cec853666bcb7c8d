"""End-to-end accuracy-parity harness.

One command takes a released reference checkpoint (torch), converts it, runs
the FULL test-split evaluation through the task engine, and prints per-class
F1 / IoU (and deltas against expected numbers when provided) — so the
BASELINE north star "SNUNet & FloodViT test F1 within 0.5 pts" is a single
invocation when data + checkpoints are present:

    python -m kurosiwo_tpu.parity --checkpoint best_segmentation.pt \
        --model snunet --root /data/kuro_siwo [--expected-f1 76.2] [--tolerance 0.5]

Reference checkpoints (README.md:64-67): `best_segmentation.pt` is the whole
pickled SNUNet module (segmentation_trainer.py:255); `floodvit.pt` is the
MAE-pretrained ViT encoder — the latter has no segmentation head, so parity
for it is checked at the encoder level by tests/test_convert_parity.py, and
a finetuned ViT checkpoint can be evaluated here with --model finetune.
"""

from __future__ import annotations

import argparse
import json

import numpy as np

_MODEL_TASKS = {
    "snunet": ("cd", {"inputs": ["pre_event_1", "post_event"]}),
    "siam-diff": ("cd", {"inputs": ["pre_event_1", "post_event"]}),
    "siam-conc": ("cd", {"inputs": ["pre_event_1", "post_event"]}),
    "bit-cd": ("cd", {"inputs": ["pre_event_1", "post_event"]}),
    "changeformer": ("cd", {"inputs": ["pre_event_1", "post_event"]}),
    "hfa-net": ("cd", {"inputs": ["pre_event_1", "post_event"]}),
    "adhr-cdnet": ("cd", {"inputs": ["pre_event_1", "post_event"]}),
    "transunet-cd": ("cd", {"inputs": ["pre_event_1", "post_event"]}),
    "unet": ("segmentation", {}),
    "finetune": ("segmentation", {}),
    "convlstm": ("recurrent", {}),
}


def build_parser():
    p = argparse.ArgumentParser(prog="python -m kurosiwo_tpu.parity")
    p.add_argument("--checkpoint", required=True, help="torch checkpoint path")
    p.add_argument("--model", required=True, choices=sorted(_MODEL_TASKS))
    p.add_argument("--root", default=None, help="Kuro Siwo data root (synthetic fallback if absent)")
    p.add_argument("--config_root", default="configs")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--expected-f1", type=float, default=None, help="reference test mean F1 to compare against")
    p.add_argument("--expected-iou", type=float, default=None)
    p.add_argument("--tolerance", type=float, default=0.5, help="max |delta| in points (BASELINE north star)")
    p.add_argument("--seed", type=int, default=999)
    p.add_argument(
        "--override", default=None,
        help="JSON dict merged into the config (e.g. '{\"synthetic_size\": 8, \"dim\": 64}')",
    )
    return p


def run(args) -> dict:
    from .config import load_config
    from .data.pipeline import prepare_loaders
    from .models.factory import (
        initialize_cd_model,
        initialize_recurrent_model,
        initialize_segmentation_model,
    )
    from .training.engine import TaskEngine

    task, extra = _MODEL_TASKS[args.model]
    overrides = {"task": task, "batch_size": args.batch_size, **extra}
    if args.root:
        overrides["root_path"] = args.root
    if args.override:
        overrides.update(json.loads(args.override))
    configs = load_config(method=args.model, config_root=args.config_root, overrides=overrides)
    mcfg = configs["model_config"]  # overrides already propagated by load_config
    # f32 eval twin like the reference's autocast-off eval
    configs["mixed_precision"] = False

    _, _, test_loader = prepare_loaders(configs, seed=args.seed)

    if task == "cd":
        model = initialize_cd_model(configs, mcfg)
    elif task == "recurrent":
        model = initialize_recurrent_model(configs, mcfg)
    else:
        model = initialize_segmentation_model(configs, mcfg)

    # load through the engine's own pretrained_checkpoint path (the exact
    # loader production uses — no hand-rolled state swap to drift), with the
    # same finetune init_size rule as train_task/evaluate_task
    configs["pretrained_checkpoint"] = args.checkpoint
    if configs.get("method") == "finetune":
        init_size = int(configs.get("image_size", 224))
    else:
        init_size = min(224, int(configs.get("synthetic_patch_size", 224) or 224))
    engine = TaskEngine(
        model, configs, mcfg, task, steps_per_epoch=1, seed=args.seed, init_size=init_size
    )

    acc, mean_f1, miou, summary = engine.run_eval(test_loader, "Test")
    report = {
        "checkpoint": args.checkpoint,
        "model": args.model,
        "test_accuracy": acc,
        "test_mean_f1": mean_f1,
        "test_mean_iou": miou,
        "per_class_f1": [100.0 * v for v in np.asarray(summary["fscore"]).tolist()[:3]],
        "per_class_iou": [100.0 * v for v in np.asarray(summary["iou"]).tolist()[:3]],
    }
    if args.expected_f1 is not None:
        report["delta_f1"] = mean_f1 - args.expected_f1
        report["f1_within_tolerance"] = abs(report["delta_f1"]) <= args.tolerance
    if args.expected_iou is not None:
        report["delta_iou"] = miou - args.expected_iou
        report["iou_within_tolerance"] = abs(report["delta_iou"]) <= args.tolerance
    return report


def main(argv=None):
    args = build_parser().parse_args(argv)
    report = run(args)
    print(json.dumps(report, indent=2))
    failed = [k for k in ("f1_within_tolerance", "iou_within_tolerance") if report.get(k) is False]
    if failed:
        raise SystemExit(f"PARITY FAILED: {failed}")
    return report


if __name__ == "__main__":
    main()
