"""Kuro Siwo TPU — CLI entrypoint.

Surface parity with `/root/reference/main.py`: same flags
(--method --backbone --dem --slope --batch_size --inputs --seed), same config
layering, same task dispatch (segmentation / cd / mae / convlstm-recurrent),
same end-of-run behavior (reload best checkpoint, evaluate on test, print
"Test Mean IOU").
"""

from __future__ import annotations

import argparse
import pprint
import random

import numpy as np

from kurosiwo_tpu.config import create_checkpoint_directory, load_config
from kurosiwo_tpu.data.pipeline import prepare_loaders
from kurosiwo_tpu.models import (
    initialize_cd_model,
    initialize_recurrent_model,
    initialize_segmentation_model,
)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument("--method", default=None)
    parser.add_argument("--backbone", default=None)
    parser.add_argument("--dem", action="store_true", default=False)
    parser.add_argument("--slope", action="store_true", default=False)
    parser.add_argument("--batch_size", default=None)
    parser.add_argument("--inputs", nargs="+", default=None)
    parser.add_argument("--seed", type=int, default=999)
    parser.add_argument("--config_root", default="configs")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    np.random.seed(args.seed)
    random.seed(args.seed)

    # multi-host: wires jax.distributed from JAX_COORDINATOR_ADDRESS /
    # JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars; no-op single-process
    from kurosiwo_tpu.parallel.distributed import initialize as distributed_init

    pi, pc = distributed_init()
    if pc > 1:
        print(f"Distributed runtime: process {pi}/{pc}")

    configs = load_config(
        method=args.method, backbone=args.backbone, config_root=args.config_root, args=args
    )
    model_configs = configs["model_config"]
    if args.batch_size is not None:
        configs["batch_size"] = int(args.batch_size)
    configs["checkpoint_path"] = create_checkpoint_directory(configs, model_configs)
    pprint.pprint({k: v for k, v in configs.items() if k != "model_config"})

    task = configs["task"]
    if task == "diffusion-unsup":
        # unsupervised: the engine builds its own per-observation train loader
        # (no val/test splits exist for this task; reference never dispatched
        # it at all — models/model_utilities.py:98-108 builds the model,
        # main.py lacks the branch)
        from kurosiwo_tpu.training.diffusion import train as train_diffusion

        train_diffusion(configs, model_configs=model_configs, seed=args.seed)
        return

    train_loader, val_loader, test_loader = prepare_loaders(configs, seed=args.seed)
    print("Samples in Train Set: ", train_loader.num_samples())
    print("Samples in Val Set: ", val_loader.num_samples())
    print("Samples in Test Set: ", test_loader.num_samples())

    # '"test": true' = eval-only (reference main.py:86-128: reload the best
    # checkpoint, skip training, evaluate) — training would otherwise
    # overwrite the very best_segmentation the user asked to score
    eval_only = bool(configs.get("test"))

    def _trained_or_restored(train_fn, model, engine_task):
        if eval_only:
            from kurosiwo_tpu.training.engine import evaluate_task

            return evaluate_task(model, configs, model_configs, engine_task, seed=args.seed)
        return train_fn(
            model, train_loader, val_loader, test_loader,
            configs=configs, model_configs=model_configs, seed=args.seed,
        )

    if task == "segmentation" and configs["method"] == "convlstm":
        from kurosiwo_tpu.training.recurrent import (
            eval_recurrent_segmentation,
            train_recurrent_segmentation,
        )

        engine = _trained_or_restored(
            train_recurrent_segmentation,
            initialize_recurrent_model(configs, model_configs), "recurrent",
        )
        _, _, miou = eval_recurrent_segmentation(engine, test_loader, settype="Test")
        print("Test Mean IOU: ", miou)
    elif task == "segmentation":
        from kurosiwo_tpu.training.segmentation import (
            eval_semantic_segmentation,
            train_semantic_segmentation,
        )

        engine = _trained_or_restored(
            train_semantic_segmentation,
            initialize_segmentation_model(configs, model_configs), "segmentation",
        )
        _, _, miou = eval_semantic_segmentation(engine, test_loader, settype="Test")
        print("Test Mean IOU: ", miou)
    elif task == "mae":
        import kurosiwo_tpu.training.mae as mae_training

        print("Initializing Self-Supervised learning training with configs:")
        mae_training.train(configs, seed=args.seed, model_configs=model_configs)
    elif task == "cd":
        from kurosiwo_tpu.training.change_detection import (
            eval_change_detection,
            train_change_detection,
        )

        engine = _trained_or_restored(
            train_change_detection,
            initialize_cd_model(configs, model_configs, "train"), "cd",
        )
        _, _, miou = eval_change_detection(engine, test_loader, settype="Test")
        print("Test Mean IOU: ", miou)
    else:
        raise SystemExit(f"unknown task {task!r}")


if __name__ == "__main__":
    main()
