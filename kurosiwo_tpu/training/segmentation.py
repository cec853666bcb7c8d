"""Semantic-segmentation task frontend.

Reference: /root/reference/training/segmentation_trainer.py:16-1011
(train_semantic_segmentation / eval_semantic_segmentation). The epoch loop,
metric banks, and best-val-mIoU checkpointing live in engine.py; these
functions preserve the reference's signatures and return conventions
(eval returns (100*acc, 100*meanF1, 100*mIoU)).
"""

from __future__ import annotations

from .engine import TaskEngine, train_task


def train_semantic_segmentation(model, train_loader, val_loader, test_loader, configs, model_configs, seed=999):
    return train_task(model, train_loader, val_loader, test_loader, configs, model_configs, "segmentation", seed)


def eval_semantic_segmentation(engine: TaskEngine, loader, settype="Test", configs=None, model_configs=None):
    acc, f1, miou, _ = engine.run_eval(loader, settype)
    return acc, f1, miou
