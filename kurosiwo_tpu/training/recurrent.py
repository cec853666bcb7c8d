"""Recurrent (ConvLSTM N-to-1) segmentation task frontend.

Reference: /root/reference/training/recurrent_trainer.py:19-764. Input
stacking to (B, T=3, H, W, C) in (pre2, pre1, post) order happens in
steps.assemble_recurrent_input.
"""

from __future__ import annotations

from .engine import TaskEngine, train_task


def train_recurrent_segmentation(model, train_loader, val_loader, test_loader, configs, model_configs, seed=999):
    return train_task(model, train_loader, val_loader, test_loader, configs, model_configs, "recurrent", seed)


def eval_recurrent_segmentation(engine: TaskEngine, loader, checkpoint_dir=None, settype="Test", configs=None, model_configs=None):
    acc, f1, miou, _ = engine.run_eval(loader, settype)
    return acc, f1, miou
