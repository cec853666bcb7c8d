"""Change-detection task frontend.

Reference: /root/reference/training/change_detection_trainer.py:18-792. The
two-frame input assembly, forced-SGD optimizer selection for bit-cd/hfa-net,
ChangeFormer multi-scale loss/inference, per-epoch checkpoints and the
best-val state save all live in engine.py / steps.py / ops/optim.py.
"""

from __future__ import annotations

from .engine import TaskEngine, train_task


def train_change_detection(model, train_loader, val_loader, test_loader, configs, model_configs, seed=999):
    assert len(configs["inputs"]) == 2, "Change detection requires exactly 2 inputs"
    return train_task(model, train_loader, val_loader, test_loader, configs, model_configs, "cd", seed)


def eval_change_detection(engine: TaskEngine, loader, settype="Test", configs=None, model_configs=None):
    acc, f1, miou, _ = engine.run_eval(loader, settype)
    return acc, f1, miou
