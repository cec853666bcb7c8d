"""Task engines: segmentation, change detection, recurrent segmentation, MAE.

Reference counterparts: /root/reference/training/{segmentation_trainer,
change_detection_trainer,recurrent_trainer,train_mae}.py. Here each engine is
a thin epoch loop around ONE pjit-compiled train step and ONE eval step;
metrics are confusion-matrix pytrees reduced on device (no torchmetrics-style
host sync), and checkpoints are orbax with best-val-mIoU selection parity.
"""
