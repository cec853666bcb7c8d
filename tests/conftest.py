"""Test harness: force an 8-device virtual CPU mesh BEFORE jax initializes,
so every pjit/mesh path is exercised the way a TPU slice would run it
(the standard JAX fake-backend substitute for multi-chip hardware)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# The image's sitecustomize imports jax (axon TPU plugin) before conftest
# runs, so the env var alone is too late — override the live config too.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def base_config():
    """Minimal merged config mirroring the reference defaults (synthetic data)."""
    return {
        "task": "segmentation",
        "method": "unet",
        "root_path": "/nonexistent-kuro-siwo",
        "num_classes": 3,
        "mixed_precision": False,  # f32 on CPU tests for numeric checks
        "batch_size": 4,
        "epochs": 1,
        "start_epoch": 0,
        "num_workers": 2,
        "print_frequency": 100,
        "on_screen_prints": False,
        "wandb_activate": False,
        "log_AOI_metrics": False,
        "log_zone_metrics": False,
        "evaluate_water": True,
        "weighted": False,
        "oversampling": False,
        "resume_checkpoint": False,
        "loss_function": "cross_entropy",
        "track": "RandomEvents",
        "inputs": ["pre_event_1", "pre_event_2", "post_event"],
        "channels": ["vv", "vh"],
        "clamp_input": 0.15,
        "scale_input": "normalize",
        "data_mean": [0.0953, 0.0264],
        "data_std": [0.0427, 0.0215],
        "dem_mean": 93.4313,
        "dem_std": 1410.8382,
        "slope_mean": 2.1277,
        "slope_std": 67.5048,
        "dem": False,
        "slope": False,
        "slc": False,
        "uint8": False,
        "data_augmentations": False,
        "synthetic_data": True,
        "synthetic_size": 16,
        "train_acts": [130, 470],
        "val_acts": [514],
        "test_acts": [321],
        "class_weights": [1.0, 1.0, 1.0],
        "num_channels": 6,
        "device": "cpu",
    }
