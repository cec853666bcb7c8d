"""Layered JSON5 configuration system.

Reproduces the reference's config-merge semantics (see
/root/reference/main.py:48-76 and /root/reference/utilities/utilities.py:350-413):

    configs/config.json
      -> configs/method/<method>/<method>.json      (CLI --method/--backbone override)
      -> configs/train/data_config.json             (CLI --inputs/--dem/--slope override)
      -> configs/train/train_config.json
      -> configs/augmentations/augmentation.json    (only if data_augmentations/self-supervised)
    later files win via dict.update; then derived keys are computed:
      num_channels, class_weights, and (TPU-native) mesh/device info.

Differences from the reference (deliberate):
  * `device` is replaced by mesh topology (`kurosiwo_tpu.parallel.mesh`); the key is
    still set (to "tpu"/"cpu") for config-surface compatibility.
  * the reference's convlstm path loads `configs/method/temporal/convlstm.json`,
    which does not exist (latent bug, main.py:52); we look in both
    `method/temporal/` and `method/convlstm/`.
  * `--dem`/`--slope` work without `--inputs`: the reference only forwards
    the CLI args into the config when `--inputs` is set (main.py:65-68
    passes None otherwise), silently dropping a bare `--dem` — a latent bug
    we fix by always forwarding args (so `--dem` alone adds the DEM channel
    and num_channels gains +1 vs the reference's ignored flag).
  * the cd checkpoint timestamp is broadcast from process 0 under
    multi-process runs (a per-process datetime.now() could split one run
    across directories).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any

try:  # pyjson5 in the reference; json5 here. Both parse JSON-with-comments.
    import pyjson5 as _json5  # type: ignore

    def _loads(text: str) -> Any:
        return _json5.loads(text)

except ImportError:
    import json5 as _json5  # type: ignore

    def _loads(text: str) -> Any:
        return _json5.loads(text)


# Class weights for the RandomEvents track when `weighted` is enabled
# (reference: utilities/utilities.py:392-397).
RANDOM_EVENTS_CLASS_WEIGHTS = [0.3715753140309927, 14.009780283125977, 8.20405370357821]

#: label semantics (reference: training/segmentation_trainer.py:13)
CLASS_NO_WATER, CLASS_PERMANENT_WATER, CLASS_FLOOD, CLASS_INVALID = 0, 1, 2, 3
IGNORE_INDEX = 3


def load_json5(path: str | os.PathLike) -> dict:
    with open(path, "r") as f:
        return _loads(f.read())


def _find_method_config(config_root: Path, method: str) -> Path:
    """Locate configs/method/<m>/<m>.json, tolerating the -/_ spelling split
    and the reference's temporal/ directory convention for convlstm/vivit."""
    m = method.lower()
    fname = m.replace("-", "_") + ".json"
    candidates = [
        config_root / "method" / m / fname,
        config_root / "method" / "temporal" / fname,
    ]
    for c in candidates:
        if c.exists():
            return c
    raise FileNotFoundError(
        f"no method config for {method!r}; looked at {[str(c) for c in candidates]}"
    )


def derive_num_channels(config: dict) -> int:
    """Channel math (reference: utilities/utilities.py:376-390).

    cd / convlstm feed each acquisition separately -> channels per frame;
    otherwise frames are channel-concatenated -> channels x inputs. DEM adds 1.
    SLC rasters carry double channels (4 vs 2).
    """
    if config.get("task") == "cd" or config.get("method") == "convlstm":
        n = len(config["channels"])
        if config.get("dem"):
            n += 1
    else:
        n = len(config["channels"]) * len(config["inputs"])
        if config.get("dem"):
            n += 1
    if config.get("slc"):
        if config.get("dem"):
            n = (n - 1) * 2 + 1
        else:
            n = n * 2
    return n


def update_config(config: dict, args=None, config_root: str | os.PathLike = "configs",
                  overrides: dict | None = None) -> dict:
    """Merge data/train/augmentation configs and compute derived keys.

    `args` may be an argparse.Namespace (or any object) with optional
    attributes inputs/dem/slope, mirroring utilities/utilities.py:350-374.
    `overrides` (programmatic API) win over every merged file and are applied
    before the augmentation-file check so keys like data_augmentations take
    effect.
    """
    config_root = Path(config_root)
    config = dict(config)

    config.update(load_json5(config_root / "train" / "data_config.json"))

    if args is not None:
        if getattr(args, "inputs", None) is not None:
            config["inputs"] = args.inputs
        if getattr(args, "dem", False):
            config["dem"] = True
            if getattr(args, "slope", False):
                config["slope"] = True

    config.update(load_json5(config_root / "train" / "train_config.json"))
    if overrides:
        config.update(overrides)

    if config.get("task") == "self-supervised" or config.get("data_augmentations"):
        config.update(load_json5(config_root / "augmentations" / "augmentation.json"))

    config["num_channels"] = derive_num_channels(config)

    if config.get("weighted") and config.get("track") == "RandomEvents":
        config["class_weights"] = list(RANDOM_EVENTS_CLASS_WEIGHTS)
    else:
        config["class_weights"] = [1.0, 1.0, 1.0]

    # Device key kept for config-surface compatibility; actual placement is
    # decided by kurosiwo_tpu.parallel (mesh of TPU chips, or CPU fallback).
    config["device"] = config.get("device", "tpu")

    # Activation-split bookkeeping (reference define_tracks just logs counts).
    for k in ("train_acts", "val_acts", "test_acts"):
        config.setdefault(k, [])
    return config


def load_config(
    method: str | None = None,
    backbone: str | None = None,
    config_root: str | os.PathLike = "configs",
    args=None,
    overrides: dict | None = None,
) -> dict:
    """Full config assembly as done by the reference main.py __main__ block."""
    config_root = Path(config_root)
    config = load_json5(config_root / "config.json")
    if method is not None:
        config["method"] = method

    model_config = load_json5(_find_method_config(config_root, config["method"]))
    if backbone is not None and config["method"] not in ("convlstm", "vivit"):
        model_config["backbone"] = backbone
    config.update(model_config)

    config = update_config(config, args=args, config_root=config_root, overrides=overrides)
    if overrides:
        # re-apply after update_config so overrides also win over the
        # augmentation-file merge; derived channel math recomputed with the
        # final values (update_config already applied them once before its
        # own derivations)
        config.update(overrides)
        config["num_channels"] = derive_num_channels(config)
        # overrides must also win for keys the factories read from
        # model_config (e.g. changeformer's embed_dim, vit patch_size) —
        # including keys the method json doesn't declare but a factory
        # reads via .get(). Nothing iterates model_config wholesale, so
        # top-level-only override keys landing here are inert.
        model_config.update(overrides)

    config["model_config"] = model_config
    return config


def create_checkpoint_directory(config: dict, model_config: dict, root: str = "checkpoints") -> str:
    """Checkpoint directory naming parity (utilities/utilities.py:15-70)."""
    method = config["method"]
    if "vit" in method.lower():
        path = (
            f"{root}/{method}_patch{model_config['patch_size']}"
            f"_depth{model_config['depth']}_num_heads{model_config['num_heads']}"
            f"/input_patches_{len(config['inputs'])}/{config['track']}"
        )
    elif config.get("task") == "diffusion-unsup":
        path = f"{root}/diffusion-unsup/"
    elif config.get("task") == "segmentation":
        if model_config.get("backbone"):
            path = (
                f"{root}/{model_config['architecture']}/{model_config['backbone']}/"
                + "-".join(config["channels"])
                + f"_patches_{len(config['inputs'])}/{config['track']}"
            )
        else:
            path = f"{root}/{model_config.get('architecture', method)}"
    elif config.get("task") == "mae":
        bb = model_config.get("backbone", "vit").lower()
        path = f"{root}/{method.lower()}/{bb}/{bb}_{config['num_channels']}/{config['track']}"
    elif config.get("task") == "cd":
        import jax
        from datetime import datetime

        ts_int = int(datetime.now().strftime("%Y%m%d%H%M%S"))
        if jax.process_count() > 1:
            # all processes must agree on the run directory: a per-process
            # datetime.now() can cross a second boundary and split the run
            # across directories (divergent save/restore per shard)
            import numpy as _np
            from jax.experimental import multihost_utils

            ts_int = int(multihost_utils.broadcast_one_to_all(_np.int64(ts_int)))
        path = f"{root}/{method.lower()}/{config['track']}_{ts_int}"
    elif config.get("task") == "finetune":
        path = f"{root}/finetuning"
    else:
        path = f"{root}/{method.lower()}"
    Path(path).mkdir(parents=True, exist_ok=True)
    return path
