"""Qualitative visualization: reverse-scaled SAR images with mask overlays.

Reference counterpart: the wandb.Image logging block in
`/root/reference/training/segmentation_trainer.py:516-587` — one random eval
sample is reverse-scaled (utilities/utilities.py:129-226), gamma-0.3 enhanced
(kornia.enhance.adjust_gamma), and logged with ground-truth + prediction
class overlays. Here the rendering is pure numpy; the wandb wrapper is
optional and gated on wandb being importable.
"""

from __future__ import annotations

import numpy as np

from ..data.normalize import reverse_scale_img
from ..ops.metrics import CLASS_LABELS

# RGBA-ish class colors for overlays (no-water transparent-ish gray,
# permanent water blue, flood red, invalid black)
CLASS_COLORS = {
    0: (64, 64, 64),
    1: (30, 110, 225),
    2: (220, 40, 40),
    3: (0, 0, 0),
}


def adjust_gamma(img: np.ndarray, gamma: float = 0.3) -> np.ndarray:
    """kornia.enhance.adjust_gamma numerics: clip to [0,1], power."""
    return np.clip(img, 0.0, 1.0) ** gamma


def sar_to_rgb(image: np.ndarray, scale_vars=None, config: dict | None = None,
               gamma: float = 0.3) -> np.ndarray:
    """(H, W, C>=1) SAR image -> uint8 RGB for display. Reverse-scales when
    scale vars are provided, min-max normalizes, gamma-enhances, maps VV to
    luminance (or VV/VH/ratio to RGB when 3 channels exist)."""
    img = np.asarray(image, np.float32)
    if scale_vars is not None and config is not None:
        img = reverse_scale_img(img, scale_vars[0], scale_vars[1], config)
    lo, hi = np.nanmin(img), np.nanmax(img)
    img = (img - lo) / max(hi - lo, 1e-12)
    img = adjust_gamma(img, gamma)
    if img.shape[-1] >= 3:
        rgb = img[..., :3]
    else:
        rgb = np.repeat(img[..., :1], 3, axis=-1)
    return (rgb * 255).astype(np.uint8)


def overlay_mask(rgb: np.ndarray, mask: np.ndarray, alpha: float = 0.45) -> np.ndarray:
    """Blend class colors onto an RGB image; class 0 stays transparent."""
    out = rgb.astype(np.float32)
    for cls, color in CLASS_COLORS.items():
        if cls == 0:
            continue
        sel = mask == cls
        out[sel] = (1 - alpha) * out[sel] + alpha * np.asarray(color, np.float32)
    return out.astype(np.uint8)


def prediction_triptych(
    image: np.ndarray,
    prediction: np.ndarray,
    mask: np.ndarray,
    scale_vars=None,
    config: dict | None = None,
) -> dict[str, np.ndarray]:
    """The reference's logged triple: raw image, image+ground truth,
    image+prediction (all uint8 RGB)."""
    base = sar_to_rgb(image, scale_vars, config)
    return {
        "image": base,
        "ground_truth": overlay_mask(base, np.asarray(mask)),
        "prediction": overlay_mask(base, np.asarray(prediction)),
    }


def to_wandb_images(triptych: dict[str, np.ndarray]):
    """Optional wandb.Image wrappers (class labels attached), or None when
    wandb is unavailable."""
    try:
        import wandb
    except ImportError:
        return None
    return {name: wandb.Image(img, caption=name) for name, img in triptych.items()}
