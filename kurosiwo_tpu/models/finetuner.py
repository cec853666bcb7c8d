"""FloodViT -> dense segmentation finetuning head.

Parity with `/root/reference/models/model_utilities.py:22-94`
(FinetunerSegmentation + Decoder): the ViT (pool="cls") returns all patch
tokens; they are reshaped to a (GS, GS) grid with channel = embed dim, then
one of three heads applies:
  mlp     : 1x1 conv -> ReLU -> 1x1 conv  (after bilinear upsample to 224)
  decoder : 3-stage deconv pyramid 1024 -> 128 -> (2x up) -> 64 -> classes
  linear  : single 1x1 conv               (after bilinear upsample to 224)
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn
from einops import rearrange

from ..ops.nn import TorchConvTranspose, resize_bilinear, upsample2x
from .vit import ViT


class DeconvDecoder(nn.Module):
    """Decoder parity (model_utilities.py:22-48): deconv k4/s2/p1 x3 with a
    2x nearest upsample between the first and second."""

    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = TorchConvTranspose(128, 4, 2, 1, dtype=self.dtype, name="deconv1")(x)
        x = nn.relu(x)
        x = upsample2x(x, "nearest")
        x = TorchConvTranspose(64, 4, 2, 1, dtype=self.dtype, name="deconv2")(x)
        x = nn.relu(x)
        x = TorchConvTranspose(self.num_classes, 4, 2, 1, dtype=self.dtype, name="deconv3")(x)
        return x


class FinetunerSegmentation(nn.Module):
    encoder: ViT
    num_classes: int = 3
    head: str = "mlp"  # mlp | decoder | linear
    finetuning_patch_size: int = 16
    image_size: int = 224
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        gs = self.image_size // self.finetuning_patch_size
        tokens = self.encoder(x)  # (B, N, D) — pool="cls" path returns patch tokens
        grid = rearrange(tokens, "b (h w) c -> b h w c", h=gs, w=gs)
        if self.head == "decoder":
            out = DeconvDecoder(self.num_classes, dtype=self.dtype, name="head")(grid)
        elif self.head == "mlp":
            up = resize_bilinear(grid, (self.image_size, self.image_size))
            up = nn.Conv(512, (1, 1), dtype=self.dtype, name="head_fc1")(up)
            up = nn.relu(up)
            out = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="head_fc2")(up)
        else:  # linear
            up = resize_bilinear(grid, (self.image_size, self.image_size))
            out = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="head_fc")(up)
        return out.astype(jnp.float32)
