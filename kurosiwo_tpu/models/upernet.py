"""UperNet semantic segmentation with ConvNeXt / Swin backbones.

Reference counterpart: `/root/reference/models/upernet.py:21-81`, which pulls
HuggingFace `openmmlab/upernet-{swin,convnext}-{tiny,small,base}` and patches
the first conv for arbitrary input channels + swaps the classifier head.
Rebuilt natively (no hub access in this environment): ConvNeXt backbones from
scratch + the standard UperNet decode head (PSP pooling on the deepest stage,
top-down FPN, fused 3x3 head), with the same {tiny,small,base} size grid.
Pretrained ImageNet weights can be loaded via the checkpoint converter when a
local torch checkpoint is supplied; otherwise init is random (documented
deviation — the environment has no network egress).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.nn import ConvBNAct, resize_bilinear

CONVNEXT_SPECS = {
    "convnext_tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "convnext_small": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "convnext_base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
}
SWIN_SPECS = {
    "swin_tiny": ((2, 2, 6, 2), 96, (3, 6, 12, 24)),
    "swin_small": ((2, 2, 18, 2), 96, (3, 6, 12, 24)),
    "swin_base": ((2, 2, 18, 2), 128, (4, 8, 16, 32)),
}


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale_init: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(
            self.dim, (7, 7), padding=3, feature_group_count=self.dim, dtype=self.dtype, name="dwconv"
        )(x)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(y)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(y)
        gamma = self.param("gamma", nn.initializers.constant(self.layer_scale_init), (self.dim,), jnp.float32)
        return x + y * gamma.astype(y.dtype)


class ConvNeXt(nn.Module):
    backbone: str = "convnext_tiny"
    dtype: Any = jnp.float32
    spec: Any = None  # optional (depths, dims) override (tests, custom sizes)

    @nn.compact
    def __call__(self, x, train: bool = False):
        depths, dims = self.spec or CONVNEXT_SPECS[self.backbone]
        feats = []
        for s in range(4):
            if s == 0:
                x = nn.Conv(dims[0], (4, 4), strides=4, dtype=self.dtype, name="stem")(x)
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="stem_norm")(x)
            else:
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"down_norm{s}")(x)
                x = nn.Conv(dims[s], (2, 2), strides=2, dtype=self.dtype, name=f"down{s}")(x)
            for b in range(depths[s]):
                x = ConvNeXtBlock(dims[s], dtype=self.dtype, name=f"stage{s}_block{b}")(x)
            feats.append(nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"out_norm{s}")(x))
        return feats  # strides 4, 8, 16, 32


class PSPModule(nn.Module):
    features: int
    bins: Sequence[int] = (1, 2, 3, 6)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..ops.nn import adaptive_avg_pool

        h, w = x.shape[1:3]
        outs = [x]
        for i, b in enumerate(self.bins):
            # exact torch AdaptiveAvgPool2d semantics (HF UperNet parity,
            # incl. non-divisible maps like 7x7 -> bins 2/3/6)
            pooled = adaptive_avg_pool(x, (b, b))
            pooled = ConvBNAct(self.features, 1, padding=0, dtype=self.dtype, name=f"branch{i}")(pooled, train)
            outs.append(resize_bilinear(pooled, (h, w)))
        y = jnp.concatenate(outs, axis=-1)
        return ConvBNAct(self.features, 3, dtype=self.dtype, name="bottleneck")(y, train)


class UperNetHead(nn.Module):
    channels: int = 512
    num_classes: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        # PSP on deepest stage
        laterals = []
        for i, f in enumerate(feats[:-1]):
            laterals.append(ConvBNAct(self.channels, 1, padding=0, dtype=self.dtype, name=f"lateral{i}")(f, train))
        top = PSPModule(self.channels, dtype=self.dtype, name="psp")(feats[-1], train)
        laterals.append(top)
        # top-down pathway
        for i in range(len(laterals) - 1, 0, -1):
            up = resize_bilinear(laterals[i], laterals[i - 1].shape[1:3])
            laterals[i - 1] = laterals[i - 1] + up
        outs = []
        for i, l in enumerate(laterals[:-1]):
            outs.append(ConvBNAct(self.channels, 3, dtype=self.dtype, name=f"fpn_conv{i}")(l, train))
        outs.append(laterals[-1])
        size = outs[0].shape[1:3]
        outs = [o if o.shape[1:3] == size else resize_bilinear(o, size) for o in outs]
        y = jnp.concatenate(outs, axis=-1)
        y = ConvBNAct(self.channels, 3, dtype=self.dtype, name="fpn_bottleneck")(y, train)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="classifier")(y)


class UperNet(nn.Module):
    num_classes: int = 3
    backbone: str = "convnext_tiny"
    channels: int = 512
    dtype: Any = jnp.float32
    backbone_spec: Any = None  # optional size override forwarded to the backbone

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.backbone in CONVNEXT_SPECS or (
            self.backbone_spec and self.backbone.startswith("convnext")
        ):
            feats = ConvNeXt(self.backbone, dtype=self.dtype, spec=self.backbone_spec, name="backbone")(x, train)
        elif self.backbone in SWIN_SPECS or (
            self.backbone_spec and self.backbone.startswith("swin")
        ):
            from .swin import SwinTransformer

            feats = SwinTransformer(
                self.backbone, dtype=self.dtype, spec=self.backbone_spec, name="backbone"
            )(x, train)
        else:
            raise NotImplementedError(f"UperNet backbone {self.backbone!r}")
        logits = UperNetHead(self.channels, self.num_classes, self.dtype, name="decode_head")(feats, train)
        logits = resize_bilinear(logits, x.shape[1:3])
        return logits.astype(jnp.float32)
