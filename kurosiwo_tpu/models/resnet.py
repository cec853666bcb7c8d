"""ResNet backbones (NHWC, flax.linen), used as:
  * the UNet / UNet++ / DeepLabv3+ encoder (reference uses smp's torchvision
    resnet18/34/50 encoders, models/model_utilities.py:110-157), and
  * BiT-CD's dilated resnet18 trunk (reference: models/bit_cd.py:177-413,
    which vendors a torchvision-style ResNet with replace_stride_with_dilation).

Returns the standard 5-stage feature pyramid; strides can be replaced with
dilation per-stage for output-stride-8/16 trunks (DeepLab, BiT).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.nn import ConvBNAct, max_pool


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = ConvBNAct(self.features, 3, self.stride, dilation=self.dilation, dtype=self.dtype)(x, train)
        y = ConvBNAct(self.features, 3, 1, dilation=self.dilation, act=None, dtype=self.dtype)(y, train)
        if self.downsample:
            identity = ConvBNAct(self.features, 1, self.stride, act=None, dtype=self.dtype, padding=0)(x, train)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = ConvBNAct(self.features, 1, 1, dtype=self.dtype, padding=0)(x, train)
        y = ConvBNAct(self.features, 3, self.stride, dilation=self.dilation, dtype=self.dtype)(y, train)
        y = ConvBNAct(self.features * 4, 1, 1, act=None, dtype=self.dtype, padding=0)(y, train)
        if self.downsample:
            identity = ConvBNAct(self.features * 4, 1, self.stride, act=None, dtype=self.dtype, padding=0)(x, train)
        return nn.relu(y + identity)


RESNET_SPECS = {
    "resnet18": (BasicBlock, (2, 2, 2, 2)),
    "resnet34": (BasicBlock, (3, 4, 6, 3)),
    "resnet50": (Bottleneck, (3, 4, 6, 3)),
    "resnet101": (Bottleneck, (3, 4, 23, 3)),
}


class ResNetEncoder(nn.Module):
    """5-stage pyramid: [x, s1(/2), s2(/4), s3(/8), s4(/16), s5(/32)].

    `dilations` replaces stage strides with dilation (torchvision's
    replace_stride_with_dilation) for output-stride-8/16 trunks.
    """

    backbone: str = "resnet18"
    width: int = 64
    dilations: Sequence[bool] = (False, False, False)  # stages 3..5
    # BiT-CD's vendored torchvision BasicBlock SILENTLY clamps dilation > 1
    # back to 1 (bit_cd.py:95-97): its "dilated" resnet18 stages are stride-1
    # NON-dilated convs. Set for checkpoint parity with that trunk.
    clamp_basic_dilation: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block, depths = RESNET_SPECS[self.backbone]
        feats = [x]
        y = ConvBNAct(self.width, 7, 2, dtype=self.dtype, padding=3, name="stem")(x, train)
        feats.append(y)
        y = max_pool(y, 3, 2, padding=[(1, 1), (1, 1)])
        dilation = 1
        for stage_idx, depth in enumerate(depths):
            features = self.width * (2**stage_idx)
            stride = 1 if stage_idx == 0 else 2
            if stage_idx > 0 and self.dilations[stage_idx - 1]:
                dilation *= stride
                stride = 1
            block_dilation = dilation
            if self.clamp_basic_dilation and block is BasicBlock and block_dilation > 1:
                block_dilation = 1
            for i in range(depth):
                expansion = 4 if block is Bottleneck else 1
                needs_ds = i == 0 and (stride != 1 or y.shape[-1] != features * expansion)
                y = block(
                    features,
                    stride=stride if i == 0 else 1,
                    dilation=block_dilation,
                    downsample=needs_ds,
                    dtype=self.dtype,
                    name=f"layer{stage_idx + 1}_{i}",
                )(y, train)
            feats.append(y)
        return feats
