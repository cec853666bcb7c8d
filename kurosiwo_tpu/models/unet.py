"""UNet / UNet++ / DeepLabv3+ segmentation models.

Reference equivalents are thin smp wrappers
(`/root/reference/models/model_utilities.py:110-157`): smp.Unet,
smp.UnetPlusPlus, smp.DeepLabV3Plus with a configurable resnet encoder and
`in_channels=num_channels, classes=num_classes`. Rebuilt here natively:
same encoder/decoder topology and channel plan as smp's defaults
(decoder_channels (256,128,64,32,16); ASPP rates (12,24,36), os=16).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.pallas_bn import BatchNorm as FusedBatchNorm

from ..ops.nn import (
    ConvBNAct,
    ConvParams,
    conv_same,
    resize_bilinear,
    upsample2x,
    global_avg_pool,
)
from ..ops.phase import depth_to_space, phase_conv_kernel
from .resnet import ResNetEncoder


class DecoderBlock(nn.Module):
    """smp decoder block. `phase=True` (skip-less blocks only) runs the whole
    level in space-to-depth phase space — exact reparameterization that never
    materializes the 2x-upsampled map (ops/phase.py); output stays in phase
    space (B, H, W, 4*features).

    `fold_up=True` (blocks with a skip) is the partial version of the same
    trick: the first conv's kernel is split along Cin into the up-leg and the
    skip-leg; the up-leg is computed as a folded conv on the low-res map
    (d2s afterwards) and summed with the direct skip-leg conv — the 2x
    upsample, the channel concat, and their backwards (segment-sum + split)
    all disappear. Parameters identical to the standard path."""

    features: int
    dtype: Any = jnp.float32
    phase: bool = False
    fold_up: bool = False
    # phase WITH a skip (round 3): the whole level runs on the half-res grid
    # — up-leg folded (no d2s), skip-leg convolved in its s2d view — and the
    # OUTPUT stays phase-space (B, H, W, 4*features). Targets the 112^2
    # decoder level whose C=32 convs/dW showed ~3 ms in the r3 profile.
    phase_skip: bool = False

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        if self.phase:
            assert skip is None
            x = ConvBNAct(self.features, 3, dtype=self.dtype, phase="up")(x, train)
            x = ConvBNAct(self.features, 3, dtype=self.dtype, phase="phase")(x, train)
            return x
        if self.phase_skip and skip is not None:
            y = _PhaseSkipConvBN(self.features, dtype=self.dtype, name="ConvBNAct_0")(
                x, skip, train
            )
            y = ConvBNAct(
                self.features, 3, dtype=self.dtype, phase="phase", name="ConvBNAct_1"
            )(y, train)
            return y
        if self.fold_up and skip is not None:
            y = _FoldUpConvBN(self.features, dtype=self.dtype, name="ConvBNAct_0")(
                x, skip, train
            )
            y = ConvBNAct(self.features, 3, dtype=self.dtype, name="ConvBNAct_1")(y, train)
            return y
        x = upsample2x(x, "nearest")
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
        x = ConvBNAct(self.features, 3, dtype=self.dtype)(x, train)
        x = ConvBNAct(self.features, 3, dtype=self.dtype)(x, train)
        return x


class _PhaseSkipConvBN(nn.Module):
    """conv3x3(cat(up2_nearest(x), skip)) + BN + ReLU computed ENTIRELY on
    the half-res grid with phase-space output: the up-leg kernel fold
    (fold_up2_kernel, no depth_to_space) plus the skip-leg as a phase conv
    over the skip's space-to-depth view. Param tree matches ConvBNAct
    (Conv_0/kernel, BatchNorm_0); exact reparameterization."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        from ..ops.phase import fold_up2_kernel, space_to_depth

        up_c = x.shape[-1]
        kernel, _ = ConvParams(
            (3, 3, up_c + skip.shape[-1], self.features), name="Conv_0"
        )()
        k_up = fold_up2_kernel(kernel[:, :, :up_c]).astype(self.dtype)
        k_skip = phase_conv_kernel(kernel[:, :, up_c:]).astype(self.dtype)
        z = conv_same(x.astype(self.dtype), k_up) + conv_same(
            space_to_depth(skip).astype(self.dtype), k_skip
        )
        from ..ops.pallas_bn import PhaseGroupBatchNorm

        z = PhaseGroupBatchNorm(
            use_running_average=not train, groups=4, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="BatchNorm_0",
        )(z)
        return nn.relu(z)


class _FoldUpConvBN(nn.Module):
    """conv3x3(cat(up2_nearest(x), skip)) + BN + ReLU with the up-leg folded
    to low resolution (exact; see DecoderBlock.fold_up). Param tree matches
    ConvBNAct (Conv_0/kernel, BatchNorm_0)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        from ..ops.phase import depth_to_space, fold_up2_kernel

        up_c = x.shape[-1]
        kernel, _ = ConvParams(
            (3, 3, up_c + skip.shape[-1], self.features), name="Conv_0"
        )()
        k_up = fold_up2_kernel(kernel[:, :, :up_c]).astype(self.dtype)
        k_skip = kernel[:, :, up_c:].astype(self.dtype)
        z = depth_to_space(conv_same(x.astype(self.dtype), k_up)) + conv_same(
            skip.astype(self.dtype), k_skip
        )
        z = FusedBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype
        )(z)
        return nn.relu(z)


class UNet(nn.Module):
    """smp.Unet-equivalent: resnet encoder + 5-step decoder + 3x3 head.

    `phase_finale` (default on, even input sizes only) computes the finest
    decoder level and the head in phase space and interleaves only the
    num_classes-channel logits — the single biggest HBM saving in the train
    step (the 224^2 feature maps and the nearest-up backward disappear).
    Parameters are identical either way."""

    num_classes: int
    backbone: str = "resnet18"
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    dtype: Any = jnp.float32
    phase_finale: bool = True
    phase_level4: bool = False  # measured regression as default; see __call__
    # emit the head's PHASE-space logits (B, H/2, W/2, 4*num_classes) without
    # the depth_to_space interleave — for the phase-native fused loss tail
    # (ops/pallas_tail.fused_ce_cm_phase), whose backward also stays in phase
    # layout. Only meaningful when phase_finale is active.
    return_phase_logits: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = ResNetEncoder(self.backbone, dtype=self.dtype, name="encoder")(x, train)
        # feats: [input, /2, /4, /8, /16, /32]
        y = feats[-1]
        skips = feats[1:-1][::-1] + [None]  # [/16, /8, /4, /2, None]
        use_phase = self.phase_finale and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
        # OPT-IN ONLY (measured 3,266 -> 2,867 patches/s): running the
        # /2-skip level in phase space burns 2.25x dense FLOPs in the folded
        # 3x3 kernels with no HBM win (fold_up already removed the upsample
        # materialization here). Phase-space pays only where it removes HBM
        # traffic — the skip-less finale — not as a lane-width fix.
        phase_l4 = (
            self.phase_level4 and use_phase
            and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0
        )
        for i, (ch, skip) in enumerate(zip(self.decoder_channels, skips)):
            block_phase_skip = phase_l4 and i == 3
            y = DecoderBlock(
                ch,
                dtype=self.dtype,
                phase=use_phase and skip is None,
                fold_up=self.phase_finale,
                phase_skip=block_phase_skip,
            )(y, skip, train)
            if block_phase_skip:
                # next level's "up" fold expects the normal-space 112^2 map
                y = depth_to_space(y)
        if use_phase:
            kernel, bias = ConvParams(
                (3, 3, self.decoder_channels[-1], self.num_classes), use_bias=True, name="head"
            )()
            k = phase_conv_kernel(kernel).astype(self.dtype)
            z = conv_same(y.astype(self.dtype), k) + jnp.tile(bias, 4).astype(self.dtype)
            if self.return_phase_logits:
                return z
            logits = depth_to_space(z)
        else:
            logits = nn.Conv(self.num_classes, (3, 3), padding=1, dtype=self.dtype, name="head")(y)
        # no f32 upcast: the conv output is already bf16-rounded under mixed
        # precision and the loss upcasts internally — returning bf16 halves
        # the logits+grad HBM traffic of the train step
        return logits


class UNetPlusPlus(nn.Module):
    """smp.UnetPlusPlus-equivalent nested dense decoder.

    `fold_up` (default on, even input sizes only) computes every grid node's
    first conv with the folded up-leg (DecoderBlock.fold_up) — the nested
    dense skips never materialize their 2x-upsampled maps. Exact
    reparameterization; parameters identical (tests/test_phase.py)."""

    num_classes: int
    backbone: str = "resnet18"
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    dtype: Any = jnp.float32
    fold_up: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = ResNetEncoder(self.backbone, dtype=self.dtype, name="encoder")(x, train)
        # Dense grid X[i][j]: i = resolution level (0 = /2, highest kept), j = depth.
        # X[i][j] = Block(up(X[i+1][j-1]), skip=cat(X[i][0..j-1])).
        enc = feats[1:]  # [/2, /4, /8, /16, /32]
        levels = len(enc)
        node_ch = [32, 64, 128, 256]  # out channels per level i (matches plan)
        grid: dict[tuple[int, int], jnp.ndarray] = {(i, 0): enc[i] for i in range(levels)}
        fold = self.fold_up and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
        for j in range(1, levels):
            for i in range(0, levels - j):
                skip = jnp.concatenate([grid[(i, k)] for k in range(j)], axis=-1)
                grid[(i, j)] = DecoderBlock(
                    node_ch[i], dtype=self.dtype, fold_up=fold, name=f"dec_{i}_{j}"
                )(grid[(i + 1, j - 1)], skip, train)
        y = grid[(0, levels - 1)]  # at /2 resolution
        y = upsample2x(y, "nearest")  # back to input resolution
        y = ConvBNAct(self.decoder_channels[-1], 3, dtype=self.dtype, name="final_block")(y, train)
        logits = nn.Conv(self.num_classes, (3, 3), padding=1, dtype=self.dtype, name="head")(y)
        return logits.astype(jnp.float32)


class ASPP(nn.Module):
    features: int = 256
    rates: Sequence[int] = (12, 24, 36)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1:3]
        branches = [ConvBNAct(self.features, 1, padding=0, dtype=self.dtype)(x, train)]
        for r in self.rates:
            branches.append(
                ConvBNAct(self.features, 3, dilation=r, dtype=self.dtype)(x, train)
            )
        gp = global_avg_pool(x)
        gp = ConvBNAct(self.features, 1, padding=0, dtype=self.dtype)(gp, train)
        gp = resize_bilinear(gp, (h, w))
        branches.append(gp)
        y = jnp.concatenate(branches, axis=-1)
        y = ConvBNAct(self.features, 1, padding=0, dtype=self.dtype)(y, train)
        return y


class DeepLabV3Plus(nn.Module):
    """smp.DeepLabV3Plus-equivalent: os=16 resnet trunk, ASPP, low-level
    feature fusion at /4, 4x bilinear upsample head."""

    num_classes: int
    backbone: str = "resnet18"
    decoder_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = ResNetEncoder(
            self.backbone, dilations=(False, False, True), dtype=self.dtype, name="encoder"
        )(x, train)
        high = ASPP(self.decoder_channels, dtype=self.dtype)(feats[-1], train)  # /16
        high = resize_bilinear(high, feats[2].shape[1:3])  # -> /4
        low = ConvBNAct(48, 1, padding=0, dtype=self.dtype)(feats[2], train)
        y = jnp.concatenate([high, low], axis=-1)
        y = ConvBNAct(self.decoder_channels, 3, dtype=self.dtype)(y, train)
        y = ConvBNAct(self.decoder_channels, 3, dtype=self.dtype)(y, train)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="head")(y)
        logits = resize_bilinear(logits, x.shape[1:3])
        return logits.astype(jnp.float32)
