"""ADHR-CDNet: Attentive Differential High-Resolution change detection
(Zhang et al., TGRS 2022).

Parity with `/root/reference/models/adhr_cdnet.py:111-576`:
  * shared stem conv on both frames; per-scale ABSOLUTE-DIFFERENCE injection:
    d_s = |VGG_s(x_s) - VGG_s(y_s)| concatenated into each newly-created
    branch then 1x1-fused (adhr_cdnet.py:309-312, 347-349, ...);
  * HRNet-style parallel branches at 4 resolutions (32/64/128/256 ch), each
    stage = 4 residual BasicBlocks (ReLU applied AFTER the residual add,
    outside the block — reference calls acf on the block output);
  * exchange units: 1x1 conv + BN + bilinear upsample for coarse->fine,
    strided 3x3 conv chains for fine->coarse, merged by SUM;
  * Bottleneck_n quirk: the shortcut path reuses bn3 (the same BatchNorm as
    the main path's last conv, adhr_cdnet.py:84-88) — replicated;
  * head: branches upsampled to 1/1 scale, concat -> 3x3 conv(512) -> 1x1
    conv(4) -> softmax attention weights -> weighted branch sum -> 1x1 to
    classes -> SOFTMAX inside the model (trainer CE consumes probabilities).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.pallas_bn import BatchNorm as FusedBatchNorm

from ..ops.nn import max_pool, resize_bilinear

Dtype = Any


class _ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel), strides=self.stride, padding=pad, dtype=self.dtype)(x)
        return FusedBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype)(x)


class BasicBlock(nn.Module):
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.relu(_ConvBN(self.features, dtype=self.dtype)(x, train))
        y = _ConvBN(self.features, dtype=self.dtype)(y, train)
        return y + x  # ReLU applied by the caller (reference acf placement)


class Bottleneck(nn.Module):
    mid: int
    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.relu(_ConvBN(self.mid, 1, dtype=self.dtype)(x, train))
        y = nn.relu(_ConvBN(self.mid, 3, dtype=self.dtype)(y, train))
        y = _ConvBN(self.out, 1, dtype=self.dtype)(y, train)
        return y + x


class BottleneckN(nn.Module):
    """Bottleneck with projected shortcut; the shortcut shares the main
    path's final BatchNorm (reference bn3 reuse, adhr_cdnet.py:84-88)."""

    mid: int
    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn3 = FusedBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn3")
        y = nn.relu(_ConvBN(self.mid, 1, dtype=self.dtype)(x, train))
        y = nn.relu(_ConvBN(self.mid, 3, dtype=self.dtype)(y, train))
        y = bn3(nn.Conv(self.out, (1, 1), dtype=self.dtype, name="conv3")(y))
        sc = bn3(nn.Conv(self.out, (1, 1), dtype=self.dtype, name="conv1_1")(x))
        return y + sc


class VGGBlock(nn.Module):
    mid: int
    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.relu(_ConvBN(self.mid, dtype=self.dtype)(x, train))
        return nn.relu(_ConvBN(self.out, dtype=self.dtype)(x, train))


class _Branch4(nn.Module):
    """4 residual BasicBlocks with post-add ReLU."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(4):
            x = nn.relu(BasicBlock(self.features, self.dtype, name=f"b{i + 1}")(x, train))
        return x


class _DownChain(nn.Module):
    """Chain of strided 3x3 conv+BN(+ReLU between) for fine->coarse exchange."""

    channels: tuple
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, ch in enumerate(self.channels):
            x = _ConvBN(ch, 3, 2, dtype=self.dtype, name=f"d{i}")(x, train)
            if i < len(self.channels) - 1:
                x = nn.relu(x)
        return x


class _UpLink(nn.Module):
    """1x1 conv + BN + bilinear upsample for coarse->fine exchange."""

    features: int
    scale: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _ConvBN(self.features, 1, dtype=self.dtype)(x, train)
        return resize_bilinear(x, (x.shape[1] * self.scale, x.shape[2] * self.scale))


class ADHR(nn.Module):
    num_classes: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y, train: bool = False):
        dt = self.dtype
        stem = nn.Conv(32, (3, 3), padding=1, dtype=dt, name="conv0_0")
        x1s, y1s = stem(x), stem(y)
        d1 = jnp.abs(x1s - y1s)
        fused = nn.Conv(32, (3, 3), padding=1, dtype=dt, name="conv0")(jnp.concatenate([x, y], axis=-1))
        h = jnp.concatenate([d1, fused], axis=-1)
        h = FusedBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=dt, name="bn0")(h)
        h = nn.relu(h)

        # part one: 4 bottlenecks at full res (64 -> 256 ch)
        h = nn.relu(BottleneckN(64, 256, dt, name="conv1_1_1")(h, train))
        for i in (2, 3, 4):
            h = nn.relu(Bottleneck(64, 256, dt, name=f"conv1_1_{i}")(h, train))
        b1 = nn.relu(_ConvBN(32, 3, 1, dtype=dt, name="trans1_1")(h, train))
        b2 = nn.relu(_ConvBN(64, 3, 2, dtype=dt, name="trans1_2")(h, train))

        # differential injection stream (shared VGG per frame)
        vgg2 = VGGBlock(64, 64, dt, name="conv2")
        xp, yp = max_pool(x1s), max_pool(y1s)
        x2s, y2s = vgg2(xp, train), vgg2(yp, train)
        d2 = jnp.abs(x2s - y2s)
        b2 = nn.Conv(64, (1, 1), dtype=dt, name="c2")(jnp.concatenate([b2, d2], axis=-1))

        # part two
        b1 = _Branch4(32, dt, name="stage2_b1")(b1, train)
        b2 = _Branch4(64, dt, name="stage2_b2")(b2, train)
        n1 = nn.relu(_UpLink(32, 2, dt, name="t2_2to1")(b2, train) + b1)
        n2 = nn.relu(_DownChain((64,), dt, name="t2_1to2")(b1, train) + b2)
        n3 = nn.relu(
            _DownChain((64, 128), dt, name="t2_1to3")(b1, train)
            + _DownChain((128,), dt, name="t2_2to3")(b2, train)
        )
        b1, b2, b3 = n1, n2, n3

        vgg3 = VGGBlock(128, 128, dt, name="conv3")
        xp, yp = max_pool(x2s), max_pool(y2s)
        x3s, y3s = vgg3(xp, train), vgg3(yp, train)
        d3 = jnp.abs(x3s - y3s)
        b3 = nn.Conv(128, (1, 1), dtype=dt, name="c3")(jnp.concatenate([b3, d3], axis=-1))

        # part three
        b1 = _Branch4(32, dt, name="stage3_b1")(b1, train)
        b2 = _Branch4(64, dt, name="stage3_b2")(b2, train)
        b3 = _Branch4(128, dt, name="stage3_b3")(b3, train)
        n1 = nn.relu(
            b1 + _UpLink(32, 2, dt, name="t3_2to1")(b2, train) + _UpLink(32, 4, dt, name="t3_3to1")(b3, train)
        )
        n2 = nn.relu(
            _DownChain((64,), dt, name="t3_1to2")(b1, train) + b2 + _UpLink(64, 2, dt, name="t3_3to2")(b3, train)
        )
        n3 = nn.relu(
            b3
            + _DownChain((64, 128), dt, name="t3_1to3")(b1, train)
            + _DownChain((128,), dt, name="t3_2to3")(b2, train)
        )
        n4 = nn.relu(
            _DownChain((64, 128, 256), dt, name="t3_1to4")(b1, train)
            + _DownChain((128, 256), dt, name="t3_2to4")(b2, train)
            + _DownChain((256,), dt, name="t3_3to4")(b3, train)
        )
        b1, b2, b3, b4 = n1, n2, n3, n4

        vgg4 = VGGBlock(256, 256, dt, name="conv4")
        xp, yp = max_pool(x3s), max_pool(y3s)
        x4s, y4s = vgg4(xp, train), vgg4(yp, train)
        d4 = jnp.abs(x4s - y4s)
        b4 = nn.Conv(256, (1, 1), dtype=dt, name="c4")(jnp.concatenate([b4, d4], axis=-1))

        # part four (no exchange after; straight to fusion)
        b1 = _Branch4(32, dt, name="stage4_b1")(b1, train)
        b2 = _Branch4(64, dt, name="stage4_b2")(b2, train)
        b3 = _Branch4(128, dt, name="stage4_b3")(b3, train)
        b4 = _Branch4(256, dt, name="stage4_b4")(b4, train)

        f1 = b1
        f2 = _UpLink(32, 2, dt, name="f2")(b2, train)
        f3 = _UpLink(32, 4, dt, name="f3")(b3, train)
        f4 = _UpLink(32, 8, dt, name="f4")(b4, train)
        cat = jnp.concatenate([f1, f2, f3, f4], axis=-1)

        att = nn.Conv(512, (3, 3), padding=1, dtype=dt, name="attention1")(cat)
        att = nn.Conv(4, (1, 1), dtype=dt, name="attention2")(att)
        w = jax.nn.softmax(att.astype(jnp.float32), axis=-1)
        out1 = (
            f1.astype(jnp.float32) * w[..., 0:1]
            + f2.astype(jnp.float32) * w[..., 1:2]
            + f3.astype(jnp.float32) * w[..., 2:3]
            + f4.astype(jnp.float32) * w[..., 3:4]
        )
        logits = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32, name="final")(out1)
        return jax.nn.softmax(logits, axis=-1)
