"""HFA-Net: High-Frequency Attention siamese change detection.

Parity with `/root/reference/models/hfanet.py`:
  * fixed (non-learned) high-pass banks: isotropic Sobel in 8 directions +
    3x3 Gaussian smooth, applied as full CxC convs whose every (out, in) pair
    carries the SAME 3x3 kernel (hfanet.py:40-141). That weight structure
    means each output channel equals K * sum_i x_i — so we compute the
    channel-sum once, filter it with single-channel kernels, and broadcast:
    numerically identical, C^2x fewer MACs (a genuine TPU win; the reference
    burns dense 1024x1024 convs on constant kernels);
  * the reference's `if self.filter == 'Isotropic_Sobel' or 'Krisch'` branch
    is always true (hfanet.py:160), so the 8-direction Sobel path is the only
    one ever taken — replicated;
  * HFAB = SpatialAttentionStage (mini-UNet -> sigmoid spatial mask, PReLU
    activations) then HighFrequencyEnhancementStage (SE-style channel gate +
    high-pass branch, 1x1 fusion);
  * 5-stage siamese encoder (64..1024), 1x1 fusion of concatenated
    bi-temporal skips, decoder with bilinear(align_corners=True) upsamples;
  * softmax INSIDE the model (decoder `sm`, hfanet.py:610) — trainer CE then
    consumes probabilities as logits, replicated faithfully.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.pallas_bn import BatchNorm as FusedBatchNorm

from ..ops.nn import TorchConvTranspose, max_pool, resize_bilinear

_SOBEL = [
    [[1, math.sqrt(2), 1], [0, 0, 0], [-1, -math.sqrt(2), -1]],
    [[0, 1, math.sqrt(2)], [-1, 0, 1], [-math.sqrt(2), -1, 0]],
    [[-1, 0, 1], [-math.sqrt(2), 0, math.sqrt(2)], [-1, 0, 1]],
    [[math.sqrt(2), 1, 0], [1, 0, -1], [0, -1, -math.sqrt(2)]],
]
_SMOOTH = [[1, 2, 1], [2, 4, 2], [1, 2, 1]]


def _conv_const(x: jnp.ndarray, kernel2d) -> jnp.ndarray:
    """Single-channel 3x3 conv with a constant kernel; x is (B, H, W, 1)."""
    k = jnp.asarray(kernel2d, x.dtype)[:, :, None, None]  # HWIO
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def high_frequency(x: jnp.ndarray, mode: str = "filtering", a: float = 1.0, k: float = 0.5,
                   smooth: bool = True) -> jnp.ndarray:
    """HighFrequencyModule semantics with the channel-sum factorization.

    Reference weights are W[o, i] = K (same kernel for every in/out pair), so
    conv(x, W)[o] = (K * sum_i x_i); channel count only scales the smooth
    stage's /16 normalization (the reference divides by 16 regardless of C —
    replicated: smooth output = conv(sum_i x_i, gauss)/16).
    """
    c = x.shape[-1]
    s = jnp.sum(x, axis=-1, keepdims=True)  # (B, H, W, 1)
    if smooth:
        smoothed = _conv_const(s, _SMOOTH) / 16.0  # per-channel smoothed value
        # the Sobel stage's dense conv re-sums over channels, and after the
        # smooth every channel holds the same value -> factor C
        sobel_in = smoothed * c
        base = jnp.broadcast_to(smoothed, x.shape[:-1] + (c,))
    else:
        sobel_in = s
        base = x
    # 8 directions = 4 Sobel kernels + their negations. The reference sums
    # all 8 filtered maps and divides by 8; since conv is linear and the
    # kernels cancel pairwise, the sum is identically zero — but we keep the
    # computation literal for bit-level parity with converted checkpoints.
    hf = sum(_conv_const(sobel_in, kd) for kd in _SOBEL) + sum(
        _conv_const(sobel_in, [[-v for v in row] for row in kd]) for kd in _SOBEL
    )
    hf = hf / 8.0
    hf = jnp.broadcast_to(hf, x.shape[:-1] + (c,))
    if mode == "filtering":
        return hf
    # high_boost_filtering: A * (smoothed) x + K * hf
    return a * base + k * hf


class PReLU(nn.Module):
    """torch nn.PReLU(num_parameters=C): per-channel learned negative slope."""

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.constant(0.25), (x.shape[-1],), jnp.float32)
        return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)


class ConvBNPReLU(nn.Module):
    features: int
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel), padding=self.kernel // 2, dtype=self.dtype)(x)
        x = FusedBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype)(x)
        return PReLU()(x)


class SpatialAttentionStage(nn.Module):
    """Mini-UNet producing a sigmoid spatial mask; out = x + x * mask."""

    last_layer: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        residual = x
        x = ConvBNPReLU(c // 2, dtype=self.dtype)(x, train)
        x = ConvBNPReLU(c // 2, dtype=self.dtype)(x, train)
        skip1 = x
        x = max_pool(x)
        x = ConvBNPReLU(c // 4, dtype=self.dtype)(x, train)
        x = ConvBNPReLU(c // 4, dtype=self.dtype)(x, train)
        skip2 = x
        x = max_pool(x)
        x = ConvBNPReLU(c // 8, dtype=self.dtype)(x, train)
        x = ConvBNPReLU(c // 8, dtype=self.dtype)(x, train)
        if self.last_layer:
            x = TorchConvTranspose(c // 16, 3, 3, 2, output_padding=2, dtype=self.dtype)(x)
        else:
            x = TorchConvTranspose(c // 16, 3, 2, 1, output_padding=1, dtype=self.dtype)(x)
        x = jnp.concatenate([x, skip2], axis=-1)
        x = ConvBNPReLU(c // 16, dtype=self.dtype)(x, train)
        x = ConvBNPReLU(c // 16, dtype=self.dtype)(x, train)
        x = TorchConvTranspose(c // 32, 3, 2, 1, output_padding=1, dtype=self.dtype)(x)
        x = jnp.concatenate([x, skip1], axis=-1)
        x = ConvBNPReLU(c // 32, dtype=self.dtype)(x, train)
        x = ConvBNPReLU(c // 32, dtype=self.dtype)(x, train)
        x = ConvBNPReLU(c // 64, kernel=1, dtype=self.dtype)(x, train)
        x = nn.Conv(1, (1, 1), dtype=self.dtype)(x)
        x = FusedBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype)(x)
        mask = nn.sigmoid(x)
        return residual + residual * mask


class HighFrequencyEnhancementStage(nn.Module):
    """SE-style channel attention + high-pass branch, fused by 1x1 conv."""

    ratio: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        residual = x
        hf = high_frequency(x, mode="filtering", smooth=True)
        g = jnp.mean(x, axis=(1, 2))  # (B, C)
        g = nn.Dense(int(c * self.ratio), dtype=self.dtype, name="fc1")(g)
        g = PReLU()(g)
        g = nn.Dense(c, dtype=self.dtype, name="fc2")(g)
        g = nn.sigmoid(g)[:, None, None, :]
        out = residual + residual * g
        out = jnp.concatenate([out, hf], axis=-1)
        return nn.Conv(c, (1, 1), dtype=self.dtype, name="fusion")(out)


class HFAB(nn.Module):
    last_layer: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = SpatialAttentionStage(self.last_layer, self.dtype, name="sa")(x, train)
        return HighFrequencyEnhancementStage(dtype=self.dtype, name="hf")(x, train)


class _EncLayer(nn.Module):
    features: int
    last_layer: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = HFAB(self.last_layer, self.dtype, name="hfab1")(x, train)
        x = ConvBNPReLU(self.features, dtype=self.dtype, name="conv1")(x, train)
        x = HFAB(self.last_layer, self.dtype, name="hfab2")(x, train)
        x = ConvBNPReLU(self.features, dtype=self.dtype, name="conv2")(x, train)
        return x


class HFAEncoder(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = high_frequency(x, mode="high_boost_filtering", a=1.0, k=0.5, smooth=True)
        x = nn.Conv(64, (1, 1), dtype=self.dtype, name="pre_treat")(x)
        skips = []
        for i, (feat, last) in enumerate([(64, False), (128, False), (256, False), (512, False), (1024, True)]):
            x = _EncLayer(feat, last, self.dtype, name=f"layer_{i + 1}")(x, train)
            if i < 4:
                skips.append(x)
                x = max_pool(x)
        return x, skips


class _UpBlock(nn.Module):
    features: int  # output channels of the stage
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        x = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="reduce")(x)
        x = resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2), align_corners=True)
        x = jnp.concatenate([x, skip], axis=-1)
        x = ConvBNPReLU(self.features, dtype=self.dtype, name="conv1")(x, train)
        x = HFAB(dtype=self.dtype, name="hfab1")(x, train)
        x = ConvBNPReLU(self.features, dtype=self.dtype, name="conv2")(x, train)
        x = HFAB(dtype=self.dtype, name="hfab2")(x, train)
        return x


class HFANet(nn.Module):
    num_classes: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        enc = HFAEncoder(self.dtype, name="encoder")
        b1, s1 = enc(x1, train)
        b2, s2 = enc(x2, train)
        fused_skips = []
        for i, (a, b) in enumerate(zip(s1, s2)):
            f = nn.Conv(a.shape[-1], (1, 1), dtype=self.dtype, name=f"skip_fusion_{i + 1}")(
                jnp.concatenate([a, b], axis=-1)
            )
            fused_skips.append(f)
        bottom = nn.Conv(1024, (1, 1), dtype=self.dtype, name="bottom_fusion")(
            jnp.concatenate([b1, b2], axis=-1)
        )
        x = bottom
        for i, feat in enumerate([512, 256, 128, 64]):
            x = _UpBlock(feat, self.dtype, name=f"up_{i + 1}")(x, fused_skips[3 - i], train)
        x = ConvBNPReLU(32, dtype=self.dtype, name="out1")(x, train)
        x = ConvBNPReLU(32, dtype=self.dtype, name="out2")(x, train)
        x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="head")(x)
        return jax.nn.softmax(x.astype(jnp.float32), axis=-1)
