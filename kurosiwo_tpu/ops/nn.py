"""NN building blocks shared across the model zoo (flax.linen, NHWC).

TPU-native conventions used throughout the zoo:
  * NHWC layout (XLA's preferred conv layout on TPU; the reference is NCHW).
  * bf16 compute / f32 params via the (dtype, param_dtype) pair on modules.
  * torch-parity numerics where they matter for checkpoint conversion:
    BatchNorm eps 1e-5 / torch momentum 0.1 (== flax momentum 0.9),
    bilinear resize half-pixel centers == torch align_corners=False,
    explicit align_corners=True path for the models that use it.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .pallas_bn import BatchNorm as FusedBatchNorm
from .phase import fold_up2_kernel, phase_conv_kernel

Dtype = Any


class ConvParams(nn.Module):
    """Parameter holder mirroring nn.Conv's tree (kernel[, bias]) for convs
    whose kernel is transformed at trace time (phase-space folds). Named
    "Conv_0"/"head"/... so checkpoints are interchangeable with the standard
    nn.Conv path."""

    shape: tuple  # canonical (kh, kw, cin, cout)
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(), self.shape, jnp.float32)
        bias = (
            self.param("bias", nn.initializers.zeros, (self.shape[-1],), jnp.float32)
            if self.use_bias
            else None
        )
        return kernel, bias


def conv_same(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 SAME conv, NHWC/HWIO."""
    p = (w.shape[0] - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(p, p), (p, p)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def max_pool(x: jnp.ndarray, window: int = 2, stride: int = 2, padding="VALID") -> jnp.ndarray:
    """torch MaxPool2d(window, stride) on NHWC.

    With KUROSIWO_MAXPOOL_MASK=1, the two pooling geometries the zoo uses
    (2x2/s2 VALID everywhere; 3x3/s2 pad(1,1) in the ResNet stem,
    /root/reference/models/bit_cd.py:241-class stems) route through a
    custom-vjp whose backward is pure elementwise compare+select math
    instead of XLA's select_and_scatter (a windowed scatter that lowers to
    its own fusion-fencing op — 2.3% of the UNet train step in the r3
    profile). Forward is identical (same reduce_window). The backward is
    the "all argmax ties" subgradient: every in-window position equal to
    the window max receives dy, where select_and_scatter routes each
    window's dy to a single argmax. The two differ only on exact bf16
    ties; for post-ReLU feature maps the dominant tie class (all-zero
    windows) is gradient-dead anyway because the upstream ReLU backward
    zeroes those lanes."""
    if _use_maxpool_mask():
        b, h, w, c = x.shape
        if window == 2 and stride == 2 and padding == "VALID" and h % 2 == 0 and w % 2 == 0:
            return _max_pool_mask_w2s2(x)
        if (
            window == 3
            and stride == 2
            and padding == [(1, 1), (1, 1)]
            and h % 2 == 0
            and w % 2 == 0
        ):
            return _max_pool_mask_w3s2(x)
    return nn.max_pool(x, (window, window), strides=(stride, stride), padding=padding)


def _use_maxpool_mask() -> bool:
    """Elementwise mask backward for max pooling — OPT-IN via
    KUROSIWO_MAXPOOL_MASK=1 for the hardware A/B (pure XLA: no Pallas
    boundary, so the conv-layout poison class documented in
    docs/performance.md does not apply). The in-step A/B decides whether
    it ever defaults on."""
    import os

    return os.environ.get("KUROSIWO_MAXPOOL_MASK") == "1"


@jax.custom_vjp
def _max_pool_mask_w2s2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, (2, 2), strides=(2, 2), padding="VALID")


def _max_pool_mask_w2s2_fwd(x):
    y = _max_pool_mask_w2s2(x)
    return y, (x, y)


def _max_pool_mask_w2s2_bwd(res, dy):
    x, y = res
    b, ho, wo, c = y.shape
    # non-overlapping windows: broadcast y/dy back to the input grid
    # (integer-factor nearest up == broadcast+reshape, the measured
    # replacement for gather-based resize on this hardware)
    shape6 = (b, ho, 2, wo, 2, c)
    yu = jnp.broadcast_to(y[:, :, None, :, None, :], shape6).reshape(x.shape)
    dyu = jnp.broadcast_to(dy[:, :, None, :, None, :], shape6).reshape(x.shape)
    return (jnp.where(x == yu, dyu, jnp.zeros((), x.dtype)).astype(x.dtype),)


_max_pool_mask_w2s2.defvjp(_max_pool_mask_w2s2_fwd, _max_pool_mask_w2s2_bwd)


@jax.custom_vjp
def _max_pool_mask_w3s2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])


def _max_pool_mask_w3s2_fwd(x):
    y = _max_pool_mask_w3s2(x)
    return y, (x, y)


def _max_pool_mask_w3s2_bwd(res, dy):
    """dx for the 3x3/s2 pad(1,1) pool on even H/W, assembled in phase
    space. Input row p belongs to output window o when p = 2o-1+t,
    t in {0,1,2}: even rows (p=2k) see exactly one window (o=k, t=1),
    odd rows (p=2k+1) see two (o=k t=2, o=k+1 t=0) — 1/2/2/4 terms for
    the (even,even)/(even,odd)/(odd,even)/(odd,odd) phases, 9 total (the
    9 taps). All terms are elementwise compares at the output resolution;
    the phase merge back to the input grid is the broadcast+reshape
    interleave (no scatter anywhere)."""
    x, y = res
    x_ee = x[:, 0::2, 0::2]
    x_eo = x[:, 0::2, 1::2]
    x_oe = x[:, 1::2, 0::2]
    x_oo = x[:, 1::2, 1::2]

    # o = k+1 neighbors; pads are (y=0, dy=0) pairs so the out-of-range
    # term is exactly zero regardless of the compare
    def shift_r(a):
        return jnp.pad(a[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)))

    def shift_c(a):
        return jnp.pad(a[:, :, 1:], ((0, 0), (0, 0), (0, 1), (0, 0)))

    y_r, dy_r = shift_r(y), shift_r(dy)
    y_c, dy_c = shift_c(y), shift_c(dy)
    y_rc, dy_rc = shift_c(y_r), shift_c(dy_r)

    zero = jnp.zeros((), x.dtype)

    def term(xp, yv, dv):
        return jnp.where(xp == yv, dv, zero)

    d_ee = term(x_ee, y, dy)
    d_eo = term(x_eo, y, dy) + term(x_eo, y_c, dy_c)
    d_oe = term(x_oe, y, dy) + term(x_oe, y_r, dy_r)
    d_oo = (
        term(x_oo, y, dy)
        + term(x_oo, y_r, dy_r)
        + term(x_oo, y_c, dy_c)
        + term(x_oo, y_rc, dy_rc)
    )
    b, ho, wo, c = y.shape
    row_e = jnp.stack([d_ee, d_eo], axis=3).reshape(b, ho, 2 * wo, c)
    row_o = jnp.stack([d_oe, d_oo], axis=3).reshape(b, ho, 2 * wo, c)
    return (jnp.stack([row_e, row_o], axis=2).reshape(b, 2 * ho, 2 * wo, c).astype(x.dtype),)


_max_pool_mask_w3s2.defvjp(_max_pool_mask_w3s2_fwd, _max_pool_mask_w3s2_bwd)


def avg_pool(x: jnp.ndarray, window: int = 2, stride: int = 2, padding="VALID") -> jnp.ndarray:
    return nn.avg_pool(x, (window, window), strides=(stride, stride), padding=padding)


def global_avg_pool(x: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    return jnp.mean(x, axis=(1, 2), keepdims=keepdims)


def global_max_pool(x: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    return jnp.max(x, axis=(1, 2), keepdims=keepdims)


def resize_bilinear(x: jnp.ndarray, size: tuple[int, int], align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize on NHWC. align_corners=False matches torch's default
    (half-pixel centers, == jax.image.resize); align_corners=True uses the
    corner-aligned sampling grid some reference models rely on
    (e.g. SNUNet's optional bilinear up, BiT's final upsample)."""
    b, h, w, c = x.shape
    out_h, out_w = size
    if not align_corners:
        return jax.image.resize(x, (b, out_h, out_w, c), method="linear")
    # Corner-aligned: sample positions i * (h-1)/(out_h-1).
    def grid(in_dim, out_dim):
        if out_dim == 1:
            return jnp.zeros((1,), jnp.float32)
        return jnp.arange(out_dim, dtype=jnp.float32) * (in_dim - 1) / (out_dim - 1)

    ys, xs = grid(h, out_h), grid(w, out_w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0.astype(jnp.float32))[None, :, None, None]
    wx = (xs - x0.astype(jnp.float32))[None, None, :, None]
    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return (top * (1 - wy) + bot * wy).astype(x.dtype)


def resize_nearest(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Nearest resize. Integer upscale factors use broadcast+reshape —
    jax.image.resize's nearest path lowers to gather loops + layout copies on
    TPU (profiled at ~25% of a UNet train step); the broadcast form is pure
    relayout that XLA fuses."""
    b, h, w, c = x.shape
    oh, ow = size
    if oh % h == 0 and ow % w == 0 and oh >= h and ow >= w:
        fy, fx = oh // h, ow // w
        y = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, fy, w, fx, c))
        return y.reshape(b, oh, ow, c)
    return jax.image.resize(x, (b, oh, ow, c), method="nearest")


def upsample2x(x: jnp.ndarray, method: str = "nearest", align_corners: bool = False) -> jnp.ndarray:
    b, h, w, c = x.shape
    if method == "nearest":
        return resize_nearest(x, (2 * h, 2 * w))
    return resize_bilinear(x, (2 * h, 2 * w), align_corners=align_corners)


def adaptive_avg_pool(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """torch AdaptiveAvgPool2d exact semantics: output bin i averages input
    rows [floor(i*H/o), ceil((i+1)*H/o)). Expressed as two small static
    averaging matmuls (MXU/VPU friendly; no gathers), valid for any in/out
    ratio including out > in (overlapping single-element windows)."""
    import numpy as _np

    b, h, w, c = x.shape
    oh, ow = out_hw

    def mat(in_dim, out_dim):
        m = _np.zeros((out_dim, in_dim), _np.float32)
        for i in range(out_dim):
            s = (i * in_dim) // out_dim
            e = -(-((i + 1) * in_dim) // out_dim)
            m[i, s:e] = 1.0 / (e - s)
        return jnp.asarray(m)

    y = jnp.einsum("oh,bhwc->bowc", mat(h, oh), x.astype(jnp.float32))
    y = jnp.einsum("pw,bowc->bopc", mat(w, ow), y)
    return y.astype(x.dtype)


def replication_pad_to(x: jnp.ndarray, target_h: int, target_w: int) -> jnp.ndarray:
    """torch ReplicationPad2d((0, dw, 0, dh)) equivalent — pad bottom/right by
    edge replication up to (target_h, target_w). Used by the siamese UNets to
    fix odd-size decoder shapes (/root/reference/models/siam_diff.py:145)."""
    b, h, w, c = x.shape
    dh, dw = target_h - h, target_w - w
    if dh == 0 and dw == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, dh), (0, dw), (0, 0)), mode="edge")


def _use_pallas_conv() -> bool:
    """Fused conv3x3+BN-stats Pallas forward (ops/pallas_conv_bn.py) is
    OPT-IN via KUROSIWO_PALLAS_CONV=1 and TPU-only, single-device (the
    kernel has no partitioning rule); =interpret runs the kernel in
    interpret mode on any backend (CPU parity tests). Standalone hardware
    timings: wins at C=256 (4.23 vs 4.72 ms), loses at C=128 (7.16 vs
    6.48) — the in-step A/B decides the default (docs/performance.md)."""
    import os

    flag = os.environ.get("KUROSIWO_PALLAS_CONV")
    if flag == "interpret":
        return True
    if flag != "1":
        return False
    if len(jax.devices()) != 1:
        return False
    from .backend import is_tpu_backend

    return is_tpu_backend()


def _use_pallas_dw() -> bool:
    """Pallas GEMM dW for 3x3 convs (ops/pallas_dw.py) — conv fwd and dx
    stay XLA, only the weight gradient runs the kernel. OPT-IN via
    KUROSIWO_PALLAS_DW=1 (TPU, single device) or =interpret (any backend,
    CPU parity tests); in-step A/B decides whether it ever defaults on."""
    import os

    flag = os.environ.get("KUROSIWO_PALLAS_DW")
    if flag == "interpret":
        return True
    if flag != "1":
        return False
    if len(jax.devices()) != 1:
        return False
    from .backend import is_tpu_backend

    return is_tpu_backend()


def _use_stem_s2d() -> bool:
    """Space-to-depth stem conv (7x7/s2 -> 4x4/s1 on the 2x2-folded input,
    ops/phase.fold_stem_s2d_kernel) — OPT-IN via KUROSIWO_STEM_S2D=1 for the
    hardware A/B. Pure-XLA exact reparameterization (no Pallas boundary):
    quadruples the stem's MXU contraction width (Cin 6 -> 24 of 128 lanes)
    at a 64/49 tap FLOP cost plus one space-to-depth relayout of the input.
    The in-step A/B decides whether it ever defaults on; see
    docs/performance.md for the verdict."""
    import os

    return os.environ.get("KUROSIWO_STEM_S2D") == "1"


class _BNParams(nn.Module):
    """BatchNorm_0-compatible parameter/stat holder for fused conv+BN paths
    (same variable subtree as flax BatchNorm — checkpoints interchangeable).
    Call once for (scale, bias); call again with (mean, var) to fold the
    batch statistics into the running averages."""

    features: int
    momentum: float = 0.9

    @nn.compact
    def __call__(self, mean=None, var=None):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32))
        if mean is not None and not self.is_initializing():
            ra_mean.value = self.momentum * ra_mean.value + (1.0 - self.momentum) * mean
            ra_var.value = self.momentum * ra_var.value + (1.0 - self.momentum) * var
        return scale, bias


class ConvBNAct(nn.Module):
    """Conv -> BatchNorm -> activation, the workhorse block of the CNN zoo.

    `phase` selects the exact phase-space (space-to-depth) fast path used by
    the high-res decoder tail on TPU (see ops/phase.py):
      * "up":    input is normal space; computes conv3x3(up2_nearest(x), W)
                 and returns it in phase space (B, H, W, 4*features);
      * "phase": input AND output in phase space — a 3x3 conv on the
                 interleaved full-res image, never materialized.
    The canonical parameters (kernel (3,3,Cin,features), BatchNorm over the
    canonical channels) are identical to the standard path, so checkpoints
    are interchangeable."""

    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = False
    act: Callable | None = nn.relu
    dtype: Dtype = jnp.float32
    padding: Any = None  # default: torch-style symmetric int padding
    phase: str | None = None  # None | "up" | "phase"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.phase is not None:
            assert (self.kernel, self.stride, self.dilation, self.use_bias) == (3, 1, 1, False)
            cin = x.shape[-1] if self.phase == "up" else x.shape[-1] // 4
            kernel, _ = ConvParams((3, 3, cin, self.features), name="Conv_0")()
            fold = fold_up2_kernel if self.phase == "up" else phase_conv_kernel
            z = conv_same(x.astype(self.dtype), fold(kernel).astype(self.dtype))
            # BN on the NATIVE (…, 4C) layout: the old phase_batch_view path
            # reduced/normalized 16-LANE tensors at the finale (1/8 lane
            # utilization, ~3.7 ms of the r3 profile)
            from .pallas_bn import PhaseGroupBatchNorm

            z = PhaseGroupBatchNorm(
                use_running_average=not train, groups=4, momentum=0.9,
                epsilon=1e-5, dtype=self.dtype, name="BatchNorm_0",
            )(z)
            if self.act is not None:
                z = self.act(z)
            return z
        if (
            self.kernel == 7
            and self.stride == 2
            and self.dilation == 1
            and not self.use_bias
            and (self.padding is None or self.padding == 3)
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
            and _use_stem_s2d()
        ):
            # stem space-to-depth fast path: same canonical parameter tree
            # (Conv_0/kernel (7,7,Cin,F) + BatchNorm_0) as the standard
            # branch — the fold happens at trace time, checkpoints are
            # interchangeable. Cast-then-fold == fold-then-cast (the fold is
            # zero-padding + permutation), so per-weight values match the
            # standard path bit-exactly; only the conv's summation order
            # differs.
            from .phase import fold_stem_s2d_kernel, space_to_depth

            kernel, _ = ConvParams((7, 7, x.shape[-1], self.features), name="Conv_0")()
            z = jax.lax.conv_general_dilated(
                space_to_depth(x.astype(self.dtype)),
                fold_stem_s2d_kernel(kernel).astype(self.dtype),
                (1, 1),
                [(2, 1), (2, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            z = FusedBatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype
            )(z)
            if self.act is not None:
                z = self.act(z)
            return z
        if (
            train
            and self.kernel == 3
            and self.stride == 1
            and self.dilation == 1
            and self.padding is None  # conv3x3_bn hard-codes SAME/pad-1
            and not self.use_bias
            and x.shape[-1] % 128 == 0
            and self.features % 128 == 0
            and min(x.shape[-1], self.features) >= 256
            and _use_pallas_conv()
        ):
            import os

            from .pallas_conv_bn import conv3x3_bn

            interp = os.environ.get("KUROSIWO_PALLAS_CONV") == "interpret"
            kernel, _ = ConvParams((3, 3, x.shape[-1], self.features), name="Conv_0")()
            bn = _BNParams(self.features, name="BatchNorm_0")
            scale, bias = bn()
            z, mean, var = conv3x3_bn(x.astype(self.dtype), kernel, scale, bias, 1e-5, interp)
            bn(mean, var)
            if self.act is not None:
                z = self.act(z)
            return z
        if (
            train
            and self.kernel == 3
            and self.stride == 1
            and self.dilation == 1
            and self.padding is None
            and not self.use_bias
            and x.shape[-1] % 128 == 0
            and self.features % 128 == 0
            and min(x.shape[1], x.shape[2]) >= 6  # dW flat-tap window bound
            and _use_pallas_dw()
        ):
            import os

            from .pallas_dw import conv3x3_pdw, pick_batch_block

            bb = pick_batch_block(
                x.shape[0], x.shape[1], x.shape[2], x.shape[-1], self.features,
                itemsize=jnp.dtype(self.dtype).itemsize,
            )
            if bb:
                interp = os.environ.get("KUROSIWO_PALLAS_DW") == "interpret"
                kernel, _ = ConvParams((3, 3, x.shape[-1], self.features), name="Conv_0")()
                z = conv3x3_pdw(x.astype(self.dtype), kernel.astype(self.dtype), bb, interp)
                z = FusedBatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    dtype=self.dtype, name="BatchNorm_0",
                )(z)
                if self.act is not None:
                    z = self.act(z)
                return z
        pad = self.padding if self.padding is not None else self.dilation * (self.kernel // 2)
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=pad,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)
        x = FusedBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype
        )(x)
        if self.act is not None:
            x = self.act(x)
        return x


class ConvTranspose2x(nn.Module):
    """torch ConvTranspose2d(C_in, C_out, kernel=2, stride=2) — exact 2x
    upsample. Parameter tree matches TorchConvTranspose (up/kernel in the
    torch (2, 2, C_out, C_in) layout + up/bias) so checkpoint conversion
    uses one weight-layout rule for every transposed conv in the zoo.

    Computed as conv1x1 to 4*C_out phase channels + depth_to_space: the
    k2/s2 windows don't overlap, so each output phase (a, b) is exactly
    x @ w[a, b] (ops/phase.fold_tconv2x_kernel). The lhs-dilated-conv
    formulation (TorchConvTranspose, `via_phase=False`) made XLA
    materialize the zero-dilated input and kernel reverses — ~45 ms/step
    across SNUNet's 10 up legs in the r3 b128 profile
    (constant_dynamic-update-slice 19.8 + reverse 15.3 + slice_add 9.4 ms);
    the phase form is one MXU matmul plus a broadcast-reshape interleave."""

    features: int
    kernel: int = 2
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    via_phase: bool = True

    @nn.compact
    def __call__(self, x):
        if not self.via_phase:
            return TorchConvTranspose(
                self.features, self.kernel, stride=2, padding=0,
                use_bias=self.use_bias, dtype=self.dtype, name="up",
            )(x)
        from .phase import depth_to_space, fold_tconv2x_kernel

        class _P(nn.Module):
            feats: int
            use_bias: bool

            @nn.compact
            def __call__(self, cin):
                k = self.param(
                    "kernel",
                    nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform", in_axis=(0, 1, 3)),
                    (2, 2, self.feats, cin),
                    jnp.float32,
                )
                b = (
                    self.param("bias", nn.initializers.zeros, (self.feats,), jnp.float32)
                    if self.use_bias
                    else None
                )
                return k, b

        kernel, bias = _P(self.features, self.use_bias, name="up")(x.shape[-1])
        kp = fold_tconv2x_kernel(kernel).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kp, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = depth_to_space(y)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


class TorchConvTranspose(nn.Module):
    """ConvTranspose2d with torch's (kernel, stride, padding, output_padding)
    geometry: out = (in - 1) * stride - 2 * padding + kernel + output_padding.

    Implemented as lhs-dilated conv (the gradient-of-conv formulation), which
    XLA lowers onto the MXU directly.
    """

    features: int
    kernel: int
    stride: int = 1
    padding: int = 0
    output_padding: int = 0
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, cin = x.shape
        k, s, p, op = self.kernel, self.stride, self.padding, self.output_padding
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform", in_axis=(0, 1, 3)),
            (k, k, self.features, cin),  # HWOI (we flip spatially below)
            jnp.float32,
        )
        # conv_transpose(x, W) == conv(lhs_dilate(x, s), flip(W)) with pad (k-1-p)
        lo = k - 1 - p
        hi = k - 1 - p + op
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            jnp.flip(kernel, axis=(0, 1)).astype(self.dtype),
            window_strides=(1, 1),
            padding=[(lo, hi), (lo, hi)],
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWOI", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class ChannelAttention(nn.Module):
    """Squeeze-excite style channel attention with avg+max pooling branches
    through a shared bottleneck MLP (reference: models/snunet.py:49-62)."""

    ratio: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pooled=None):
        """`pooled`: optional precomputed (avg, max) global pools of shape
        (B, 1, 1, C) — used by phase-space callers whose canonical channel
        pooling differs from a plain spatial pool (ops/phase
        .phase_channel_pools). Parameters are identical either way."""
        if pooled is not None:
            avg_in, max_in = pooled
        else:
            avg_in, max_in = global_avg_pool(x), global_max_pool(x)
        c = avg_in.shape[-1]
        fc1 = nn.Conv(c // self.ratio, (1, 1), use_bias=False, dtype=self.dtype, name="fc1")
        fc2 = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype, name="fc2")
        avg_out = fc2(nn.relu(fc1(avg_in)))
        max_out = fc2(nn.relu(fc1(max_in)))
        return nn.sigmoid(avg_out + max_out)


class Dropout2d(nn.Module):
    """Channel-wise dropout (torch Dropout2d): drops whole feature maps."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, shape=(x.shape[0], 1, 1, x.shape[-1]))
        return jnp.where(mask, x / keep, 0.0)


def log_softmax(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    return jax.nn.log_softmax(x, axis=axis)


class StatCheckpointBatchNorm(nn.BatchNorm):
    """flax.linen.BatchNorm whose batch statistics are tagged with
    ``checkpoint_name('bn_stats')`` so a rematerialized caller can use the
    ``save_only_these_names('bn_stats')`` policy: the tiny (C,) f32 mean/var
    survive the remat boundary and the backward recompute skips the
    activation-sized statistic reductions entirely.

    Motivation (docs/performance.md, r3 SNUNet profile): at batch 128 the
    column-remat plan re-reduces every BN input in the backward pass —
    `convert_reduce_fusion` alone was 129 ms of the 518 ms step (25%), and
    roughly half of those passes are recomputes whose only products are the
    statistics. Saving the stats costs ~2 x C floats per BN (~30 KB total)
    against ~GB-scale activations.

    Numerics are EXACTLY flax BatchNorm (same `_compute_stats`/`_normalize`
    helpers; checkpoint_name is an identity in the forward pass), so the
    torch-oracle checkpoint parity is untouched.
    """

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None, *, mask=None):
        from flax.linen import module as _fmodule
        from flax.linen import normalization as _fnorm
        from jax.ad_checkpoint import checkpoint_name

        use_running_average = _fmodule.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        feature_axes = _fnorm._canonicalize_axes(x.ndim, self.axis)
        reduction_axes = tuple(i for i in range(x.ndim) if i not in feature_axes)
        feature_shape = [x.shape[ax] for ax in feature_axes]

        stat_dtype = jnp.float32 if self.force_float32_reductions else self.param_dtype
        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, stat_dtype), feature_shape
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, stat_dtype), feature_shape
        )

        if use_running_average:
            mean = (
                ra_mean.value
                if self.force_float32_reductions
                else jnp.asarray(ra_mean.value, self.param_dtype)
            )
            var = (
                ra_var.value
                if self.force_float32_reductions
                else jnp.asarray(ra_var.value, self.param_dtype)
            )
        else:
            mean, var = _fnorm._compute_stats(
                x,
                reduction_axes,
                dtype=self.dtype,
                axis_name=self.axis_name if not self.is_initializing() else None,
                axis_index_groups=self.axis_index_groups,
                use_fast_variance=self.use_fast_variance,
                mask=mask,
                force_float32_reductions=self.force_float32_reductions,
            )
            mean = checkpoint_name(mean, "bn_stats")
            var = checkpoint_name(var, "bn_stats")
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var

        return _fnorm._normalize(
            self,
            x,
            mean,
            var,
            reduction_axes,
            feature_axes,
            self.dtype,
            self.param_dtype,
            self.epsilon,
            self.use_bias,
            self.use_scale,
            self.bias_init,
            self.scale_init,
            self.force_float32_reductions,
        )


def bn_stats_saveable_policy():
    """Remat policy pairing with StatCheckpointBatchNorm."""
    return jax.checkpoint_policies.save_only_these_names("bn_stats")
