"""Fully-convolutional siamese UNets for change detection (Daudt et al. 2018).

Parity with `/root/reference/models/siam_diff.py` (decoder skips take
|f1 - f2| per level) and `/root/reference/models/siam_conc.py` (decoder skips
concatenate (up, f1, f2)). Shared VGG-ish 4-stage encoder run on both frames,
torch-geometry ConvTranspose decoder stages, channel-dropout 0.2 everywhere,
log-softmax output (the reference's trainers then apply CE on the log-probs;
we replicate by emitting the same log-softmax values as "logits").

The k=3/s=2/p=1/op=1 upconvs and the replication-pad shape fixups are kept so
224-sized inputs produce identical intermediate shapes.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.pallas_bn import BatchNorm as FusedBatchNorm

from ..ops.nn import Dropout2d, TorchConvTranspose, max_pool, replication_pad_to


class _ConvBNDrop(nn.Module):
    """conv3x3 -> BN -> ReLU -> Dropout2d(0.2), encoder flavor (nn.Conv2d)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)
        x = FusedBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        x = nn.relu(x)
        return Dropout2d(0.2, name="do")(x, deterministic=not train)


class _TConvBNDrop(nn.Module):
    """ConvTranspose2d(k=3, s=1, p=1) -> BN -> ReLU -> Dropout2d(0.2), the
    reference decoder flavor (stride-1 transposed conv == conv with flipped
    kernel; kept as a distinct module for checkpoint-layout parity)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TorchConvTranspose(self.features, 3, 1, 1, dtype=self.dtype, name="conv")(x)
        x = FusedBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        x = nn.relu(x)
        return Dropout2d(0.2, name="do")(x, deterministic=not train)


class _Encoder(nn.Module):
    """Shared 4-stage encoder; returns per-stage pre-pool features."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        s1 = _ConvBNDrop(16, self.dtype, name="c11")(x, train)
        s1 = _ConvBNDrop(16, self.dtype, name="c12")(s1, train)
        p1 = max_pool(s1)
        s2 = _ConvBNDrop(32, self.dtype, name="c21")(p1, train)
        s2 = _ConvBNDrop(32, self.dtype, name="c22")(s2, train)
        p2 = max_pool(s2)
        s3 = _ConvBNDrop(64, self.dtype, name="c31")(p2, train)
        s3 = _ConvBNDrop(64, self.dtype, name="c32")(s3, train)
        s3 = _ConvBNDrop(64, self.dtype, name="c33")(s3, train)
        p3 = max_pool(s3)
        s4 = _ConvBNDrop(128, self.dtype, name="c41")(p3, train)
        s4 = _ConvBNDrop(128, self.dtype, name="c42")(s4, train)
        s4 = _ConvBNDrop(128, self.dtype, name="c43")(s4, train)
        p4 = max_pool(s4)
        return (s1, s2, s3, s4), p4


class SiamUnetDiff(nn.Module):
    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        enc = _Encoder(self.dtype, name="encoder")
        (a1, a2, a3, a4), pa = enc(x1, train)
        (b1, b2, b3, b4), pb = enc(x2, train)

        def fuse(skip_a, skip_b):
            return jnp.abs(skip_a - skip_b)

        return _siam_decoder(self, pb, [(a4, b4), (a3, b3), (a2, b2), (a1, b1)], fuse, train)


class SiamUnetConc(nn.Module):
    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        enc = _Encoder(self.dtype, name="encoder")
        (a1, a2, a3, a4), pa = enc(x1, train)
        (b1, b2, b3, b4), pb = enc(x2, train)

        def fuse(skip_a, skip_b):
            return jnp.concatenate([skip_a, skip_b], axis=-1)

        # siam_conc emits SOFTMAX (siam_conc.py:81), unlike siam_diff's
        # log-softmax — both are consumed as "logits" by the trainer's CE.
        return _siam_decoder(self, pb, [(a4, b4), (a3, b3), (a2, b2), (a1, b1)], fuse, train,
                             out_act="softmax")


def _siam_decoder(mdl: nn.Module, bottom, skips, fuse, train, out_act: str = "log_softmax"):
    """Shared decoder skeleton: per stage, 2x upconv (k3/s2/p1/op1) ->
    replication-pad to the skip's shape -> concat fused skip -> conv stack.
    The reference runs the decoder on frame-2's pooled stage-4 output."""
    dt = mdl.dtype
    nc = mdl.num_classes
    stage_specs = [
        # (upconv_ch, conv chain channels)
        (128, (128, 128, 64)),
        (64, (64, 64, 32)),
        (32, (32, 16)),
        (16, (16,)),
    ]
    y = bottom
    for idx, ((skip_a, skip_b), (up_ch, chain)) in enumerate(zip(skips, stage_specs)):
        y = TorchConvTranspose(up_ch, 3, 2, 1, output_padding=1, dtype=dt, name=f"upconv{4 - idx}")(y)
        y = replication_pad_to(y, skip_a.shape[1], skip_a.shape[2])
        y = jnp.concatenate([y, fuse(skip_a, skip_b)], axis=-1)
        for ci, ch in enumerate(chain):
            last_stage = idx == len(stage_specs) - 1
            last_conv = ci == len(chain) - 1
            if last_stage and last_conv:
                y = _TConvBNDrop(ch, dt, name=f"dec{4 - idx}_{ci}")(y, train)
            else:
                y = _TConvBNDrop(ch, dt, name=f"dec{4 - idx}_{ci}")(y, train)
    logits = TorchConvTranspose(nc, 3, 1, 1, dtype=dt, name="classifier")(y)
    # Reference output activations: siam_diff LogSoftmax (siam_diff.py:93),
    # siam_conc Softmax (siam_conc.py:81) — replicated exactly.
    logits = logits.astype(jnp.float32)
    if out_act == "softmax":
        return jax.nn.softmax(logits, axis=-1)
    return jax.nn.log_softmax(logits, axis=-1)
