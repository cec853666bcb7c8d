"""SNUNet-CD with Ensemble Channel Attention (ECAM) — the reference's released
best checkpoint model (`best_segmentation.pt`).

Topology parity with `/root/reference/models/snunet.py:65-153` (Fang et al.,
IEEE GRSL 2022): siamese shared nested-UNet encoder on both frames, dense
UNet++-style decoder fusing A/B features at every node, ECAM (intra-sum
channel attention + whole-stack channel attention) over the 4 x0_j outputs,
1x1 head. Up-blocks are ConvTranspose2d(k=2, s=2) like the reference default.

Module/parameter names deliberately mirror the reference state_dict keys
(conv0_0 ... conv0_4, UpN_M, ca/ca1, conv_final) so the torch->jax checkpoint
converter is a mechanical key map.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..ops.nn import ChannelAttention, ConvTranspose2x, max_pool


class ConvBlockNested(nn.Module):
    """2x (conv3x3 + BN) with a residual from the first conv's pre-BN output
    (reference conv_block_nested, models/snunet.py:11-29)."""

    mid_ch: int
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.mid_ch, (3, 3), padding=1, use_bias=True, dtype=self.dtype, name="conv1")(x)
        identity = x
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_ch, (3, 3), padding=1, use_bias=True, dtype=self.dtype, name="conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn2")(x)
        return nn.relu(x + identity)


def _block_cls(remat: bool):
    return nn.remat(ConvBlockNested, static_argnums=(2,)) if remat else ConvBlockNested


class SNUNetECAM(nn.Module):
    num_classes: int
    base_channel: int = 32
    remat: bool = False  # recompute each nested block in bwd: the dense-skip
    # decoder's live set OOMs a 16GB chip above batch ~48 otherwise
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xa, xb, train: bool = False):
        n1 = self.base_channel
        f = [n1, n1 * 2, n1 * 4, n1 * 8, n1 * 16]
        dt = self.dtype
        ConvBlockNested = _block_cls(self.remat)

        conv0_0 = ConvBlockNested(f[0], f[0], dt, name="conv0_0")
        conv1_0 = ConvBlockNested(f[1], f[1], dt, name="conv1_0")
        conv2_0 = ConvBlockNested(f[2], f[2], dt, name="conv2_0")
        conv3_0 = ConvBlockNested(f[3], f[3], dt, name="conv3_0")
        conv4_0 = ConvBlockNested(f[4], f[4], dt, name="conv4_0")
        up1_0 = ConvTranspose2x(f[1], dtype=dt, name="Up1_0")
        up2_0 = ConvTranspose2x(f[2], dtype=dt, name="Up2_0")
        up3_0 = ConvTranspose2x(f[3], dtype=dt, name="Up3_0")
        up4_0 = ConvTranspose2x(f[4], dtype=dt, name="Up4_0")

        # Shared-weight encoder on both frames; frame B goes one stage deeper.
        x0_0a = conv0_0(xa, train)
        x1_0a = conv1_0(max_pool(x0_0a), train)
        x2_0a = conv2_0(max_pool(x1_0a), train)
        x3_0a = conv3_0(max_pool(x2_0a), train)

        x0_0b = conv0_0(xb, train)
        x1_0b = conv1_0(max_pool(x0_0b), train)
        x2_0b = conv2_0(max_pool(x1_0b), train)
        x3_0b = conv3_0(max_pool(x2_0b), train)
        x4_0b = conv4_0(max_pool(x3_0b), train)

        cat = lambda *ts: jnp.concatenate(ts, axis=-1)

        x0_1 = ConvBlockNested(f[0], f[0], dt, name="conv0_1")(cat(x0_0a, x0_0b, up1_0(x1_0b)), train)
        x1_1 = ConvBlockNested(f[1], f[1], dt, name="conv1_1")(cat(x1_0a, x1_0b, up2_0(x2_0b)), train)
        x0_2 = ConvBlockNested(f[0], f[0], dt, name="conv0_2")(
            cat(x0_0a, x0_0b, x0_1, ConvTranspose2x(f[1], dtype=dt, name="Up1_1")(x1_1)), train
        )

        x2_1 = ConvBlockNested(f[2], f[2], dt, name="conv2_1")(cat(x2_0a, x2_0b, up3_0(x3_0b)), train)
        x1_2 = ConvBlockNested(f[1], f[1], dt, name="conv1_2")(
            cat(x1_0a, x1_0b, x1_1, ConvTranspose2x(f[2], dtype=dt, name="Up2_1")(x2_1)), train
        )
        x0_3 = ConvBlockNested(f[0], f[0], dt, name="conv0_3")(
            cat(x0_0a, x0_0b, x0_1, x0_2, ConvTranspose2x(f[1], dtype=dt, name="Up1_2")(x1_2)), train
        )

        x3_1 = ConvBlockNested(f[3], f[3], dt, name="conv3_1")(cat(x3_0a, x3_0b, up4_0(x4_0b)), train)
        x2_2 = ConvBlockNested(f[2], f[2], dt, name="conv2_2")(
            cat(x2_0a, x2_0b, x2_1, ConvTranspose2x(f[3], dtype=dt, name="Up3_1")(x3_1)), train
        )
        x1_3 = ConvBlockNested(f[1], f[1], dt, name="conv1_3")(
            cat(x1_0a, x1_0b, x1_1, x1_2, ConvTranspose2x(f[2], dtype=dt, name="Up2_2")(x2_2)), train
        )
        x0_4 = ConvBlockNested(f[0], f[0], dt, name="conv0_4")(
            cat(x0_0a, x0_0b, x0_1, x0_2, x0_3, ConvTranspose2x(f[1], dtype=dt, name="Up1_3")(x1_3)), train
        )

        out = cat(x0_1, x0_2, x0_3, x0_4)  # (B, H, W, 4*f0)

        # ECAM: intra attention over the stack-sum, then whole attention.
        intra = x0_1 + x0_2 + x0_3 + x0_4
        ca1 = ChannelAttention(ratio=16 // 4, dtype=dt, name="ca1")(intra)
        ca = ChannelAttention(ratio=16, dtype=dt, name="ca")(out)
        out = ca * (out + jnp.tile(ca1, (1, 1, 1, 4)))
        out = nn.Conv(self.num_classes, (1, 1), use_bias=True, dtype=dt, name="conv_final")(out)
        return out.astype(jnp.float32)
