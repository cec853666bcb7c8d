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

Memory (TPU redesign): with `remat=True` the dense decoder is checkpointed
COLUMN-GRANULARLY — each nested-grid column j (all x*_j nodes) recomputes in
the backward pass from the encoder features and earlier columns' outputs, and
the ECAM+head recomputes from the four x0_j maps. The huge per-node channel
concats (up to 192ch at 224^2, ~2.5 GB at batch 128 bf16) are never saved;
only column OUTPUTS persist. Encoder blocks use per-block remat (their inputs
are retained anyway as skip features). This is what lets the flagship model
train at the reference's batch 128 (configs/train/train_config.json:2) on a
16 GB v5e chip — whole-forward or per-block remat alone both OOM.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..ops.nn import ChannelAttention, ConvTranspose2x, max_pool


class ConvBlockNested(nn.Module):
    """2x (conv3x3 + BN) with a residual from the first conv's pre-BN output
    (reference conv_block_nested, models/snunet.py:11-29).

    Accepts a TUPLE of feature maps: conv1 over the (conceptual) channel
    concat is computed as a sum of part-convolutions with the canonical
    kernel split along Cin at trace time — exact, parameters identical, and
    the dense-skip concats (up to 224ch at 224^2, 2.7 GB at batch 128) are
    never materialized in forward OR backward. Adjacent parts are grouped to
    >=64 channels so the MXU contraction stays wide.

    Deliberately uses flax nn.BatchNorm (not ops.pallas_bn.BatchNorm): the
    batch-128 column-remat plan was tuned against autodiff BN, and the
    custom-vjp residual set pushes the peak over HBM (measured OOM at
    batch 128)."""

    mid_ch: int
    out_ch: int
    dtype: Any = jnp.float32
    # apply the 2x2 stride-2 max-pool INSIDE the block so that, under remat,
    # only the pre-pool tensor (already live as a skip feature) is saved —
    # the pooled encoder inputs (~370 MB across levels/frames at batch 128)
    # are recomputed in the backward pass instead of stored
    pre_pool: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..ops.nn import ConvParams, conv_same

        parts = list(x) if isinstance(x, (tuple, list)) else [x]
        if self.pre_pool:
            parts = [max_pool(p) for p in parts]
        # group adjacent parts to at least 64 channels (one concat per group)
        groups: list = []
        cur: list = []
        cur_ch = 0
        for p in parts:
            cur.append(p)
            cur_ch += p.shape[-1]
            if cur_ch >= 64:
                groups.append(cur if len(cur) > 1 else cur[0])
                cur, cur_ch = [], 0
        if cur:
            groups.append(cur if len(cur) > 1 else cur[0])
        groups = [jnp.concatenate(g, axis=-1) if isinstance(g, list) else g for g in groups]

        cin = sum(g.shape[-1] for g in groups)
        kernel, bias = ConvParams((3, 3, cin, self.mid_ch), use_bias=True, name="conv1")()
        x = bias.astype(self.dtype)
        off = 0
        for g in groups:
            kp = kernel[:, :, off : off + g.shape[-1]].astype(self.dtype)
            x = x + conv_same(g.astype(self.dtype), kp)
            off += g.shape[-1]
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
    remat: bool = False  # column-granular decoder remat (see module docstring)
    dtype: Any = jnp.float32

    def setup(self):
        n1 = self.base_channel
        f = [n1, n1 * 2, n1 * 4, n1 * 8, n1 * 16]
        dt = self.dtype
        # encoder blocks: per-block remat (inputs live on as skip features)
        EncBlock = _block_cls(self.remat)
        self.conv0_0 = EncBlock(f[0], f[0], dt)
        self.conv1_0 = EncBlock(f[1], f[1], dt, pre_pool=True)
        self.conv2_0 = EncBlock(f[2], f[2], dt, pre_pool=True)
        self.conv3_0 = EncBlock(f[3], f[3], dt, pre_pool=True)
        self.conv4_0 = EncBlock(f[4], f[4], dt, pre_pool=True)
        # decoder nodes: plain blocks — columns are checkpointed as a whole
        self.conv0_1 = ConvBlockNested(f[0], f[0], dt)
        self.conv1_1 = ConvBlockNested(f[1], f[1], dt)
        self.conv2_1 = ConvBlockNested(f[2], f[2], dt)
        self.conv3_1 = ConvBlockNested(f[3], f[3], dt)
        self.conv0_2 = ConvBlockNested(f[0], f[0], dt)
        self.conv1_2 = ConvBlockNested(f[1], f[1], dt)
        self.conv2_2 = ConvBlockNested(f[2], f[2], dt)
        self.conv0_3 = ConvBlockNested(f[0], f[0], dt)
        self.conv1_3 = ConvBlockNested(f[1], f[1], dt)
        self.conv0_4 = ConvBlockNested(f[0], f[0], dt)
        self.Up1_0 = ConvTranspose2x(f[1], dtype=dt)
        self.Up2_0 = ConvTranspose2x(f[2], dtype=dt)
        self.Up3_0 = ConvTranspose2x(f[3], dtype=dt)
        self.Up4_0 = ConvTranspose2x(f[4], dtype=dt)
        self.Up1_1 = ConvTranspose2x(f[1], dtype=dt)
        self.Up2_1 = ConvTranspose2x(f[2], dtype=dt)
        self.Up3_1 = ConvTranspose2x(f[3], dtype=dt)
        self.Up1_2 = ConvTranspose2x(f[1], dtype=dt)
        self.Up2_2 = ConvTranspose2x(f[2], dtype=dt)
        self.Up1_3 = ConvTranspose2x(f[1], dtype=dt)
        self.ca1 = ChannelAttention(ratio=16 // 4, dtype=dt)
        self.ca = ChannelAttention(ratio=16, dtype=dt)
        self.conv_final = nn.Conv(
            self.num_classes, (1, 1), use_bias=True, dtype=dt
        )

    def __call__(self, xa, xb, train: bool = False):
        cat = lambda *ts: ts  # parts tuple; ConvBlockNested splits the kernel

        # shared-weight encoder on both frames; frame B goes one stage deeper
        x0_0a = self.conv0_0(xa, train)
        x1_0a = self.conv1_0(x0_0a, train)
        x2_0a = self.conv2_0(x1_0a, train)
        x3_0a = self.conv3_0(x2_0a, train)

        x0_0b = self.conv0_0(xb, train)
        x1_0b = self.conv1_0(x0_0b, train)
        x2_0b = self.conv2_0(x1_0b, train)
        x3_0b = self.conv3_0(x2_0b, train)
        x4_0b = self.conv4_0(x3_0b, train)

        # decoder columns; closures capture `train` (trace-static)
        def col1(mdl, x0_0a, x0_0b, x1_0a, x1_0b, x2_0a, x2_0b, x3_0a, x3_0b, x4_0b):
            x0_1 = mdl.conv0_1(cat(x0_0a, x0_0b, mdl.Up1_0(x1_0b)), train)
            x1_1 = mdl.conv1_1(cat(x1_0a, x1_0b, mdl.Up2_0(x2_0b)), train)
            x2_1 = mdl.conv2_1(cat(x2_0a, x2_0b, mdl.Up3_0(x3_0b)), train)
            x3_1 = mdl.conv3_1(cat(x3_0a, x3_0b, mdl.Up4_0(x4_0b)), train)
            return x0_1, x1_1, x2_1, x3_1

        def col2(mdl, x0_0a, x0_0b, x1_0a, x1_0b, x2_0a, x2_0b, x0_1, x1_1, x2_1, x3_1):
            x0_2 = mdl.conv0_2(cat(x0_0a, x0_0b, x0_1, mdl.Up1_1(x1_1)), train)
            x1_2 = mdl.conv1_2(cat(x1_0a, x1_0b, x1_1, mdl.Up2_1(x2_1)), train)
            x2_2 = mdl.conv2_2(cat(x2_0a, x2_0b, x2_1, mdl.Up3_1(x3_1)), train)
            return x0_2, x1_2, x2_2

        def col3(mdl, x0_0a, x0_0b, x1_0a, x1_0b, x0_1, x0_2, x1_1, x1_2, x2_2):
            x0_3 = mdl.conv0_3(cat(x0_0a, x0_0b, x0_1, x0_2, mdl.Up1_2(x1_2)), train)
            x1_3 = mdl.conv1_3(cat(x1_0a, x1_0b, x1_1, x1_2, mdl.Up2_2(x2_2)), train)
            return x0_3, x1_3

        def col4(mdl, x0_0a, x0_0b, x0_1, x0_2, x0_3, x1_3):
            return mdl.conv0_4(cat(x0_0a, x0_0b, x0_1, x0_2, x0_3, mdl.Up1_3(x1_3)), train)

        def ecam_head(mdl, x0_1, x0_2, x0_3, x0_4):
            out = jnp.concatenate([x0_1, x0_2, x0_3, x0_4], axis=-1)  # (B,H,W,4*f0)
            intra = x0_1 + x0_2 + x0_3 + x0_4
            ca1 = mdl.ca1(intra)
            ca = mdl.ca(out)
            out = ca * (out + jnp.tile(ca1, (1, 1, 1, 4)))
            out = mdl.conv_final(out)
            return out.astype(jnp.float32)

        if self.remat:
            col1, col2, col3, col4, ecam_head = (
                nn.remat(fn) for fn in (col1, col2, col3, col4, ecam_head)
            )

        x0_1, x1_1, x2_1, x3_1 = col1(
            self, x0_0a, x0_0b, x1_0a, x1_0b, x2_0a, x2_0b, x3_0a, x3_0b, x4_0b
        )
        x0_2, x1_2, x2_2 = col2(
            self, x0_0a, x0_0b, x1_0a, x1_0b, x2_0a, x2_0b, x0_1, x1_1, x2_1, x3_1
        )
        x0_3, x1_3 = col3(self, x0_0a, x0_0b, x1_0a, x1_0b, x0_1, x0_2, x1_1, x1_2, x2_2)
        x0_4 = col4(self, x0_0a, x0_0b, x0_1, x0_2, x0_3, x1_3)
        return ecam_head(self, x0_1, x0_2, x0_3, x0_4)
