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

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.nn import (
    ChannelAttention,
    ConvTranspose2x,
    StatCheckpointBatchNorm,
    bn_stats_saveable_policy,
    max_pool,
)


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
    # phase mode (round 3): inputs/outputs are space-to-depth phase tensors
    # (B, H/2, W/2, 4C). The canonical (3,3) kernels are folded at trace time
    # (ops/phase.phase_conv_kernel) so parameters/checkpoints are unchanged,
    # but the convs contract over 4x wider channels — the level-0 grid's
    # C=32 @ 224^2 convs (25% MXU lane efficiency) become C=128 @ 112^2.
    # BN reduces over phases via phase_batch_view (numerically identical).
    phase: bool = False
    # pre_pool variant consuming PHASE inputs: maxpool2x2 == elementwise max
    # over the 4 phase groups; output is a normal-space tensor
    pre_pool_phase: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..ops.nn import ConvParams, conv_same
        from ..ops.phase import (
            phase_batch_unview,
            phase_batch_view,
            phase_conv_kernel,
            phase_max_pool2x2,
        )

        parts = list(x) if isinstance(x, (tuple, list)) else [x]
        if self.pre_pool_phase:
            parts = [phase_max_pool2x2(p) for p in parts]
            if self.phase:
                # phase block fed by a phase-pooled input (conv1_0 when both
                # level 0 and level 1 run in phase space): re-fold the pooled
                # normal-space map into the next level's phase layout
                from ..ops.phase import space_to_depth

                parts = [space_to_depth(p) for p in parts]
        elif self.pre_pool:
            parts = [max_pool(p) for p in parts]

        if self.phase:
            cin = sum(p.shape[-1] for p in parts) // 4  # canonical channels
            kernel, bias = ConvParams((3, 3, cin, self.mid_ch), use_bias=True, name="conv1")()
            x = jnp.tile(bias, 4).astype(self.dtype)
            off = 0
            for p in parts:
                cpart = p.shape[-1] // 4
                kp = phase_conv_kernel(kernel[:, :, off : off + cpart]).astype(self.dtype)
                x = x + conv_same(p.astype(self.dtype), kp)
                off += cpart
            identity = x
            x = phase_batch_view(x)
            x = StatCheckpointBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                             dtype=self.dtype, name="bn1")(x)
            x = nn.relu(x)
            k2, b2 = ConvParams((3, 3, self.mid_ch, self.out_ch), use_bias=True, name="conv2")()
            x = phase_batch_unview(x)
            x = conv_same(x, phase_conv_kernel(k2).astype(self.dtype)) + jnp.tile(b2, 4).astype(self.dtype)
            x = phase_batch_view(x)
            x = StatCheckpointBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                             dtype=self.dtype, name="bn2")(x)
            x = phase_batch_unview(x)
            return nn.relu(x + identity)

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
        x = StatCheckpointBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_ch, (3, 3), padding=1, use_bias=True, dtype=self.dtype, name="conv2")(x)
        x = StatCheckpointBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn2")(x)
        return nn.relu(x + identity)


class _PhaseUp2x(nn.Module):
    """ConvTranspose2d(k=2, s=2) emitting phase-space output directly:
    s2d(tconv2x(x)) == 1x1 conv with the folded kernel — the k2/s2 transposed
    conv writes each output phase independently, so the 224^2 materialization
    and its backward disappear. Parameter tree identical to ConvTranspose2x
    (up/kernel (2,2,O,I) torch layout + up/bias) for checkpoint parity."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.phase import fold_tconv2x_kernel

        class _P(nn.Module):
            feats: int

            @nn.compact
            def __call__(self, cin):
                k = self.param(
                    "kernel",
                    nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform", in_axis=(0, 1, 3)),
                    (2, 2, self.feats, cin),
                    jnp.float32,
                )
                b = self.param("bias", nn.initializers.zeros, (self.feats,), jnp.float32)
                return k, b

        kernel, bias = _P(self.features, name="up")(x.shape[-1])
        kp = fold_tconv2x_kernel(kernel).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kp, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + jnp.tile(bias, 4).astype(self.dtype)


class _PhaseFinalConv(nn.Module):
    """conv_final (1x1, canonical (1,1,C,num_classes)) applied to the ECAM
    concat in MAP-MAJOR phase layout: input channel (m, p, c) = the phase-p
    copy of canonical channel m*c0+c; output is phase-major (p, o) so
    depth_to_space recovers the full-res logits. Parameter tree identical to
    nn.Conv (kernel/bias directly under the module name)."""

    num_classes: int
    cin: int            # canonical channels (n_maps * c0)
    n_maps: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (1, 1, self.cin, self.num_classes),
            jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.num_classes,), jnp.float32)
        c0 = self.cin // self.n_maps
        # K[(m,p,c), (q,o)] = w[m*c0+c, o] * delta(p, q)
        w = k[0, 0].reshape(self.n_maps, c0, self.num_classes)
        eye = jnp.eye(4, dtype=k.dtype)
        kp = jnp.einsum("pq,mco->mpcqo", eye, w).reshape(
            self.n_maps * 4 * c0, 4 * self.num_classes
        )[None, None].astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            z.astype(self.dtype), kp, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + jnp.tile(b, 4).astype(self.dtype)


def _block_cls(remat: bool, save_bn_stats: bool = True):
    if not remat:
        return ConvBlockNested
    policy = bn_stats_saveable_policy() if save_bn_stats else None
    return nn.remat(ConvBlockNested, static_argnums=(2,), policy=policy)


class SNUNetECAM(nn.Module):
    num_classes: int
    base_channel: int = 32
    remat: bool = False  # column-granular decoder remat (see module docstring)
    # save the (C,)-sized BN batch statistics across the remat boundaries so
    # the backward recompute skips the activation-sized stat reductions
    # (r3 profile: convert_reduce_fusion = 129 ms of the 518 ms b128 step)
    save_bn_stats: bool = True
    # OPT-IN (measured regression as default): compute the k2/s2 up legs as
    # conv1x1-to-phase + depth_to_space instead of the lhs-dilated conv.
    # Exact, and it does delete the lhs-dilation scatter/reverse ops — but the
    # same-session hardware A/B measured 221.4 vs 248.1 patches/s at b128
    # (the phase relayout + depth_to_space copies cost more than the scatter
    # they replace). Kept as tested infrastructure (docs/performance.md).
    dts_up: bool = False
    # OPT-IN (measured regression as default): run the level-0/level-1 rows
    # in phase (space-to-depth) space — exact reparameterization, checkpoints
    # unchanged, but the folded 3x3 phase kernels carry structural-zero taps
    # (2.25x dense FLOPs) and measured 246 -> 146 patches/s at batch 128.
    # Kept as tested infrastructure + the measured lesson (docs/performance.md)
    phase_l0: bool = False  # measured: 246 -> 146 p/s at b128 (see factory.py)
    phase_l1: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        n1 = self.base_channel
        f = [n1, n1 * 2, n1 * 4, n1 * 8, n1 * 16]
        dt = self.dtype
        ph = self.phase_l0
        ph1 = self.phase_l0 and self.phase_l1
        # encoder blocks: per-block remat (inputs live on as skip features)
        EncBlock = _block_cls(self.remat, self.save_bn_stats)
        self.conv0_0 = EncBlock(f[0], f[0], dt, phase=ph)
        self.conv1_0 = EncBlock(f[1], f[1], dt, pre_pool=not ph, pre_pool_phase=ph, phase=ph1)
        self.conv2_0 = EncBlock(f[2], f[2], dt, pre_pool=not ph1, pre_pool_phase=ph1)
        self.conv3_0 = EncBlock(f[3], f[3], dt, pre_pool=True)
        self.conv4_0 = EncBlock(f[4], f[4], dt, pre_pool=True)
        # decoder nodes: plain blocks — columns are checkpointed as a whole
        self.conv0_1 = ConvBlockNested(f[0], f[0], dt, phase=ph)
        self.conv1_1 = ConvBlockNested(f[1], f[1], dt, phase=ph1)
        self.conv2_1 = ConvBlockNested(f[2], f[2], dt)
        self.conv3_1 = ConvBlockNested(f[3], f[3], dt)
        self.conv0_2 = ConvBlockNested(f[0], f[0], dt, phase=ph)
        self.conv1_2 = ConvBlockNested(f[1], f[1], dt, phase=ph1)
        self.conv2_2 = ConvBlockNested(f[2], f[2], dt)
        self.conv0_3 = ConvBlockNested(f[0], f[0], dt, phase=ph)
        self.conv1_3 = ConvBlockNested(f[1], f[1], dt, phase=ph1)
        self.conv0_4 = ConvBlockNested(f[0], f[0], dt, phase=ph)
        dts = self.dts_up
        Up0 = (lambda feats: _PhaseUp2x(feats, dtype=dt)) if ph else (
            lambda feats: ConvTranspose2x(feats, dtype=dt, via_phase=dts)
        )
        Up1 = (lambda feats: _PhaseUp2x(feats, dtype=dt)) if ph1 else (
            lambda feats: ConvTranspose2x(feats, dtype=dt, via_phase=dts)
        )
        self.Up1_0 = Up0(f[1])
        self.Up2_0 = Up1(f[2])
        self.Up3_0 = ConvTranspose2x(f[3], dtype=dt, via_phase=dts)
        self.Up4_0 = ConvTranspose2x(f[4], dtype=dt, via_phase=dts)
        self.Up1_1 = Up0(f[1])
        self.Up2_1 = Up1(f[2])
        self.Up3_1 = ConvTranspose2x(f[3], dtype=dt, via_phase=dts)
        self.Up1_2 = Up0(f[1])
        self.Up2_2 = Up1(f[2])
        self.Up1_3 = Up0(f[1])
        self.ca1 = ChannelAttention(ratio=16 // 4, dtype=dt)
        self.ca = ChannelAttention(ratio=16, dtype=dt)
        if ph:
            self.conv_final = _PhaseFinalConv(self.num_classes, 4 * f[0], dtype=dt)
        else:
            self.conv_final = nn.Conv(self.num_classes, (1, 1), use_bias=True, dtype=dt)

    def __call__(self, xa, xb, train: bool = False):
        cat = lambda *ts: ts  # parts tuple; ConvBlockNested splits the kernel

        if self.phase_l0:
            from ..ops.phase import space_to_depth

            xa = space_to_depth(xa)
            xb = space_to_depth(xb)

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

        # decoder columns; closures capture `train` (trace-static).
        # When level 1 is in phase space, Up1_* (a full-res k2/s2 tconv of the
        # 112^2 map) reads the depth_to_space view of the phase tensor — one
        # 51 MB relayout copy per leg at batch 128, vs the 224^2 tconv
        # materialization it replaces.
        if self.phase_l0 and self.phase_l1:
            from ..ops.phase import depth_to_space as _u1in
        else:
            _u1in = lambda z: z

        def col1(mdl, x0_0a, x0_0b, x1_0a, x1_0b, x2_0a, x2_0b, x3_0a, x3_0b, x4_0b):
            x0_1 = mdl.conv0_1(cat(x0_0a, x0_0b, mdl.Up1_0(_u1in(x1_0b))), train)
            x1_1 = mdl.conv1_1(cat(x1_0a, x1_0b, mdl.Up2_0(x2_0b)), train)
            x2_1 = mdl.conv2_1(cat(x2_0a, x2_0b, mdl.Up3_0(x3_0b)), train)
            x3_1 = mdl.conv3_1(cat(x3_0a, x3_0b, mdl.Up4_0(x4_0b)), train)
            return x0_1, x1_1, x2_1, x3_1

        def col2(mdl, x0_0a, x0_0b, x1_0a, x1_0b, x2_0a, x2_0b, x0_1, x1_1, x2_1, x3_1):
            x0_2 = mdl.conv0_2(cat(x0_0a, x0_0b, x0_1, mdl.Up1_1(_u1in(x1_1))), train)
            x1_2 = mdl.conv1_2(cat(x1_0a, x1_0b, x1_1, mdl.Up2_1(x2_1)), train)
            x2_2 = mdl.conv2_2(cat(x2_0a, x2_0b, x2_1, mdl.Up3_1(x3_1)), train)
            return x0_2, x1_2, x2_2

        def col3(mdl, x0_0a, x0_0b, x1_0a, x1_0b, x0_1, x0_2, x1_1, x1_2, x2_2):
            x0_3 = mdl.conv0_3(cat(x0_0a, x0_0b, x0_1, x0_2, mdl.Up1_2(_u1in(x1_2))), train)
            x1_3 = mdl.conv1_3(cat(x1_0a, x1_0b, x1_1, x1_2, mdl.Up2_2(x2_2)), train)
            return x0_3, x1_3

        def col4(mdl, x0_0a, x0_0b, x0_1, x0_2, x0_3, x1_3):
            return mdl.conv0_4(cat(x0_0a, x0_0b, x0_1, x0_2, x0_3, mdl.Up1_3(_u1in(x1_3))), train)

        def ecam_head(mdl, x0_1, x0_2, x0_3, x0_4):
            if mdl.phase_l0:
                # phase-space ECAM: channel attention is per CANONICAL channel,
                # so pools reduce over space AND phases; the attention vectors
                # broadcast back phase-major. Math identical to the canonical
                # head on depth_to_space inputs.
                from ..ops.phase import (
                    depth_to_space,
                    phase_channel_pools,
                    phase_tile_channels,
                )

                maps = [x0_1, x0_2, x0_3, x0_4]
                out = jnp.concatenate(maps, axis=-1)  # (B,H,W,4*(4f0)) phase-per-map
                intra = x0_1 + x0_2 + x0_3 + x0_4
                a1, m1 = phase_channel_pools(intra)
                ca1 = mdl.ca1(intra, pooled=(a1, m1))  # (B,1,1,f0)
                pools = [phase_channel_pools(m) for m in maps]
                avg = jnp.concatenate([p[0] for p in pools], axis=-1)
                mx = jnp.concatenate([p[1] for p in pools], axis=-1)
                ca = mdl.ca(out, pooled=(avg, mx))  # (B,1,1,4*f0) canonical
                c0 = x0_1.shape[-1] // 4  # canonical f0
                ca_phase = jnp.concatenate(
                    [phase_tile_channels(ca[..., m * c0 : (m + 1) * c0]) for m in range(4)],
                    axis=-1,
                )
                ca1_phase = jnp.tile(ca1, (1, 1, 1, 16))
                out = ca_phase * (out + ca1_phase)
                out = mdl.conv_final(out)  # phase logits (B,H,W,4*ncls)
                return depth_to_space(out).astype(jnp.float32)
            out = jnp.concatenate([x0_1, x0_2, x0_3, x0_4], axis=-1)  # (B,H,W,4*f0)
            intra = x0_1 + x0_2 + x0_3 + x0_4
            ca1 = mdl.ca1(intra)
            ca = mdl.ca(out)
            out = ca * (out + jnp.tile(ca1, (1, 1, 1, 4)))
            out = mdl.conv_final(out)
            return out.astype(jnp.float32)

        if self.remat:
            col1, col2, col3, col4, ecam_head = (
                nn.remat(
                    fn,
                    policy=bn_stats_saveable_policy() if self.save_bn_stats else None,
                )
                for fn in (col1, col2, col3, col4, ecam_head)
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
