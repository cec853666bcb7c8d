"""Phase-space (space-to-depth) convolution transforms.

TPU-first redesign of the high-resolution decoder tail (no reference
equivalent — the reference runs plain NCHW convs at 224^2,
/root/reference/models/model_utilities.py:110-157 via smp). Motivation
(profiled on v5e, docs/performance.md): the finest UNet decoder level is
HBM-bound — `nearest_up2x` materializes a 4x-inflated map (410 MB at batch
128) that the next conv re-reads, and its backward is a segment-sum. Both
disappear if the whole level runs on the half-resolution grid with 4 "phase"
channels per canonical channel (2x2 space-to-depth), which is an *exact*
reparameterization:

  conv3x3(up2_nearest(x), W)        == d2s(conv3x3(x, fold_up2_kernel(W)))
  conv3x3(interleaved(Z), W)        == in phase space: conv3x3(Z, phase_conv_kernel(W))
  batchnorm over (B, 2H, 2W) per c  == batchnorm over (B, H, W, 4 phases) per c

Phase layout convention: a phase-space tensor Z of shape (B, H, W, 4*C)
corresponds to the full-resolution X = depth_to_space(Z) of shape
(B, 2H, 2W, C) with X[2i+a, 2j+b, c] = Z[i, j, (2a+b)*C + c].

All kernel folds are built at trace time from the *canonical* parameters
(3, 3, Cin, Cout) — checkpoints and converters are unaffected.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# Row-folding matrices for conv-on-nearest-upsampled input (correlation
# convention, SAME padding). For output phase a, the 3-tap kernel over the
# low-res rows (i-1, i, i+1) is K[p] = sum_u F[a, p, u] * W[u]:
#   a=0: K = [W0, W1+W2, 0];   a=1: K = [0, W0+W1, W2]
_FOLD_F = np.zeros((2, 3, 3), np.float32)
_FOLD_F[0, 0, 0] = 1.0
_FOLD_F[0, 1, 1] = 1.0
_FOLD_F[0, 1, 2] = 1.0
_FOLD_F[1, 1, 0] = 1.0
_FOLD_F[1, 1, 1] = 1.0
_FOLD_F[1, 2, 2] = 1.0

# Phase-to-phase routing for a 3x3 conv evaluated on the interleaved image:
# output phase a, tap u reads interleaved row t = 2i + a + u - 1, i.e.
# low-res row i + floor(t'/2) and input phase t' mod 2 with t' = a + u - 1.
# _ROUTE[a, u, d, e] = 1 iff floor((a+u-1)/2) == d-1 and (a+u-1) % 2 == e.
_ROUTE = np.zeros((2, 3, 3, 2), np.float32)
for _a in range(2):
    for _u in range(3):
        _t = _a + _u - 1
        _ROUTE[_a, _u, _t // 2 + 1, _t % 2] = 1.0


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, 2H, 2W, C) -> (B, H, W, 4C), phase-major channel layout."""
    b, h2, w2, c = x.shape
    h, w = h2 // 2, w2 // 2
    y = x.reshape(b, h, 2, w, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, h, w, 4 * c)


def space_to_depth_mask(m: jnp.ndarray) -> jnp.ndarray:
    """(B, 2H, 2W) int mask -> (B, H, W, 4)."""
    b, h2, w2 = m.shape
    h, w = h2 // 2, w2 // 2
    return m.reshape(b, h, 2, w, 2).transpose(0, 1, 3, 2, 4).reshape(b, h, w, 4)


def depth_to_space(z: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 4C) -> (B, 2H, 2W, C)."""
    b, h, w, c4 = z.shape
    c = c4 // 4
    y = z.reshape(b, h, w, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, 2 * h, 2 * w, c)


def fold_up2_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, Cout) -> (3, 3, Cin, 4*Cout) such that
    conv3x3_same(up2_nearest(x), w) == depth_to_space(conv3x3_same(x, K))."""
    f = jnp.asarray(_FOLD_F, w.dtype)
    # K[p, q, c, a, b, o] = sum_{u,v} F[a,p,u] F[b,q,v] W[u,v,c,o]
    k = jnp.einsum("apu,bqv,uvco->pqcabo", f, f, w)
    kh, kw, cin, _, _, cout = k.shape
    return k.reshape(kh, kw, cin, 4 * cout)


def phase_conv_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, Cout) -> (3, 3, 4*Cin, 4*Cout) such that, for Z in phase
    space, conv3x3_same(Z, K) == s2d(conv3x3_same(d2s(Z), w))."""
    r = jnp.asarray(_ROUTE, w.dtype)
    # K[d, q, e, f, c, a, b, o] = sum_{u,v} R[a,u,d,e] R[b,v,q,f] W[u,v,c,o]
    k = jnp.einsum("aude,bvqf,uvco->dqefcabo", r, r, w)
    kh, kw, _, _, cin, _, _, cout = k.shape
    return k.reshape(kh, kw, 4 * cin, 4 * cout)


def phase_batch_view(z: jnp.ndarray) -> jnp.ndarray:
    """Reshape (B, H, W, 4C) phase-space -> (B, H, 4W, C) so a standard
    BatchNorm over (0, 1, 2) reduces over batch, space, AND phases per
    canonical channel — numerically identical to BN on the full-res map."""
    b, h, w, c4 = z.shape
    return z.reshape(b, h, w * 4, c4 // 4)


def phase_batch_unview(y: jnp.ndarray) -> jnp.ndarray:
    b, h, w4, c = y.shape
    return y.reshape(b, h, w4 // 4, 4 * c)


# ---------------------------------------------------------------------------
# Compact (2x2-tap) folded kernels.
#
# The 3x3 folded kernels above are exact but carry structural zeros: for any
# output phase a, only 2 of the 3 low-res row taps are live (the third is
# identically zero by the _FOLD_F/_ROUTE construction), so XLA burns
# (3/2)^2 = 2.25x the necessary MXU FLOPs multiplying zeros. The compact
# form drops the dead tap: each output phase needs a 2x2 window, but phase
# a=0 wants low-res rows {i-1, i} while a=1 wants {i, i+1}. A single VALID
# 2x2 conv over a once-padded input evaluates BOTH windows (position j
# covers rows {j-1, j}), so each output phase group is just a shifted slice
# of the same conv output — no extra compute, and the slices fuse into the
# following BatchNorm/consumer.
#
#   _FOLD_F2[a, d, u]:    phase a, compact tap d in {0,1}, canonical tap u.
#   _ROUTE2[a, d, e, u]:  additionally input phase e (phase-space input).
_FOLD_F2 = np.zeros((2, 2, 3), np.float32)
_FOLD_F2[0, 0, 0] = 1.0  # a=0 @ window rows (i-1, i): d=0 row i-1 <- W0
_FOLD_F2[0, 1, 1] = 1.0  # d=1 row i <- W1+W2 (both interleaved rows land on i)
_FOLD_F2[0, 1, 2] = 1.0
_FOLD_F2[1, 0, 0] = 1.0  # a=1 @ window rows (i, i+1): d=0 row i <- W0+W1
_FOLD_F2[1, 0, 1] = 1.0
_FOLD_F2[1, 1, 2] = 1.0  # d=1 row i+1 <- W2

_ROUTE2 = np.zeros((2, 2, 2, 3), np.float32)
_ROUTE2[0, 0, 1, 0] = 1.0  # a=0: interleaved row 2i-1 = (r=i-1, e=1) <- W0
_ROUTE2[0, 1, 0, 1] = 1.0  #      row 2i   = (r=i, e=0) <- W1
_ROUTE2[0, 1, 1, 2] = 1.0  #      row 2i+1 = (r=i, e=1) <- W2
_ROUTE2[1, 0, 0, 0] = 1.0  # a=1: row 2i   = (r=i, e=0) <- W0
_ROUTE2[1, 0, 1, 1] = 1.0  #      row 2i+1 = (r=i, e=1) <- W1
_ROUTE2[1, 1, 0, 2] = 1.0  #      row 2i+2 = (r=i+1, e=0) <- W2


def fold_up2_kernel_c(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, Cout) -> (2, 2, Cin, 4*Cout) compact form of
    `fold_up2_kernel`; apply with `conv2x2_shifted`."""
    f = jnp.asarray(_FOLD_F2, w.dtype)
    k = jnp.einsum("adu,bev,uvco->decabo", f, f, w)
    kh, kw, cin, _, _, cout = k.shape
    return k.reshape(kh, kw, cin, 4 * cout)


def phase_conv_kernel_c(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, Cout) -> (2, 2, 4*Cin, 4*Cout) compact form of
    `phase_conv_kernel`; apply with `conv2x2_shifted`. FLOPs:
    2*4*(4Cin)*(4Cout)*(HW/4) = 16*Cin*Cout*HW vs the canonical conv's
    18*Cin*Cout*HW — phase space becomes (slightly) FLOP-cheaper than the
    interleaved conv while using 4x wider (MXU-friendly) channels."""
    r = jnp.asarray(_ROUTE2, w.dtype)
    k = jnp.einsum("adeu,bqfv,uvco->dqefcabo", r, r, w)
    kh, kw, _, _, cin, _, _, cout = k.shape
    return k.reshape(kh, kw, 4 * cin, 4 * cout)


def conv2x2_shifted(z: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Apply a compact folded kernel: VALID 2x2 conv over a once-padded
    input, then per-phase-group shifted slices (group (a,b) at offset
    (a,b)). Output (B, H, W, 4*Co) in phase-major channel layout."""
    import jax

    b, h, w, _ = z.shape
    co = k.shape[-1] // 4
    zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        zp, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )  # (B, H+1, W+1, 4*Co)
    parts = []
    for a in range(2):
        for bb in range(2):
            g = 2 * a + bb
            parts.append(y[:, a : h + a, bb : w + bb, g * co : (g + 1) * co])
    return jnp.concatenate(parts, axis=-1)


# ---------------------------------------------------------------------------
# SNUNet phase-space transforms (round 3): the nested level-0 grid runs 12
# convs at 224^2 with C=32 (25% MXU lane efficiency); in phase space they are
# 128-channel convs at 112^2. All exact reparameterizations of the canonical
# parameters (checkpoints unaffected).

def fold_tconv2x_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """torch-layout ConvTranspose2d(k=2, s=2) kernel (2, 2, Cout, Cin) ->
    phase-space 1x1 kernel (1, 1, Cin, 4*Cout) such that
    s2d(conv_transpose2x(x, w)) == conv1x1(x, K): the k2/s2 transposed conv
    writes each output phase (a, b) as x @ w[a, b] with no overlap."""
    k2, _, cout, cin = w.shape
    assert k2 == 2
    k = jnp.transpose(w, (3, 0, 1, 2))  # (Cin, 2, 2, Cout)
    return k.reshape(1, 1, cin, 4 * cout)


def fold_stem_s2d_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Canonical 7x7 stem kernel (7, 7, Cin, Cout) -> (4, 4, 4*Cin, Cout)
    such that (stride-2, pad-3 correlation)

      conv7x7_s2_p3(x, w) == conv4x4_s1(space_to_depth(x), K)  with
      padding ((2, 1), (2, 1)).

    Why: the ResNet stem contracts over only Cin=6 of the MXU's 128 K-lanes
    (docs/performance.md "small-channel lane padding"); folding the input
    2x2 quadruples the contraction width (6 -> 24) at a 64/49 tap-slot cost
    (the (ta=0, p=0) slots are structural zeros). Exact reparameterization:
    output row i tap k reads x[2i + k - 3] = Z[i + floor((k-3)/2), phase
    (k-3) mod 2], so the 7 taps land in 4 low-res taps x 2 phases with the
    k=-1 slot empty — front-padding w to 8x8 makes the fold a pure
    reshape/transpose (Wp[2*ta + p] = W[2*ta + p - 1])."""
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (7, 7), "stem fold is the 7x7/s2/p3 geometry"
    wp = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
    k = wp.reshape(4, 2, 4, 2, cin, cout).transpose(0, 2, 1, 3, 4, 5)
    return k.reshape(4, 4, 4 * cin, cout)


def phase_1x1_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Canonical 1x1 kernel (1, 1, C, O) -> block-diagonal phase kernel
    (1, 1, 4C, 4O): each phase group maps through the same 1x1 conv."""
    _, _, c, o = w.shape
    eye = jnp.eye(4, dtype=w.dtype)
    k = jnp.einsum("pq,co->pcqo", eye, w[0, 0])
    return k.reshape(4 * c, 4 * o)[None, None]


def phase_max_pool2x2(z: jnp.ndarray) -> jnp.ndarray:
    """MaxPool2d(2, 2) of the full-res map, computed in phase space: the
    2x2 stride-2 window of X is exactly the 4 phase copies of each canonical
    channel. (B, H, W, 4C) -> (B, H, W, C), elementwise max."""
    b, h, w, c4 = z.shape
    return jnp.max(z.reshape(b, h, w, 4, c4 // 4), axis=3)


def phase_channel_pools(z: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Global (avg, max) pools PER CANONICAL CHANNEL of a phase tensor:
    (B, H, W, 4C) -> two (B, 1, 1, C). Equal to pooling depth_to_space(z)."""
    b, h, w, c4 = z.shape
    v = z.reshape(b, h * w * 4, c4 // 4)
    return v.mean(axis=1)[:, None, None, :], v.max(axis=1)[:, None, None, :]


def phase_tile_channels(v: jnp.ndarray) -> jnp.ndarray:
    """Broadcast a per-canonical-channel vector (B, 1, 1, C) into phase
    layout (B, 1, 1, 4C) (phase-major: value repeats for each phase)."""
    return jnp.tile(v, (1, 1, 1, 4))
