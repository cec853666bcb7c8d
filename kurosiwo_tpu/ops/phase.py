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
    return k.transpose(0, 1, 2, 3, 4, 5, 6, 7).reshape(kh, kw, 4 * cin, 4 * cout)


def phase_batch_view(z: jnp.ndarray) -> jnp.ndarray:
    """Reshape (B, H, W, 4C) phase-space -> (B, H, 4W, C) so a standard
    BatchNorm over (0, 1, 2) reduces over batch, space, AND phases per
    canonical channel — numerically identical to BN on the full-res map."""
    b, h, w, c4 = z.shape
    return z.reshape(b, h, w * 4, c4 // 4)


def phase_batch_unview(y: jnp.ndarray) -> jnp.ndarray:
    b, h, w4, c = y.shape
    return y.reshape(b, h, w4 // 4, 4 * c)
