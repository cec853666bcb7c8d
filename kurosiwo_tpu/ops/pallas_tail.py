"""Fused Pallas loss/metrics tail: weighted CE + confusion matrix in one pass.

Motivation (docs/performance.md, round-2 profile): the step's loss/metric
tail costs ~1.5-2 ms at UNet-b128 because the XLA formulation materializes
one-hot intermediates — f32 (B,224,224,3) log-prob maps for the CE
(utilities/utilities.py:307-347 reference semantics) and two bf16
(N,4) one-hots for the confusion-matrix einsum. This kernel reads the
logits ONCE as three class planes plus the s32 mask and emits per-block
partials for: the weighted-NLL numerator, the valid-weight denominator, and
all 9 live confusion-matrix cells. A matching backward kernel produces
dlogits in a single fused pass (softmax recompute, no stored probabilities).

Layout strategy (tpu-layout-lessons): planes are (M, 512) views of the
flattened (B*H*W,) pixel stream — 512 is lane-aligned, the reshape from the
(B,H,W,3) slice is one fused XLA copy, and no lane-folding of spatial
positions across tiles occurs (the per-pixel math is elementwise in plane
space). Class count is fixed at 3 (the Kuro Siwo label set; ignore=3).

Numerics: identical math to ops/losses.cross_entropy_loss (f32 logsumexp on
f32-upcast logits, torch-CE weight-sum denominator) and ops/metrics
.confusion_matrix (label!=3 rows only; counts exact in f32 below 2^24).
Argmax tie-breaking matches jnp.argmax (first max wins).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 512
ROWS = 128
IGNORE_INDEX = 3


def _plane_views(logits: jnp.ndarray, labels: jnp.ndarray):
    """(B,H,W,3)+(B,H,W) -> three (M,LANES) bf16/f32 planes + (M,LANES) s32
    labels, padding the flattened pixel stream with ignore pixels."""
    n = logits.shape[0] * logits.shape[1] * logits.shape[2]
    block = LANES * ROWS
    n_pad = -(-n // block) * block
    planes = []
    for c in range(3):
        f = logits[..., c].reshape(n)
        if n_pad != n:
            f = jnp.pad(f, (0, n_pad - n))
        planes.append(f.reshape(n_pad // LANES, LANES))
    lab = labels.astype(jnp.int32).reshape(n)
    if n_pad != n:
        lab = jnp.pad(lab, (0, n_pad - n), constant_values=IGNORE_INDEX)
    return planes, lab.reshape(n_pad // LANES, LANES)


def _fwd_kernel(cw_ref, l0, l1, l2, lab_ref, out_ref):
    x0 = l0[...].astype(jnp.float32)
    x1 = l1[...].astype(jnp.float32)
    x2 = l2[...].astype(jnp.float32)
    lab = lab_ref[...]
    m = jnp.maximum(x0, jnp.maximum(x1, x2))
    e0 = jnp.exp(x0 - m)
    e1 = jnp.exp(x1 - m)
    e2 = jnp.exp(x2 - m)
    lse = m + jnp.log(e0 + e1 + e2)
    is0 = lab == 0
    is1 = lab == 1
    is2 = lab == 2
    valid = (lab != IGNORE_INDEX).astype(jnp.float32)
    picked = jnp.where(is0, x0, jnp.where(is1, x1, x2))
    w = valid * jnp.where(is0, cw_ref[0], jnp.where(is1, cw_ref[1], cw_ref[2]))
    num = jnp.sum(w * (lse - picked))
    den = jnp.sum(w)
    # argmax with first-max-wins ties (jnp.argmax semantics)
    p1 = x1 > x0
    pred2 = x2 > jnp.maximum(x0, x1)
    pj0 = (~pred2 & ~p1).astype(jnp.float32)
    pj1 = (~pred2 & p1).astype(jnp.float32)
    pj2 = pred2.astype(jnp.float32)
    i0 = valid * is0.astype(jnp.float32)
    i1 = valid * is1.astype(jnp.float32)
    i2 = valid * is2.astype(jnp.float32)
    # partials vector, duplicated over 8 sublanes (Mosaic requires the last
    # two output block dims to be (8,128)-divisible; the host sums row 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 2)
    acc = jnp.where(lane == 0, num, 0.0)
    acc = jnp.where(lane == 1, den, acc)
    k = 32
    for li, ind in enumerate((i0, i1, i2)):
        for pj, pv in enumerate((pj0, pj1, pj2)):
            acc = jnp.where(lane == k + 4 * li + pj, jnp.sum(ind * pv), acc)
    out_ref[...] = acc


def _bwd_kernel(cw_ref, gs_ref, l0, l1, l2, lab_ref, g0, g1, g2):
    x0 = l0[...].astype(jnp.float32)
    x1 = l1[...].astype(jnp.float32)
    x2 = l2[...].astype(jnp.float32)
    lab = lab_ref[...]
    m = jnp.maximum(x0, jnp.maximum(x1, x2))
    e0 = jnp.exp(x0 - m)
    e1 = jnp.exp(x1 - m)
    e2 = jnp.exp(x2 - m)
    s = e0 + e1 + e2
    is0 = lab == 0
    is1 = lab == 1
    is2 = lab == 2
    valid = (lab != IGNORE_INDEX).astype(jnp.float32)
    w = valid * jnp.where(is0, cw_ref[0], jnp.where(is1, cw_ref[1], cw_ref[2]))
    gw = gs_ref[0] * w
    g0[...] = (gw * (e0 / s - is0.astype(jnp.float32))).astype(g0.dtype)
    g1[...] = (gw * (e1 / s - is1.astype(jnp.float32))).astype(g1.dtype)
    g2[...] = (gw * (e2 / s - is2.astype(jnp.float32))).astype(g2.dtype)


def _run_fwd(logits, labels, cw, interpret):
    planes, lab = _plane_views(logits, labels)
    mrows = planes[0].shape[0]
    grid = (mrows // ROWS,)
    blk = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0))
    partials = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            blk, blk, blk, blk,
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((grid[0], 8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(cw, *planes, lab)
    sums = jnp.sum(partials[:, 0, :], axis=0)
    total_w = jnp.maximum(sums[1], 1e-12)
    loss = sums[0] / total_w
    cm = sums[32:48].reshape(4, 4)
    return loss, cm, total_w


def _run_bwd(logits, labels, cw, gscale, interpret):
    planes, lab = _plane_views(logits, labels)
    mrows = planes[0].shape[0]
    grid = (mrows // ROWS,)
    blk = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0))
    pshape = jax.ShapeDtypeStruct(planes[0].shape, logits.dtype)
    gplanes = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            blk, blk, blk, blk,
        ],
        out_specs=(blk, blk, blk),
        out_shape=(pshape, pshape, pshape),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(cw, gscale.reshape(1), *planes, lab)
    b, h, wd = labels.shape
    n = b * h * wd
    stacked = jnp.stack([g.reshape(-1)[:n] for g in gplanes], axis=-1)
    return stacked.reshape(b, h, wd, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_ce_cm(logits, labels, class_weights, interpret=False):
    """Weighted CE loss (ignore_index=3, torch weight-sum denominator) AND the
    4x4 confusion matrix over valid pixels, in one fused device pass.

    logits: (B,H,W,3) bf16/f32; labels: (B,H,W) int; class_weights: (3,) f32.
    Returns (loss f32 scalar, cm (4,4) f32 — exact counts below 2^24).
    Gradients flow through the loss only (cm cotangent ignored — it feeds the
    metric bank, never the optimizer).
    """
    loss, cm, _ = _run_fwd(logits, labels, jnp.asarray(class_weights, jnp.float32), interpret)
    return loss, cm


def _fused_fwd(logits, labels, class_weights, interpret):
    cw = jnp.asarray(class_weights, jnp.float32)
    loss, cm, total_w = _run_fwd(logits, labels, cw, interpret)
    return (loss, cm), (logits, labels, cw, total_w)


def _fused_bwd(interpret, res, cot):
    g_loss, _g_cm = cot
    logits, labels, cw, total_w = res
    gscale = (g_loss / total_w).astype(jnp.float32)
    d = _run_bwd(logits, labels, cw, gscale, interpret)
    return d, None, None


fused_ce_cm.defvjp(_fused_fwd, _fused_bwd)
