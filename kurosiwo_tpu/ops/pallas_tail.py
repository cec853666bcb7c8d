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


def _fused_tail_blockers(config: dict, model_config: dict | None) -> list[str]:
    """Hard requirements of the fused CE+cm kernels (any failure means the
    train step MUST keep the XLA tail). Single source of truth — steps.py
    and the model factory both go through resolve_fused_tail, so the model's
    phase-logits wiring can never disagree with the step's tail choice."""
    blockers = []
    if config.get("loss_function", "cross_entropy") != "cross_entropy":
        blockers.append("loss_function must be cross_entropy")
    if int(config.get("num_classes", 3)) != 3:
        blockers.append("num_classes must be 3")
    if (model_config or {}).get("multi_scale_train"):
        blockers.append("multi_scale_train deep supervision is unsupported")
    if config.get("log_zone_metrics"):
        blockers.append("log_zone_metrics needs the XLA per-zone cm banks")
    if jax.device_count() != 1:
        blockers.append(
            "requires a single device (the tail pallas_call is unpartitioned; "
            "multi-chip keeps the XLA tail — its ~2 ms is noise next to "
            "pod-scale collectives)")
    return blockers


def resolve_fused_tail(config: dict, task: str = "segmentation",
                       model_config: dict | None = None, strict: bool = True):
    """Resolve the loss/metrics-tail implementation for a train step.

    Returns "phase" (phase-native fused kernel), True (plane-split fused
    kernel), or None (XLA one-hot tail). An explicit config["fused_tail"]
    wins; under strict=True (the train step) an explicit-but-ineligible flag
    raises a ValueError naming the blocker (a silent fallback would leave
    the model emitting phase logits into the XLA tail). The model factory
    and the eval step resolve with strict=False: they only need the
    phase-logits fact, and e.g. a phase-trained checkpoint must stay
    loadable for eval on a multi-device host where the TRAIN-side
    single-device blocker holds (eval never runs the fused kernel — it
    interleaves phase logits back with depth_to_space). The "auto" default
    enables the phase-native kernel only for the UNet segmentation step on
    a single TPU chip — measured +2.4% end-to-end (3,279 -> 3,357
    patches/s, r3 same-session A/B). Everything else keeps the XLA tail:
    non-phase models pay the plane-split relayouts (3,266 -> 2,657,
    docs/performance.md), and the CPU interpret path is test-only.
    """
    flag = config.get("fused_tail", "auto")
    is_unet_seg = (
        task == "segmentation" and str(config.get("method", "")).lower() == "unet"
    )
    if flag != "auto":
        flag = flag or None
        if flag and strict:
            blockers = _fused_tail_blockers(config, model_config)
            if flag == "phase" and not is_unet_seg:
                # only the unet segmentation head emits phase logits; any
                # other model would silently run the plane-split kernel (a
                # documented 3,266 -> 2,657 regression) instead
                blockers.append('fused_tail="phase" needs the unet segmentation head')
            if blockers:
                raise ValueError(
                    f"config requests fused_tail={flag!r} but the fused "
                    f"CE+cm tail cannot apply: {'; '.join(blockers)}")
        return flag
    from .backend import is_tpu_backend

    if (
        is_unet_seg
        and not _fused_tail_blockers(config, model_config)
        and is_tpu_backend()
    ):
        return "phase"
    return None


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
    metric bank, never the optimizer). class_weights is treated as a
    non-trained constant: its cotangent is zero (the reference never learns
    class weights; ops/losses.cross_entropy_loss is the path to use if that
    ever changes).
    """
    assert logits.shape[-1] == 3, (
        f"fused_ce_cm is specialized to 3 classes (+ignore), got C={logits.shape[-1]}")
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


# ---------------------------------------------------------------------------
# Phase-native variant (round 3): consumes the decoder head's PHASE-space
# logits (B, H, W, 4*3) directly — the plane-split variant above measured a
# 3,266 -> 2,657 patches/s regression because slicing class planes out of
# the phase layout materialized three (B,112,2,112,2) reshapes + copies
# (~11 ms). Here the kernel reads the interleaved (..., p*3+c) lanes as-is:
# class groups are contiguous triples, reduced with two lane-rolls; the mask
# arrives phase-folded and replicated per class (exact in bf16). dlogits are
# emitted IN PHASE LAYOUT, feeding the head conv's backward natively.

def _phase_prep(zlogits, labels):
    b, h, w, c12 = zlogits.shape
    assert c12 == 12, zlogits.shape
    from .phase import space_to_depth_mask

    m = space_to_depth_mask(labels.astype(jnp.int32))  # (B,H,W,4)
    m12 = jnp.repeat(m.astype(jnp.bfloat16), 3, axis=-1)  # (B,H,W,12): label per (p,c)
    lanes = w * 12
    z = zlogits.reshape(b * h, lanes)
    m12 = m12.reshape(b * h, lanes)
    rows = b * h
    rpad = -(-rows // ROWS) * ROWS
    if rpad != rows:
        z = jnp.pad(z, ((0, rpad - rows), (0, 0)))
        m12 = jnp.pad(m12, ((0, rpad - rows), (0, 0)), constant_values=float(IGNORE_INDEX))
    return z, m12, lanes


def _phase_fwd_kernel(cw_ref, z_ref, lab_ref, out_ref):
    x = z_ref[...].astype(jnp.float32)
    lab = lab_ref[...].astype(jnp.float32)
    L = x.shape[1]
    # pltpu.roll takes non-negative shifts; roll by L-k == roll by -k, and
    # the wrap-around lanes never land on class-group anchors (L % 3 == 0)
    r1 = pltpu.roll(x, L - 1, 1)
    r2 = pltpu.roll(x, L - 2, 1)
    ci = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) % 3
    anchor = (ci == 0).astype(jnp.float32)
    m = jnp.maximum(x, jnp.maximum(r1, r2))
    e0 = jnp.exp(x - m)
    e1 = jnp.exp(r1 - m)
    e2 = jnp.exp(r2 - m)
    lse_a = m + jnp.log(e0 + e1 + e2)  # valid at anchors
    lse = jnp.where(ci == 0, lse_a, jnp.where(ci == 1, pltpu.roll(lse_a, 1, 1), pltpu.roll(lse_a, 2, 1)))
    valid = (lab != float(IGNORE_INDEX)).astype(jnp.float32)
    w = valid * jnp.where(lab == 0.0, cw_ref[0], jnp.where(lab == 1.0, cw_ref[1], cw_ref[2]))
    sel = (lab == ci.astype(jnp.float32)).astype(jnp.float32)
    num = jnp.sum(sel * w * (lse - x))
    den = jnp.sum(anchor * w)
    # argmax at anchors (first max wins)
    p1 = r1 > x
    pred2 = r2 > jnp.maximum(x, r1)
    pj0 = (~pred2 & ~p1).astype(jnp.float32) * anchor
    pj1 = (~pred2 & p1).astype(jnp.float32) * anchor
    pj2 = pred2.astype(jnp.float32) * anchor
    i0 = valid * (lab == 0.0).astype(jnp.float32)
    i1 = valid * (lab == 1.0).astype(jnp.float32)
    i2 = valid * (lab == 2.0).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 2)
    acc = jnp.where(lane == 0, num, 0.0)
    acc = jnp.where(lane == 1, den, acc)
    k = 32
    for li, ind in enumerate((i0, i1, i2)):
        for pj, pv in enumerate((pj0, pj1, pj2)):
            acc = jnp.where(lane == k + 4 * li + pj, jnp.sum(ind * pv), acc)
    out_ref[...] = acc


def _phase_bwd_kernel(cw_ref, gs_ref, z_ref, lab_ref, d_ref):
    x = z_ref[...].astype(jnp.float32)
    lab = lab_ref[...].astype(jnp.float32)
    L = x.shape[1]
    r1 = pltpu.roll(x, L - 1, 1)
    r2 = pltpu.roll(x, L - 2, 1)
    ci = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) % 3
    m = jnp.maximum(x, jnp.maximum(r1, r2))
    lse_a = m + jnp.log(jnp.exp(x - m) + jnp.exp(r1 - m) + jnp.exp(r2 - m))
    lse = jnp.where(ci == 0, lse_a, jnp.where(ci == 1, pltpu.roll(lse_a, 1, 1), pltpu.roll(lse_a, 2, 1)))
    valid = (lab != float(IGNORE_INDEX)).astype(jnp.float32)
    w = valid * jnp.where(lab == 0.0, cw_ref[0], jnp.where(lab == 1.0, cw_ref[1], cw_ref[2]))
    sel = (lab == ci.astype(jnp.float32)).astype(jnp.float32)
    d_ref[...] = (gs_ref[0] * w * (jnp.exp(x - lse) - sel)).astype(d_ref.dtype)


def _phase_run_fwd(zlogits, labels, cw, interpret):
    z, m12, lanes = _phase_prep(zlogits, labels)
    grid = (z.shape[0] // ROWS,)
    blk = pl.BlockSpec((ROWS, lanes), lambda i: (i, 0))
    partials = pl.pallas_call(
        _phase_fwd_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), blk, blk],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((grid[0], 8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(cw, z, m12)
    sums = jnp.sum(partials[:, 0, :], axis=0)
    total_w = jnp.maximum(sums[1], 1e-12)
    return sums[0] / total_w, sums[32:48].reshape(4, 4), total_w


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_ce_cm_phase(zlogits, labels, class_weights, interpret=False):
    """Weighted CE + 4x4 confusion matrix from PHASE-space logits
    (B, H, W, 12) against the full-res labels (B, 2H, 2W). Identical math to
    fused_ce_cm on depth_to_space(zlogits) — without ever materializing the
    interleaved logits. Gradient flows to zlogits in phase layout;
    class_weights is a non-trained constant (zero cotangent, see
    fused_ce_cm)."""
    loss, cm, _ = _phase_run_fwd(zlogits, labels, jnp.asarray(class_weights, jnp.float32), interpret)
    return loss, cm


def _phase_fused_fwd(zlogits, labels, class_weights, interpret):
    cw = jnp.asarray(class_weights, jnp.float32)
    loss, cm, total_w = _phase_run_fwd(zlogits, labels, cw, interpret)
    return (loss, cm), (zlogits, labels, cw, total_w)


def _phase_fused_bwd(interpret, res, cot):
    g_loss, _ = cot
    zlogits, labels, cw, total_w = res
    gscale = (g_loss / total_w).astype(jnp.float32)
    z, m12, lanes = _phase_prep(zlogits, labels)
    grid = (z.shape[0] // ROWS,)
    blk = pl.BlockSpec((ROWS, lanes), lambda i: (i, 0))
    d = pl.pallas_call(
        _phase_bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            blk, blk,
        ],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct(z.shape, zlogits.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(cw, gscale.reshape(1), z, m12)
    b, h, w, _ = zlogits.shape
    d = d[: b * h].reshape(b, h, w, 12)
    return d, None, None


fused_ce_cm_phase.defvjp(_phase_fused_fwd, _phase_fused_bwd)
