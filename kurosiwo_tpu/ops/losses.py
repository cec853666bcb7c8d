"""Segmentation losses, JAX-native.

Capability parity with the reference loss factory
(`/root/reference/utilities/utilities.py:307-347`,
`/root/reference/utilities/dice.py`, `/root/reference/utilities/bce_and_dice.py`):

  cross_entropy  weighted CE, ignore_index=3 (train weighted, val unweighted)
  dice           soft dice over softmax probs, batch-global over (C,H,W),
                 eps=1e-6 added to the one-hot (reference quirk, replicated)
  focal          multi-class focal loss (alpha=class_weights, gamma=2),
                 implemented natively (the reference pulls it from torch.hub)
  iou            Lovasz-softmax, multiclass, ignore_index=3
  ce+dice        weighted CE + dice

All losses take `logits` of shape (B, H, W, C) [NHWC — TPU-native layout] and
integer `labels` of shape (B, H, W) with values in {0,1,2,3}, 3 = ignore.

Note on siamese models: the reference's siam_diff/siam_conc emit log-softmax
and the trainer still applies CrossEntropyLoss on them
(`/root/reference/models/siam_diff.py:173`). We replicate by treating every
model output uniformly as logits — identical computation.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

IGNORE_INDEX = 3


def _valid_mask(labels: jnp.ndarray, ignore_index: int = IGNORE_INDEX) -> jnp.ndarray:
    return (labels != ignore_index).astype(jnp.float32)


def _ce_parts(logits, labels, cw):
    """Shared forward math: per-pixel weight w and weighted NLL pieces (f32)."""
    num_classes = logits.shape[-1]
    logits = logits.astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    one_hot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)  # ignore rows all-zero
    picked = jnp.sum(log_probs * one_hot, axis=-1)
    w = jnp.sum(one_hot * cw, axis=-1)
    total_w = jnp.maximum(jnp.sum(w), 1e-12)
    return -jnp.sum(picked * w) / total_w, total_w


@jax.custom_vjp
def _weighted_ce(logits, labels, cw):
    return _ce_parts(logits, labels, cw)[0]


def _weighted_ce_fwd(logits, labels, cw):
    loss, total_w = _ce_parts(logits, labels, cw)
    # residuals are the raw inputs — the backward recomputes softmax in one
    # fused elementwise pass instead of XLA saving the f32 log-prob map
    return loss, (logits, labels, cw, total_w)


def _weighted_ce_bwd(res, g):
    logits, labels, cw, total_w = res
    num_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    one_hot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    w = jnp.sum(one_hot * cw, axis=-1)
    d = (g / total_w) * w[..., None] * (probs - one_hot)
    return d.astype(logits.dtype), None, None


_weighted_ce.defvjp(_weighted_ce_fwd, _weighted_ce_bwd)


def cross_entropy_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    class_weights: jnp.ndarray | None = None,
    ignore_index: int = IGNORE_INDEX,
) -> jnp.ndarray:
    """Weighted softmax cross entropy with ignore_index, mean-reduced like
    torch.nn.CrossEntropyLoss(weight=w, ignore_index=3): the denominator is the
    sum of the weights of the *valid* targets (not the pixel count).

    TPU notes: formulated with one-hot multiplies, NOT take_along_axis — on
    TPU the gather lowers to a serial dynamic-slice loop that costs more
    than the model's entire fwd+bwd at 224x224 batch sizes (measured 92ms vs
    56ms on v5e). Forward/backward are a fused custom_vjp pair: the backward
    recomputes softmax from the (possibly bf16) logits rather than having XLA
    materialize and re-read an f32 log-prob map of the whole batch.
    """
    num_classes = logits.shape[-1]
    if class_weights is None:
        cw = jnp.ones((num_classes,), jnp.float32)
    else:
        cw = jnp.asarray(class_weights, jnp.float32)
    # the one-hot formulation ignores label==ignore_index only because that
    # value lies outside [0, C) (one_hot emits a zero row); enforce it so a
    # wider head can't silently train on invalid pixels
    assert ignore_index >= num_classes, (
        f"ignore_index {ignore_index} must be >= num_classes {num_classes} "
        "for the one-hot ignore formulation")
    return _weighted_ce(logits, labels, cw)


def dice_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_index: int | None = IGNORE_INDEX,
    use_softmax: bool = True,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Soft dice replicating reference semantics (utilities/dice.py:92-137):
    ignored pixels are *re-labeled as class 0* in the one-hot (not dropped),
    eps is added to every one-hot entry, and the dice score is computed
    globally over (C, H, W) per sample, then averaged over the batch."""
    num_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1) if use_softmax else logits.astype(jnp.float32)
    if ignore_index is not None:
        masked_labels = jnp.where(labels == ignore_index, 0, labels)
    else:
        masked_labels = labels
    one_hot = jax.nn.one_hot(masked_labels, num_classes, dtype=jnp.float32) + eps
    dims = tuple(range(1, probs.ndim))  # (H, W, C) — all but batch
    intersection = jnp.sum(probs * one_hot, axis=dims)
    cardinality = jnp.sum(probs + one_hot, axis=dims)
    dice_score = 2.0 * intersection / (cardinality + eps)
    return jnp.mean(1.0 - dice_score)


def smp_dice_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_index: int = IGNORE_INDEX,
    eps: float = 1e-7,
) -> jnp.ndarray:
    """smp.losses.DiceLoss(mode="multiclass", ignore_index=3) semantics —
    the loss the reference's plain "dice" branch constructs
    (utilities/utilities.py:325-326). Differs from `dice_loss` (the
    torchgeometry-style form used inside the reference's ce+dice,
    bce_and_dice.py): ignored pixels are MASKED OUT of both prediction and
    one-hot (not relabeled to class 0), no eps is added to the one-hot, the
    score aggregates per class over batch+spatial (smp dims=(0, 2)) and the
    per-class losses of classes absent from the batch are zeroed before the
    class mean."""
    num_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    valid = (labels != ignore_index)[..., None].astype(jnp.float32)
    one_hot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32) * valid
    probs = probs * valid
    dims = tuple(range(probs.ndim - 1))  # batch + spatial, per class
    intersection = jnp.sum(probs * one_hot, axis=dims)
    cardinality = jnp.sum(probs + one_hot, axis=dims)
    score = 2.0 * intersection / jnp.maximum(cardinality, eps)
    loss = 1.0 - score
    present = (jnp.sum(one_hot, axis=dims) > 0).astype(jnp.float32)
    return jnp.mean(loss * present)


def focal_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    alpha: jnp.ndarray | None = None,
    gamma: float = 2.0,
    ignore_index: int = IGNORE_INDEX,
) -> jnp.ndarray:
    """Multi-class focal loss: FL = -alpha_t (1 - p_t)^gamma log(p_t), mean
    over valid pixels — matches the torch.hub 'adeelh' focal loss the
    reference loads (utilities/utilities.py:333-341)."""
    num_classes = logits.shape[-1]
    assert ignore_index >= num_classes, (
        f"ignore_index {ignore_index} must be >= num_classes {num_classes} "
        "for the one-hot ignore formulation")
    logits = logits.astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    one_hot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)  # zero rows when ignored
    log_pt = jnp.sum(log_probs * one_hot, axis=-1)
    pt = jnp.exp(log_pt)
    focal = -((1.0 - pt) ** gamma) * log_pt
    if alpha is not None:
        a = jnp.asarray(alpha, jnp.float32)
        focal = focal * jnp.sum(one_hot * a, axis=-1)
    valid = jnp.sum(one_hot, axis=-1)
    return jnp.sum(focal * valid) / jnp.maximum(jnp.sum(valid), 1e-12)


def _lovasz_grad(gt_sorted: jnp.ndarray) -> jnp.ndarray:
    """Gradient of the Lovasz extension w.r.t. sorted errors (1D)."""
    gts = jnp.sum(gt_sorted)
    intersection = gts - jnp.cumsum(gt_sorted)
    union = gts + jnp.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
    return jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])


def lovasz_softmax_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_index: int = IGNORE_INDEX,
) -> jnp.ndarray:
    """Lovasz-softmax (present classes only, whole-batch flatten), matching
    smp.losses.LovaszLoss(mode="multiclass", ignore_index=3) defaults.

    Static-shape formulation for XLA: ignored pixels get error -1 so a
    descending sort pushes them to the tail, where their contribution is
    zeroed; cumulative sums over the valid prefix are untouched.
    """
    num_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    flat_probs = probs.reshape(-1, num_classes)
    flat_labels = labels.reshape(-1)
    valid = flat_labels != ignore_index

    def per_class(c):
        fg = jnp.where(valid, (flat_labels == c).astype(jnp.float32), 0.0)
        errors = jnp.abs(fg - flat_probs[:, c])
        errors = jnp.where(valid, errors, -1.0)
        order = jnp.argsort(-errors)
        errors_sorted = errors[order]
        fg_sorted = fg[order]
        valid_sorted = valid[order]
        grad = _lovasz_grad(fg_sorted)
        loss_c = jnp.sum(jnp.where(valid_sorted, errors_sorted, 0.0) * grad)
        present = jnp.sum(fg) > 0
        return loss_c, present

    losses, present = jax.vmap(per_class)(jnp.arange(num_classes))
    present = present.astype(jnp.float32)
    return jnp.sum(losses * present) / jnp.maximum(jnp.sum(present), 1.0)


def ce_and_dice_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    class_weights: jnp.ndarray | None = None,
    ignore_index: int = IGNORE_INDEX,
) -> jnp.ndarray:
    """BCEandDiceLoss parity (utilities/bce_and_dice.py:7-23): weighted CE +
    softmax dice, summed."""
    return cross_entropy_loss(logits, labels, class_weights, ignore_index) + dice_loss(
        logits, labels, ignore_index, use_softmax=True
    )


def create_loss(config: dict, mode: str = "val") -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Loss factory with the reference's selection semantics
    (utilities/utilities.py:307-347). `mode="train"` applies class weights for
    cross-entropy; eval always uses unweighted CE."""
    name = config.get("loss_function", "cross_entropy")
    weights = jnp.asarray(config.get("class_weights", [1.0, 1.0, 1.0]), jnp.float32)
    if name == "cross_entropy":
        cw = weights if mode == "train" else None
        return functools.partial(cross_entropy_loss, class_weights=cw)
    if name == "iou":
        return lovasz_softmax_loss
    if name == "dice":
        # smp.DiceLoss semantics, NOT dice_loss — the torchgeometry form is
        # only what the reference's ce+dice composes (bce_and_dice.py:13)
        return smp_dice_loss
    if name == "focal":
        return functools.partial(focal_loss, alpha=weights, gamma=2.0)
    if name == "ce+dice":
        return functools.partial(ce_and_dice_loss, class_weights=weights)
    raise NotImplementedError(f"loss {name!r} is not supported")
