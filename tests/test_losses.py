"""Loss parity tests vs torch reference semantics (torch CPU is available in
the image, used ONLY as a test oracle — never on any runtime path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from kurosiwo_tpu.ops import losses


def _rand(shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


def _rand_labels(shape, seed=1, num_classes=4):
    rng = np.random.RandomState(seed)
    return rng.randint(0, num_classes, size=shape).astype(np.int32)


class TestCrossEntropy:
    def test_matches_torch_unweighted(self):
        logits = _rand((2, 8, 8, 3))
        labels = _rand_labels((2, 8, 8))
        ours = losses.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels))
        ref = F.cross_entropy(
            torch.tensor(logits).permute(0, 3, 1, 2),
            torch.tensor(labels, dtype=torch.long),
            ignore_index=3,
        )
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)

    def test_matches_torch_weighted(self):
        logits = _rand((2, 8, 8, 3), 5)
        labels = _rand_labels((2, 8, 8), 6)
        w = [0.3716, 14.0098, 8.2041]
        ours = losses.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels), class_weights=w)
        ref = F.cross_entropy(
            torch.tensor(logits).permute(0, 3, 1, 2),
            torch.tensor(labels, dtype=torch.long),
            weight=torch.tensor(w),
            ignore_index=3,
        )
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)

    def test_all_ignored_is_finite(self):
        logits = jnp.asarray(_rand((1, 4, 4, 3)))
        labels = jnp.full((1, 4, 4), 3, jnp.int32)
        assert np.isfinite(float(losses.cross_entropy_loss(logits, labels)))


class TestDice:
    def test_matches_reference_quirks(self):
        """Replicates utilities/dice.py: ignored pixels relabeled to class 0,
        eps on one-hot, global (C,H,W) dice per-sample."""
        logits = _rand((2, 8, 8, 3), 7)
        labels = _rand_labels((2, 8, 8), 8)
        ours = float(losses.dice_loss(jnp.asarray(logits), jnp.asarray(labels)))

        # torch oracle implementing the reference's exact computation
        pred = torch.softmax(torch.tensor(logits).permute(0, 3, 1, 2), dim=1)
        t = torch.tensor(labels, dtype=torch.long)
        t = t * (t != 3)
        eps = 1e-6
        oh = torch.zeros(2, 3, 8, 8).scatter_(1, t.unsqueeze(1), 1.0) + eps
        inter = torch.sum(pred * oh, (1, 2, 3))
        card = torch.sum(pred + oh, (1, 2, 3))
        ref = torch.mean(1.0 - 2 * inter / (card + eps))
        np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


class TestFocal:
    def test_reduces_to_weighted_ce_at_gamma0(self):
        logits = _rand((2, 8, 8, 3), 9)
        labels = _rand_labels((2, 8, 8), 10)
        w = [0.5, 2.0, 1.0]
        ours = losses.focal_loss(jnp.asarray(logits), jnp.asarray(labels), alpha=w, gamma=0.0)
        # gamma=0 focal = alpha-weighted NLL with MEAN over valid pixels
        # (not weight-normalized like torch CE) — compute that directly.
        lp = torch.log_softmax(torch.tensor(logits).permute(0, 3, 1, 2), dim=1)
        t = torch.tensor(labels, dtype=torch.long)
        valid = t != 3
        ts = t.clone()
        ts[~valid] = 0
        picked = lp.gather(1, ts.unsqueeze(1)).squeeze(1)
        aw = torch.tensor(w)[ts]
        ref = (-(picked * aw)[valid]).sum() / valid.sum()
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


class TestLovasz:
    def test_perfect_prediction_near_zero(self):
        labels = _rand_labels((1, 16, 16), 11, num_classes=3)
        logits = np.full((1, 16, 16, 3), -20.0, np.float32)
        for c in range(3):
            logits[..., c][labels == c] = 20.0
        val = float(losses.lovasz_softmax_loss(jnp.asarray(logits), jnp.asarray(labels)))
        assert val < 1e-3

    def test_ignore_pixels_do_not_contribute(self):
        labels = _rand_labels((1, 8, 8), 12, num_classes=3)
        logits = _rand((1, 8, 8, 3), 13)
        base = float(losses.lovasz_softmax_loss(jnp.asarray(logits), jnp.asarray(labels)))
        labels2 = labels.copy()
        labels2[0, 0, :4] = 3  # ignore some pixels
        with_ign = float(losses.lovasz_softmax_loss(jnp.asarray(logits), jnp.asarray(labels2)))
        assert np.isfinite(with_ign) and with_ign != base


def test_create_loss_dispatch(base_config):
    for name in ["cross_entropy", "iou", "dice", "focal", "ce+dice"]:
        cfg = dict(base_config, loss_function=name)
        fn = losses.create_loss(cfg, mode="train")
        out = fn(jnp.asarray(_rand((1, 8, 8, 3))), jnp.asarray(_rand_labels((1, 8, 8))))
        assert np.isfinite(float(out))


def test_smp_dice_semantics():
    """create_loss('dice') follows smp.DiceLoss(mode='multiclass',
    ignore_index=3) — utilities/utilities.py:325-326 — not the
    torchgeometry-style dice the reference only composes inside ce+dice.
    Oracle: a direct torch transcription of smp's multiclass path
    (soft dice over dims=(0,2), ignored pixels masked out, absent-class
    losses zeroed before the class mean)."""
    import torch
    import torch.nn.functional as F

    from kurosiwo_tpu.ops.losses import create_loss, smp_dice_loss

    rng = np.random.RandomState(11)
    logits = rng.randn(2, 8, 8, 3).astype(np.float32)
    labels = rng.randint(0, 4, (2, 8, 8))

    def torch_smp_dice(logits_nhwc, labels_hw, eps=1e-7):
        t = torch.tensor(logits_nhwc).permute(0, 3, 1, 2)  # NCHW
        y = torch.tensor(labels_hw, dtype=torch.long)
        bs, c = t.shape[0], t.shape[1]
        y = y.view(bs, -1)
        pred = t.log_softmax(1).exp().view(bs, c, -1)
        mask = y != 3
        pred = pred * mask.unsqueeze(1)
        yh = F.one_hot(y * mask, c).permute(0, 2, 1) * mask.unsqueeze(1)
        dims = (0, 2)
        inter = torch.sum(pred * yh, dim=dims)
        card = torch.sum(pred + yh, dim=dims)
        score = 2.0 * inter / card.clamp_min(eps)
        loss = 1.0 - score
        loss = loss * (yh.sum(dims) > 0).float()
        return loss.mean().item()

    ours = float(smp_dice_loss(jnp.asarray(logits), jnp.asarray(labels)))
    ref = torch_smp_dice(logits, labels)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)
    # and the factory routes 'dice' here
    fn = create_loss({"loss_function": "dice"}, mode="train")
    np.testing.assert_allclose(float(fn(jnp.asarray(logits), jnp.asarray(labels))), ref, rtol=1e-5)


def test_ignore_index_guard():
    """The one-hot ignore trick only works when ignore_index >= num_classes;
    a wider head must fail loudly instead of training on invalid pixels."""
    from kurosiwo_tpu.ops.losses import cross_entropy_loss

    logits4 = jnp.zeros((1, 4, 4, 4), jnp.float32)
    labels = jnp.zeros((1, 4, 4), jnp.int32)
    with pytest.raises(AssertionError, match="ignore_index"):
        cross_entropy_loss(logits4, labels, ignore_index=3)
