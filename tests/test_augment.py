"""Device-side augmentation pipeline tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kurosiwo_tpu.data.augment import (
    augment_batch,
    cutout,
    flips,
    gaussian_blur,
    random_resized_crop,
)


def _batch(b=4, h=64, w=64, c=2, seed=0):
    rs = np.random.RandomState(seed)
    return {
        "post": jnp.asarray(rs.rand(b, h, w, c), jnp.float32),
        "pre1": jnp.asarray(rs.rand(b, h, w, c), jnp.float32),
        "pre2": jnp.asarray(rs.rand(b, h, w, c), jnp.float32),
        "mask": jnp.asarray(rs.randint(0, 4, (b, h, w)), jnp.int32),
        "valid": jnp.ones((b, h, w), jnp.int32),
    }


def test_random_resized_crop_shapes_and_mask_values():
    b = _batch()
    key = jax.random.PRNGKey(0)
    imgs, masks = random_resized_crop(key, [b["post"]], [b["mask"]], 64, (0.2, 1.0))
    assert imgs[0].shape == (4, 64, 64, 2)
    assert masks[0].shape == (4, 64, 64)
    # nearest resampling of the mask introduces no new label values
    assert set(np.unique(masks[0])) <= set(np.unique(b["mask"]))


def test_full_crop_is_identity():
    b = _batch()
    imgs, masks = random_resized_crop(jax.random.PRNGKey(0), [b["post"]], [b["mask"]], 64, (1.0, 1.0))
    # scale (1.0, 1.0) with aspect jitter is *close* to identity but aspect
    # may still deviate; at minimum values stay in the original range
    assert float(jnp.max(imgs[0])) <= float(jnp.max(b["post"])) + 1e-4


def test_hflip_deterministic():
    b = _batch()
    imgs, masks = flips(jax.random.PRNGKey(0), [b["post"]], [b["mask"]], p_h=1.0, p_v=0.0)
    np.testing.assert_array_equal(np.asarray(imgs[0]), np.asarray(b["post"][:, :, ::-1]))
    np.testing.assert_array_equal(np.asarray(masks[0]), np.asarray(b["mask"][:, :, ::-1]))


def test_gaussian_blur_preserves_mean():
    b = _batch()
    out = gaussian_blur(jax.random.PRNGKey(0), [b["post"]], p=1.0)
    m0 = float(jnp.mean(b["post"]))
    m1 = float(jnp.mean(out[0]))
    assert abs(m0 - m1) < 1e-2
    # blur reduces variance
    assert float(jnp.var(out[0])) < float(jnp.var(b["post"]))


def test_cutout_zeroes_pixels():
    b = _batch()
    imgs, _ = cutout(jax.random.PRNGKey(0), [b["post"]], [b["mask"]], p=1.0, num_holes=4, size=8)
    assert int(jnp.sum(imgs[0] == 0)) >= 4 * 8 * 8 * 2 // 2  # holes may overlap


def test_augment_batch_under_jit():
    b = _batch()
    cfg = {
        "data_augmentations": True,
        "augmentations": {
            "RandomResizedCrop": {"value": 64, "scale": [0.2, 1.0], "p": 1.0},
            "HorizontalFlip": {"p": 0.5},
            "VerticalFlip": {"p": 0.0},
            "GaussianBlur": {"sigma_limit": [0.1, 2.0], "p": 0.5},
            "MultNoise": {"p": 0.5},
            "Cutout": {"p": 0.5},
        },
    }
    f = jax.jit(lambda k, bb: augment_batch(k, bb, cfg))
    out = f(jax.random.PRNGKey(1), b)
    assert out["post"].shape == b["post"].shape
    assert out["mask"].dtype == b["mask"].dtype
    # deterministic per key
    out2 = f(jax.random.PRNGKey(1), b)
    np.testing.assert_array_equal(np.asarray(out["post"]), np.asarray(out2["post"]))
    out3 = f(jax.random.PRNGKey(2), b)
    assert not np.array_equal(np.asarray(out["post"]), np.asarray(out3["post"]))


def test_discard_if_empty_keeps_original():
    b = _batch()
    b["valid"] = jnp.zeros_like(b["valid"])  # no valid pixels anywhere
    cfg = {
        "data_augmentations": True,
        "augmentations": {"RandomResizedCrop": {"value": 64, "scale": [0.2, 0.3], "p": 1.0}},
    }
    out = augment_batch(jax.random.PRNGKey(0), b, cfg)
    # every sample's valid mask is empty -> originals preserved
    np.testing.assert_array_equal(np.asarray(out["mask"]), np.asarray(b["mask"]))
