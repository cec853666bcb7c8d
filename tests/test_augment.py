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


def test_elastic_identity_when_zero_magnitude():
    from kurosiwo_tpu.data.augment import elastic_transform

    b = _batch()
    imgs, masks = elastic_transform(
        jax.random.PRNGKey(0), [b["post"]], [b["mask"]], p=1.0,
        alpha=0.0, sigma=50.0, alpha_affine=0.0,
    )
    # zero displacement + identity affine -> exact passthrough
    np.testing.assert_allclose(np.asarray(imgs[0]), np.asarray(b["post"]), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(masks[0]), np.asarray(b["mask"]))


def test_elastic_affine_matches_cv2_oracle():
    """Pure-affine case (alpha=0): our composed warp must equal
    cv2.warpAffine with the SAME matrix, bilinear + reflect101 — the exact
    cv2 call albumentations' ElasticTransform makes."""
    import cv2

    from kurosiwo_tpu.data.augment import _affine_from_points

    rs = np.random.RandomState(3)
    h = w = 64
    img = rs.rand(h, w).astype(np.float32)
    cy, cx = h // 2, w // 2
    ss = min(h, w) // 3
    pts1 = np.float32([[cx + ss, cy + ss], [cx + ss, cy - ss], [cx - ss, cy - ss]])
    pts2 = (pts1 + rs.uniform(-8, 8, pts1.shape)).astype(np.float32)

    m_ours = np.asarray(_affine_from_points(jnp.asarray(pts1)[None], jnp.asarray(pts2)[None]))[0]
    m_cv = cv2.getAffineTransform(pts1, pts2)
    np.testing.assert_allclose(m_ours, m_cv, rtol=1e-4, atol=1e-4)

    want = cv2.warpAffine(
        img, m_cv, (w, h), flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_REFLECT_101
    )
    # our sampling of the same inverse map
    from jax.scipy.ndimage import map_coordinates

    minv = cv2.invertAffineTransform(m_cv)
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    sx = minv[0, 0] * xs + minv[0, 1] * ys + minv[0, 2]
    sy = minv[1, 0] * xs + minv[1, 1] * ys + minv[1, 2]
    got = np.asarray(map_coordinates(jnp.asarray(img), [jnp.asarray(sy), jnp.asarray(sx)], order=1, mode="mirror"))
    # interiors match to fp tolerance (cv2 fixed-point remap quantizes to 1/32)
    np.testing.assert_allclose(got, want, atol=2e-2)


def test_elastic_warp_matches_scipy_oracle():
    """Full elastic (displacement + affine): against scipy.ndimage
    map_coordinates with the identical composed source map."""
    import scipy.ndimage as ndi

    from kurosiwo_tpu.data import augment as A

    b, h, w, c = 2, 48, 48, 2
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(b, h, w, c), jnp.float32)
    msk = jnp.asarray(rs.randint(0, 4, (b, h, w)), jnp.int32)
    key = jax.random.PRNGKey(7)
    imgs, masks = A.elastic_transform(
        key, [img], [msk], p=1.0, alpha=30.0, sigma=4.0, alpha_affine=6.0,
        same_dxdy=False, approximate=True,
    )

    # reproduce the internal maps with the same key-split structure
    k_apply, k_aff, k_dx, k_dy = jax.random.split(key, 4)
    cy, cx = h // 2, w // 2
    ss = min(h, w) // 3
    pts1 = jnp.asarray([[cx + ss, cy + ss], [cx + ss, cy - ss], [cx - ss, cy - ss]], jnp.float32)[None].repeat(b, 0)
    pts2 = pts1 + jax.random.uniform(k_aff, (b, 3, 2), minval=-6.0, maxval=6.0)
    m_inv = np.asarray(A._invert_affine(A._affine_from_points(pts1, pts2)))
    sig = jnp.full((b,), 4.0, jnp.float32)
    dx = np.asarray(A._blur2d(jax.random.uniform(k_dx, (b, h, w), minval=-1.0, maxval=1.0), sig, 17)) * 30.0
    dy = np.asarray(A._blur2d(jax.random.uniform(k_dy, (b, h, w), minval=-1.0, maxval=1.0), sig, 17)) * 30.0

    xs, ys = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    for i in range(b):
        mx = xs + dx[i]
        my = ys + dy[i]
        sx = m_inv[i, 0, 0] * mx + m_inv[i, 0, 1] * my + m_inv[i, 0, 2]
        sy = m_inv[i, 1, 0] * mx + m_inv[i, 1, 1] * my + m_inv[i, 1, 2]
        for ch in range(c):
            want = ndi.map_coordinates(np.asarray(img[i, ..., ch]), [sy, sx], order=1, mode="mirror")
            np.testing.assert_allclose(np.asarray(imgs[0][i, ..., ch]), want, atol=1e-4)
        want_m = ndi.map_coordinates(np.asarray(msk[i]), [sy, sx], order=0, mode="mirror")
        np.testing.assert_array_equal(np.asarray(masks[0][i]), want_m)
    # masks keep label alphabet (nearest)
    assert set(np.unique(masks[0])) <= set(np.unique(msk))


def test_unsupported_augmentation_raises():
    b = _batch()
    cfg = {
        "data_augmentations": True,
        "augmentations": {"ColorJitter": {"brightness": 0.2, "p": 0.5}},
    }
    with pytest.raises(ValueError, match="ColorJitter"):
        augment_batch(jax.random.PRNGKey(0), b, cfg)
    # p=0 (the shipped default) passes through silently
    cfg["augmentations"]["ColorJitter"]["p"] = 0.0
    out = augment_batch(jax.random.PRNGKey(0), b, cfg)
    np.testing.assert_array_equal(np.asarray(out["post"]), np.asarray(b["post"]))


def test_gaussian_noise_reference_key():
    """The reference factory maps config key 'GaussianNoise' -> A.GaussNoise
    (utilities/augmentations.py:37-38); both spellings must work."""
    b = _batch()
    for keyname in ("GaussianNoise", "GaussNoise"):
        cfg = {"data_augmentations": True, "augmentations": {keyname: {"p": 1.0}}}
        out = augment_batch(jax.random.PRNGKey(0), b, cfg)
        assert not np.array_equal(np.asarray(out["post"]), np.asarray(b["post"])), keyname


def test_rrc_probability_gates_per_sample():
    """p<1 must leave some samples uncropped (full-image box == identity when
    out_size == H), like A.RandomResizedCrop(p=...)."""
    from kurosiwo_tpu.data.augment import random_resized_crop

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(16, 32, 32, 2), jnp.float32)
    mask = jnp.asarray(rng.randint(0, 3, (16, 32, 32)))
    (out,), (mout,) = random_resized_crop(
        jax.random.PRNGKey(0), [img], [mask], 32, (0.2, 0.4), p=0.5
    )
    unchanged = np.array([np.allclose(np.asarray(out[i]), np.asarray(img[i]), atol=1e-5)
                          for i in range(16)])
    assert 0 < unchanged.sum() < 16  # some skipped, some cropped


def test_mult_noise_is_scalar_per_image():
    """A.MultiplicativeNoise defaults: elementwise=False -> ONE gain per image."""
    from kurosiwo_tpu.data.augment import multiplicative_noise

    img = jnp.ones((4, 16, 16, 2), jnp.float32)
    (out,) = multiplicative_noise(jax.random.PRNGKey(1), [img], p=1.0)
    per_image = np.asarray(out).reshape(4, -1)
    for row in per_image:
        assert np.allclose(row, row[0]), "noise must be a single scalar gain per image"


def test_min_max_single_channel_ratio_clamp_bound():
    """Reference quirk: clamp caps vh/vv at 1.0 only in the MULTI-channel
    branch; single-channel ['vh/vv'] uses clamp_input (Dataset.py:263-264)."""
    from kurosiwo_tpu.data.normalize import _min_max_bounds

    stats = {130: {"flood_vh": (0.01, 0.5), "flood_vv": (0.02, 0.8)}}
    _, maxs_multi = _min_max_bounds(stats, 130, "flood", ["vv", "vh/vv"], clamp=0.15)
    assert maxs_multi[1] == 1.0
    _, maxs_single = _min_max_bounds(stats, 130, "flood", ["vh/vv"], clamp=0.15)
    assert maxs_single[0] == 0.15
