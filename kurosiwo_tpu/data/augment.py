"""Device-side batched augmentations.

Reference counterpart: `/root/reference/utilities/augmentations.py:4-42`
(albumentations Compose applied per-sample on CPU inside DataLoader workers)
driven by configs/augmentations/augmentation.json, and the paired
image+mask application in Dataset.create_views
(`/root/reference/dataset/Dataset.py:171-190, 793-809`).

TPU-native redesign: the whole batch is augmented INSIDE the jitted train
step with vectorized transforms and an explicit PRNG key —
  * RandomResizedCrop: per-sample crop box -> vmapped
    jax.image.scale_and_translate (separable interpolation = two matmuls,
    MXU-friendly; no per-pixel gathers), bilinear for images / nearest for
    masks; albumentations samples area-scale and log-uniform aspect;
  * Horizontal/Vertical flip: jnp.where on reversed views;
  * GaussianBlur: separable conv with per-sample sigma, static kernel width
    sized for sigma_limit's max;
  * GaussNoise / MultiplicativeNoise, Cutout (CoarseDropout): mask algebra;
  * the reference's discard-if-empty rule (augmented views with zero valid
    pixels are dropped, Dataset.py:797-803) becomes a jnp.where select per
    sample.

The same transform instance is applied to all three acquisitions and both
masks of a sample (paired views).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp


def _sample_crop_boxes(key, batch, h, w, scale, ratio=(3 / 4, 4 / 3)):
    """Per-sample (y0, x0, ch, cw) in pixels, albumentations-style sampling."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    area = h * w
    target_area = jax.random.uniform(k1, (batch,), minval=scale[0], maxval=scale[1]) * area
    log_ratio = jax.random.uniform(
        k2, (batch,), minval=math.log(ratio[0]), maxval=math.log(ratio[1])
    )
    aspect = jnp.exp(log_ratio)
    cw = jnp.sqrt(target_area * aspect)
    ch = jnp.sqrt(target_area / aspect)
    cw = jnp.clip(cw, 8.0, w)
    ch = jnp.clip(ch, 8.0, h)
    y0 = jax.random.uniform(k3, (batch,)) * (h - ch)
    x0 = jax.random.uniform(k4, (batch,)) * (w - cw)
    return y0, x0, ch, cw


def _crop_resize(img, y0, x0, ch, cw, out_h, out_w, method):
    """Resample the crop box to (out_h, out_w) via scale_and_translate.
    scale maps source->output: s = out/crop; translation t = -y0 * s."""
    sy = out_h / ch
    sx = out_w / cw
    scale = jnp.stack([sy, sx])
    translation = jnp.stack([-y0 * sy, -x0 * sx])
    return jax.image.scale_and_translate(
        img, (out_h, out_w, img.shape[-1]), (0, 1), scale, translation, method, antialias=False
    )


def _nearest_selection(src0, crop, in_dim, out_dim):
    """(out_dim, in_dim) one-hot row-selection matrix for nearest resampling
    of a crop [src0, src0+crop) to out_dim — expressed as comparisons against
    a broadcasted iota so the resample is a matmul, not a gather."""
    u = (jnp.arange(out_dim, dtype=jnp.float32) + 0.5) * (crop / out_dim) + src0
    idx = jnp.clip(jnp.floor(u), 0, in_dim - 1)
    cols = jax.lax.broadcasted_iota(jnp.float32, (out_dim, in_dim), 1)
    return (cols == idx[:, None]).astype(jnp.float32)


def _crop_resize_nearest(mask2d, y0, x0, ch, cw, out_h, out_w):
    """Nearest crop-resize of a 2D integer mask via two selection matmuls."""
    in_h, in_w = mask2d.shape
    sh = _nearest_selection(y0, ch, in_h, out_h)  # (out_h, in_h)
    sw = _nearest_selection(x0, cw, in_w, out_w)  # (out_w, in_w)
    m = mask2d.astype(jnp.float32)
    out = sh @ m @ sw.T  # exact one-hot selection
    return jnp.round(out).astype(mask2d.dtype)


def random_resized_crop(key, images: list, masks: list, out_size: int, scale, p: float = 1.0):
    """Paired crop of every image (bilinear) and mask (nearest) in a sample
    batch. images: list of (B, H, W, C); masks: list of (B, H, W).

    Per-sample probability gate like A.RandomResizedCrop(p=...): samples the
    coin per image; a skipped sample gets the FULL-image box (a plain resize
    to out_size — identity when out_size == H, matching albumentations'
    keep-original semantics at the shipped configs)."""
    b, h, w = images[0].shape[:3]
    y0, x0, ch, cw = _sample_crop_boxes(key, b, h, w, scale)
    if p < 1.0:
        apply = jax.random.bernoulli(jax.random.fold_in(key, 7), p, (b,))
        y0 = jnp.where(apply, y0, 0)
        x0 = jnp.where(apply, x0, 0)
        ch = jnp.where(apply, ch, h)
        cw = jnp.where(apply, cw, w)

    def one(img, y0, x0, ch, cw, method):
        return _crop_resize(img, y0, x0, ch, cw, out_size, out_size, method)

    out_images = [
        jax.vmap(lambda im, a, bb, c, d: one(im, a, bb, c, d, "linear"))(img, y0, x0, ch, cw)
        for img in images
    ]
    out_masks = [
        jax.vmap(lambda m, a, bb, c, d: _crop_resize_nearest(m, a, bb, c, d, out_size, out_size))(
            m, y0, x0, ch, cw
        )
        for m in masks
    ]
    return out_images, out_masks


def flips(key, images: list, masks: list, p_h: float, p_v: float):
    b = images[0].shape[0]
    kh, kv = jax.random.split(key)
    do_h = jax.random.bernoulli(kh, p_h, (b, 1, 1, 1))
    do_v = jax.random.bernoulli(kv, p_v, (b, 1, 1, 1))
    images = [jnp.where(do_h, img[:, :, ::-1], img) for img in images]
    images = [jnp.where(do_v, img[:, ::-1], img) for img in images]
    masks = [jnp.where(do_h[..., 0], m[:, :, ::-1], m) for m in masks]
    masks = [jnp.where(do_v[..., 0], m[:, ::-1], m) for m in masks]
    return images, masks


def gaussian_blur(key, images: list, p: float, sigma_limit=(0.1, 2.0)):
    b = images[0].shape[0]
    ks, kp = jax.random.split(key)
    sigma = jax.random.uniform(ks, (b,), minval=sigma_limit[0], maxval=sigma_limit[1])
    apply = jax.random.bernoulli(kp, p, (b,))
    radius = max(1, int(math.ceil(3 * sigma_limit[1])))
    # one shared separable-blur kernel (_blur2d): per-sample (B, K) weights
    # contracted over K shifted views per axis — pure VPU, static shapes
    out = []
    for img in images:
        blurred = _blur2d(img.astype(jnp.float32), sigma, 2 * radius + 1).astype(img.dtype)
        out.append(jnp.where(apply[:, None, None, None], blurred, img))
    return out


def gauss_noise(key, images: list, p: float, var_limit=(10.0, 50.0), scale: float = 1.0 / 255):
    b = images[0].shape[0]
    out = []
    for i, img in enumerate(images):
        k1, k2, k3 = jax.random.split(jax.random.fold_in(key, i), 3)
        apply = jax.random.bernoulli(k1, p, (b, 1, 1, 1))
        var = jax.random.uniform(k2, (b, 1, 1, 1), minval=var_limit[0], maxval=var_limit[1])
        noise = jax.random.normal(k3, img.shape) * jnp.sqrt(var) * scale
        out.append(jnp.where(apply, img + noise.astype(img.dtype), img))
    return out


def multiplicative_noise(key, images: list, p: float, limits=(0.9, 1.1)):
    b = images[0].shape[0]
    out = []
    for i, img in enumerate(images):
        k1, k2 = jax.random.split(jax.random.fold_in(key, i))
        apply = jax.random.bernoulli(k1, p, (b, 1, 1, 1))
        # ONE scalar gain per image: A.MultiplicativeNoise defaults are
        # elementwise=False, per_channel=False (per-pixel noise would be a
        # materially different augmentation than the reference's)
        mult = jax.random.uniform(k2, (b, 1, 1, 1), minval=limits[0], maxval=limits[1])
        out.append(jnp.where(apply, img * mult.astype(img.dtype), img))
    return out


def _affine_from_points(pts1, pts2):
    """Per-sample 2x3 affine M with M @ [x, y, 1] = (x', y') mapping pts1 ->
    pts2 (cv2.getAffineTransform semantics). pts*: (B, 3, 2) as (x, y)."""
    ones = jnp.ones(pts1.shape[:-1] + (1,), pts1.dtype)
    src = jnp.concatenate([pts1, ones], axis=-1)  # (B, 3, 3): rows [x, y, 1]
    # solve src @ M^T = pts2  ->  M^T = src^{-1} @ pts2
    mt = jnp.linalg.solve(src, pts2)  # (B, 3, 2)
    return jnp.swapaxes(mt, -1, -2)  # (B, 2, 3)


def _invert_affine(m):
    """Invert a (B, 2, 3) affine (cv2.invertAffineTransform)."""
    a, t = m[:, :, :2], m[:, :, 2:]
    ai = jnp.linalg.inv(a)
    return jnp.concatenate([ai, -ai @ t], axis=-1)


def _blur2d(field, sigma, ksize: int):
    """Separable Gaussian blur of (B, H, W) with per-sample sigma and a static
    (ksize, ksize) kernel — cv2.GaussianBlur semantics (reflect101 border)."""
    radius = ksize // 2
    offsets = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    kern = jnp.exp(-0.5 * (offsets[None, :] / sigma[:, None]) ** 2)
    kern = kern / jnp.sum(kern, axis=1, keepdims=True)  # (B, K)

    def blur_axis(x, axis):
        pads = [(0, 0)] * x.ndim
        pads[axis] = (radius, radius)
        padded = jnp.pad(x, pads, mode="reflect")
        stack = jnp.stack(
            [jax.lax.slice_in_dim(padded, i, i + x.shape[axis], axis=axis) for i in range(ksize)],
            axis=-1,
        )
        w = kern.reshape((x.shape[0],) + (1,) * (x.ndim - 1) + (ksize,))
        return jnp.sum(stack * w, axis=-1)

    return blur_axis(blur_axis(field, 1), 2)


def elastic_transform(
    key,
    images: list,
    masks: list,
    p: float,
    alpha: float = 1.0,
    sigma: float = 50.0,
    alpha_affine: float = 50.0,
    same_dxdy: bool = False,
    approximate: bool = True,
):
    """albumentations ElasticTransform semantics on-device
    (reference factory: /root/reference/utilities/augmentations.py:22-34):
    random 3-point affine (offsets U(-alpha_affine, alpha_affine) on a
    centered square) composed with a Gaussian-smoothed U(-1,1) displacement
    field scaled by alpha; border reflect101 (border_mode=4); bilinear for
    images, nearest for masks.

    TPU note: the two sequential cv2 warps (warpAffine then remap) are
    composed into ONE sampling map, so each pixel is resampled once. The
    arbitrary 2-D warp is a genuine gather (not expressible as separable
    matmuls); this is the one augmentation that pays the TPU gather cost —
    fine at p=0 (the shipped default) and acceptable when opted in.
    """
    b, h, w = images[0].shape[:3]
    k_apply, k_aff, k_dx, k_dy = jax.random.split(key, 4)
    apply = jax.random.bernoulli(k_apply, p, (b,))

    # affine: centered square (cv2 point order), offsets in pixels
    cy, cx = h // 2, w // 2
    ss = min(h, w) // 3
    pts1 = jnp.asarray(
        [[cx + ss, cy + ss], [cx + ss, cy - ss], [cx - ss, cy - ss]], jnp.float32
    )[None].repeat(b, axis=0)
    pts2 = pts1 + jax.random.uniform(
        k_aff, (b, 3, 2), minval=-alpha_affine, maxval=alpha_affine
    )
    m_inv = _invert_affine(_affine_from_points(pts1, pts2))  # dst -> src

    # smoothed displacement (approximate mode uses cv2's fixed 17x17 kernel;
    # exact mode sizes the kernel for the sigma)
    ksize = 17 if approximate else 2 * int(4 * float(sigma) + 0.5) + 1
    sig = jnp.full((b,), float(sigma), jnp.float32)
    dx = _blur2d(jax.random.uniform(k_dx, (b, h, w), minval=-1.0, maxval=1.0), sig, ksize) * alpha
    dy = dx if same_dxdy else (
        _blur2d(jax.random.uniform(k_dy, (b, h, w), minval=-1.0, maxval=1.0), sig, ksize) * alpha
    )

    # composed map: out(y, x) = src(M^{-1}(x + dx, y + dy))
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :] + dx
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None] + dy
    src_x = m_inv[:, 0, 0, None, None] * xs + m_inv[:, 0, 1, None, None] * ys + m_inv[:, 0, 2, None, None]
    src_y = m_inv[:, 1, 0, None, None] * xs + m_inv[:, 1, 1, None, None] * ys + m_inv[:, 1, 2, None, None]

    from jax.scipy.ndimage import map_coordinates

    def warp_image(img, sy, sx):  # (H, W, C) single sample
        def chan(c):
            return map_coordinates(c, [sy, sx], order=1, mode="mirror")
        return jnp.stack([chan(img[..., i]) for i in range(img.shape[-1])], axis=-1)

    def warp_mask(msk, sy, sx):
        return map_coordinates(msk, [sy, sx], order=0, mode="mirror")

    sel_img = apply[:, None, None, None]
    sel_mask = apply[:, None, None]
    images = [
        jnp.where(sel_img, jax.vmap(warp_image)(img.astype(jnp.float32), src_y, src_x).astype(img.dtype), img)
        for img in images
    ]
    masks = [jnp.where(sel_mask, jax.vmap(warp_mask)(m, src_y, src_x), m) for m in masks]
    return images, masks


def cutout(key, images: list, masks: list, p: float, num_holes: int = 8, size: int = 8):
    b, h, w = images[0].shape[:3]
    k1, k2, k3 = jax.random.split(key, 3)
    apply = jax.random.bernoulli(k1, p, (b,))
    ys = jax.random.randint(k2, (b, num_holes), 0, h - size)
    xs = jax.random.randint(k3, (b, num_holes), 0, w - size)
    row = jnp.arange(h)[None, :, None, None]
    col = jnp.arange(w)[None, None, :, None]
    inside = (
        (row >= ys[:, None, None, :]) & (row < ys[:, None, None, :] + size)
        & (col >= xs[:, None, None, :]) & (col < xs[:, None, None, :] + size)
    ).any(axis=-1)
    keep = ~(inside & apply[:, None, None])
    images = [img * keep[..., None].astype(img.dtype) for img in images]
    return images, masks


_SUPPORTED_AUGMENTATIONS = {
    "RandomResizedCrop",
    "HorizontalFlip",
    "VerticalFlip",
    "GaussianBlur",
    "ElasticTransform",
    "Cutout",
    "GaussianNoise",  # reference factory's key for A.GaussNoise
    "GaussNoise",
    "MultNoise",
}


def augment_batch(key, batch: dict, config: dict) -> dict:
    """Apply the configured augmentation pipeline to a batch dict (paired
    across post/pre1/pre2 + mask/valid), replicating get_augmentations'
    composition order. Samples whose augmented valid mask is empty keep
    their originals (Dataset.py:797-803).

    Unsupported keys configured with p>0 raise — the reference factory
    silently appends the PREVIOUS transform for unknown keys like ColorJitter
    (utilities/augmentations.py:4-42 has no else branch), which is a latent
    bug we refuse to replicate. ColorJitter in particular is undefined on
    2-channel SAR data (hue/saturation need 3 channels)."""
    aug = config.get("augmentations")
    if not aug:
        return batch
    for name, spec in aug.items():
        if name not in _SUPPORTED_AUGMENTATIONS and isinstance(spec, dict) and spec.get("p", 0) > 0:
            raise ValueError(
                f"augmentation {name!r} is configured with p={spec['p']} but is not "
                f"supported (supported: {sorted(_SUPPORTED_AUGMENTATIONS)})"
            )
    image_keys = [k for k in ("post", "pre1", "pre2", "dem") if k in batch]
    mask_keys = [k for k in ("mask", "valid") if k in batch]
    images = [batch[k] for k in image_keys]
    masks = [batch[k] for k in mask_keys]
    orig_images, orig_masks = images, masks

    keys = jax.random.split(key, 8)
    rrc = aug.get("RandomResizedCrop", {})
    if rrc.get("p", 0) > 0:
        out_size = int(rrc.get("value", images[0].shape[1]))
        images, masks = random_resized_crop(
            keys[0], images, masks, out_size,
            tuple(rrc.get("scale", (0.2, 1.0))), p=float(rrc["p"]),
        )
        if out_size != orig_images[0].shape[1]:
            # the discard-if-empty fallback below must live in the OUTPUT
            # geometry: a full-image resize of the originals (the same box
            # a p-skipped sample gets)
            orig_images, orig_masks = random_resized_crop(
                keys[7], orig_images, orig_masks, out_size, (1.0, 1.0), p=0.0,
            )
    gb = aug.get("GaussianBlur", {})
    if gb.get("p", 0) > 0:
        images = gaussian_blur(keys[1], images, gb["p"], tuple(gb.get("sigma_limit", (0.1, 2.0))))
    p_hflip = aug.get("HorizontalFlip", {}).get("p", 0.0)
    p_vflip = aug.get("VerticalFlip", {}).get("p", 0.0)
    if p_hflip > 0 or p_vflip > 0:  # bernoulli(0) is runtime — XLA can't fold it
        images, masks = flips(keys[2], images, masks, p_hflip, p_vflip)
    et = aug.get("ElasticTransform", {})
    if et.get("p", 0) > 0:
        images, masks = elastic_transform(
            keys[6], images, masks, et["p"],
            alpha=float(et.get("alpha", 1.0)), sigma=float(et.get("sigma", 50)),
            alpha_affine=float(et.get("alpha_affine", 50)),
            same_dxdy=bool(et.get("same_dxdy", False)),
            approximate=bool(et.get("approximate", True)),
        )
    gn = aug.get("GaussianNoise", aug.get("GaussNoise", {}))
    if gn.get("p", 0) > 0:
        images = gauss_noise(keys[3], images, gn["p"])
    mn = aug.get("MultNoise", {})
    if mn.get("p", 0) > 0:
        images = multiplicative_noise(keys[4], images, mn["p"])
    co = aug.get("Cutout", {})
    if co.get("p", 0) > 0:
        images, masks = cutout(keys[5], images, masks, co["p"])

    # discard-if-empty: keep original sample when no valid pixels survive
    if "valid" in batch:
        vi = mask_keys.index("valid")
        has_valid = jnp.sum(masks[vi], axis=(1, 2)) > 0
        sel_img = has_valid[:, None, None, None]
        sel_mask = has_valid[:, None, None]
        images = [jnp.where(sel_img, a, o) for a, o in zip(images, orig_images)]
        masks = [jnp.where(sel_mask, a, o) for a, o in zip(masks, orig_masks)]

    out = dict(batch)
    for k, v in zip(image_keys, images):
        out[k] = v
    for k, v in zip(mask_keys, masks):
        out[k] = v
    return out
