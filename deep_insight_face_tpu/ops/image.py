"""On-device image ops: letterbox, preprocessing modes, augmentation.

Replaces the reference's host-side PIL/cv2/imgaug pipeline
(reference: deep_insight_face/detector/yolov3.py:108-119 letterbox,
datagen/generator.py:178 preprocess_input, common/image_aug.py imgaug
stacks) with pure-jnp functions that jit and fuse on device, keyed by
explicit PRNG keys.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# resize / letterbox
# ---------------------------------------------------------------------------


def resize_bilinear(images: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize (NHWC or HWC) with half-pixel centers
    (cv2.resize INTER_LINEAR semantics, the reference's resizer)."""
    batched = images.ndim == 4
    if not batched:
        images = images[None]
    n, h, w, c = images.shape
    out = jax.image.resize(images, (n, size[0], size[1], c), method="bilinear")
    return out if batched else out[0]


def letterbox(
    images: jnp.ndarray, target: int, pad_value: float = 128.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Aspect-preserving resize + center pad to (target, target)
    (reference: detector/yolov3.py:108-119).

    Returns (padded images, scale-and-offset (3,) array [scale, pad_y, pad_x]
    for mapping detector boxes back to source coordinates).
    Shapes are static: scale is a Python float from static H/W.
    """
    batched = images.ndim == 4
    if not batched:
        images = images[None]
    n, h, w, c = images.shape
    if h == w == target:
        # identity fast path (shapes are static): the resample at scale 1
        # still cost ~4 ms/batch-128 @416² on TPU
        meta = jnp.array([1.0, 0.0, 0.0], jnp.float32)
        return (images if batched else images[0]), meta
    scale = min(target / h, target / w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    resized = jax.image.resize(images, (n, nh, nw, c), method="bilinear")
    pad_top = (target - nh) // 2
    pad_left = (target - nw) // 2
    out = jnp.full((n, target, target, c), pad_value, resized.dtype)
    out = jax.lax.dynamic_update_slice(out, resized, (0, pad_top, pad_left, 0))
    meta = jnp.array([scale, pad_top, pad_left], jnp.float32)
    return (out if batched else out[0]), meta


# ---------------------------------------------------------------------------
# preprocessing modes (keras.applications preprocess_input equivalents)
# ---------------------------------------------------------------------------

_IMAGENET_MEAN_RGB = (123.68, 116.779, 103.939)
_TORCH_MEAN = (0.485, 0.456, 0.406)
_TORCH_STD = (0.229, 0.224, 0.225)


def preprocess(images: jnp.ndarray, mode: str = "tf") -> jnp.ndarray:
    """uint8/float [0,255] RGB → network input.

    Modes mirror keras.applications preprocess_input, which the reference
    mixes freely (reference: datagen/generator.py:8 resnet_v2 'tf' mode vs
    predictions.py:10 vgg16 'caffe' mode):
    - "tf": x/127.5 − 1
    - "caffe": RGB→BGR, subtract ImageNet BGR means
    - "torch": x/255, normalize by ImageNet mean/std
    - "rescale": x/255 (reference: detector/run.py:107)
    """
    x = images.astype(jnp.float32)
    if mode == "tf":
        return x / 127.5 - 1.0
    if mode == "caffe":
        mean = jnp.array(_IMAGENET_MEAN_RGB[::-1], jnp.float32)
        return x[..., ::-1] - mean
    if mode == "torch":
        x = x / 255.0
        return (x - jnp.array(_TORCH_MEAN)) / jnp.array(_TORCH_STD)
    if mode == "rescale":
        return x / 255.0
    raise ValueError(f"unknown preprocess mode {mode!r}")


def fixed_standardization(images: jnp.ndarray) -> jnp.ndarray:
    """(x − 127.5) / 128 — facenet eval-style standardization
    (the reference eval CLI's fixed-standardization flag)."""
    return (images.astype(jnp.float32) - 127.5) / 128.0


def per_image_standardization(images: jnp.ndarray) -> jnp.ndarray:
    """tf.image.per_image_standardization semantics."""
    axes = tuple(range(images.ndim - 3, images.ndim))
    x = images.astype(jnp.float32)
    mean = jnp.mean(x, axis=axes, keepdims=True)
    std = jnp.std(x, axis=axes, keepdims=True)
    n = functools.reduce(lambda a, b: a * b, [images.shape[i] for i in axes])
    adj = jnp.maximum(std, 1.0 / jnp.sqrt(float(n)))
    return (x - mean) / adj


# ---------------------------------------------------------------------------
# on-device augmentation (jit-safe, PRNG-keyed)
# ---------------------------------------------------------------------------


def random_flip(key: jax.Array, images: jnp.ndarray, prob: float = 0.5) -> jnp.ndarray:
    """Per-image horizontal flip."""
    flip = jax.random.bernoulli(key, prob, (images.shape[0],))
    flipped = images[:, :, ::-1, :]
    return jnp.where(flip[:, None, None, None], flipped, images)


def random_brightness(
    key: jax.Array, images: jnp.ndarray, max_delta: float = 32.0
) -> jnp.ndarray:
    delta = jax.random.uniform(
        key, (images.shape[0], 1, 1, 1), minval=-max_delta, maxval=max_delta
    )
    return jnp.clip(images.astype(jnp.float32) + delta, 0.0, 255.0)


def random_contrast(
    key: jax.Array, images: jnp.ndarray, lower: float = 0.8, upper: float = 1.2
) -> jnp.ndarray:
    factor = jax.random.uniform(
        key, (images.shape[0], 1, 1, 1), minval=lower, maxval=upper
    )
    x = images.astype(jnp.float32)
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    return jnp.clip((x - mean) * factor + mean, 0.0, 255.0)


def random_saturation(
    key: jax.Array, images: jnp.ndarray, lower: float = 0.7, upper: float = 1.3
) -> jnp.ndarray:
    factor = jax.random.uniform(
        key, (images.shape[0], 1, 1, 1), minval=lower, maxval=upper
    )
    x = images.astype(jnp.float32)
    gray = jnp.mean(x, axis=-1, keepdims=True)
    return jnp.clip(gray + (x - gray) * factor, 0.0, 255.0)


def random_crop_resize(
    key: jax.Array,
    images: jnp.ndarray,
    min_scale: float = 0.8,
) -> jnp.ndarray:
    """Random scale crop (same output size via resize-back); static shapes.

    PER-IMAGE crop geometry (the reference's iterators crop each image
    independently), expressed through the MXU separable interpolation
    warp (ops/align.scale_translate_warp) — the previous traced-index
    gather formulation was both the slow path CLAUDE.md warns about and
    batch-uniform (one geometry for all n images per call).
    """
    from deep_insight_face_tpu.ops.align import scale_translate_warp

    n, h, w, c = images.shape
    k1, k2, k3 = jax.random.split(key, 3)
    scale = jax.random.uniform(k1, (n,), minval=min_scale, maxval=1.0)
    ch = scale * h  # crop window in source px (continuous: sampling grid)
    cw = scale * w
    oy = jax.random.uniform(k2, (n,)) * (h - ch)
    ox = jax.random.uniform(k3, (n,)) * (w - cw)
    # dst(y, x) = src(sy·y + oy, sx·x + ox): sy maps [0, h) onto the
    # [oy, oy+ch) window, i.e. crop-then-resize-back in one warp
    scales = jnp.stack([ch / h, cw / w], axis=-1)
    offsets = jnp.stack([oy, ox], axis=-1)
    return scale_translate_warp(
        images.astype(jnp.float32), scales, offsets, (h, w)
    )


def fit_dataset_stats(
    images: jnp.ndarray, zca: bool = False, zca_epsilon: float = 1e-6
):
    """Featurewise dataset statistics (mean, std, optional ZCA whitening
    matrix) — the device-side equivalent of the Keras-iterator ``fit``
    the reference forks (reference: common/iterator.py:517-578).

    Returns a dict consumed by :func:`apply_dataset_stats`.
    """
    x = images.astype(jnp.float32)
    mean = jnp.mean(x, axis=0, keepdims=True)
    std = jnp.std(x, axis=0, keepdims=True)
    stats = {"mean": mean, "std": std, "zca": None}
    if zca:
        flat = (x - mean).reshape(x.shape[0], -1)
        sigma = flat.T @ flat / x.shape[0]
        # SVD on the host: jnp.linalg.svd compiles for >60 s on this
        # project's TPU toolchain even for tiny operands (CLAUDE.md) and
        # stats fitting is a one-off host-side step, not a jit hot path
        u, s, _ = np.linalg.svd(np.asarray(sigma), full_matrices=False)
        stats["zca"] = jnp.asarray(
            (u * (1.0 / np.sqrt(s + zca_epsilon))) @ u.T
        )
    return stats


def apply_dataset_stats(images: jnp.ndarray, stats) -> jnp.ndarray:
    """Featurewise standardization (+ ZCA when fitted)."""
    x = (images.astype(jnp.float32) - stats["mean"]) / jnp.maximum(
        stats["std"], 1e-6
    )
    if stats.get("zca") is not None:
        n = x.shape[0]
        x = (x.reshape(n, -1) @ stats["zca"]).reshape(images.shape)
    return x


def random_affine_matrices(
    key: jax.Array,
    n: int,
    h: int,
    w: int,
    max_rotation_deg: float = 15.0,
    max_shift: float = 0.08,
    max_shear_deg: float = 8.0,
    zoom_range: Tuple[float, float] = (0.9, 1.1),
) -> jnp.ndarray:
    """Per-image random rotation/shift/shear/zoom as FORWARD (src→dst,
    (x, y) column-first) 2×3 matrices, shape (n, 2, 3) — the matrix half
    of :func:`random_affine`, exposed so landmark co-transforms can apply
    the SAME geometry to (K, 2) point arrays (reference co-transform
    semantics: common/image_aug.py:694-707 `_augment_keypoints` runs one
    deterministic transform over image and keypoints together)."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    theta = jnp.deg2rad(
        jax.random.uniform(k1, (n,), minval=-max_rotation_deg, maxval=max_rotation_deg)
    )
    shear = jnp.deg2rad(
        jax.random.uniform(k2, (n,), minval=-max_shear_deg, maxval=max_shear_deg)
    )
    zoom = jax.random.uniform(k3, (n,), minval=zoom_range[0], maxval=zoom_range[1])
    tx = jax.random.uniform(k4, (n,), minval=-max_shift, maxval=max_shift) * w
    ty = jax.random.uniform(k5, (n,), minval=-max_shift, maxval=max_shift) * h

    cos, sin = jnp.cos(theta), jnp.sin(theta)
    # rotation+zoom about the image center, then shear, then shift
    a = zoom * cos
    b = -zoom * jnp.sin(theta + shear)
    c = zoom * sin
    d = zoom * jnp.cos(theta + shear)
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    t_x = cx - a * cx - b * cy + tx
    t_y = cy - c * cx - d * cy + ty
    return jnp.stack(
        [jnp.stack([a, b, t_x], -1), jnp.stack([c, d, t_y], -1)], axis=1
    )  # (n, 2, 3)


def random_affine(
    key: jax.Array,
    images: jnp.ndarray,
    max_rotation_deg: float = 15.0,
    max_shift: float = 0.08,
    max_shear_deg: float = 8.0,
    zoom_range: Tuple[float, float] = (0.9, 1.1),
) -> jnp.ndarray:
    """Per-image random rotation/shift/shear/zoom, composed into ONE warp.

    The reference composes the same four homographies on the host with
    scipy ndimage per image (reference: common/iterator.py:410-484,
    common/image_aug.py:77-97); here the composed 2×3 matrices are built
    batched on device and applied by the batched bilinear warp.
    """
    from deep_insight_face_tpu.ops.align import warp_affine_mxu

    n, h, w, _ = images.shape
    mats = random_affine_matrices(
        key, n, h, w, max_rotation_deg, max_shift, max_shear_deg, zoom_range
    )
    # MXU two-pass warp: the gather-based warp costs ~53 ms/batch-128 on
    # TPU; augmentation rotations (≤15°+shear) are well inside its range
    return warp_affine_mxu(images, mats, (h, w))


def _separable_blur(x: jnp.ndarray, wts: jnp.ndarray) -> jnp.ndarray:
    """Apply a per-image separable 1-D kernel along H then W.

    Per-image kernels rule out one shared conv, so the blur is computed
    as ``taps`` shifted adds per axis with per-image tap weights
    (``wts`` (n, taps), already normalized) — static shapes, batched,
    and cheap (2·taps fused FMAs per pixel) instead of a vmapped conv
    per image. Edge-replicate padding."""
    n, h, w, _ = x.shape
    taps = wts.shape[1]
    r = taps // 2
    xp = jnp.pad(x, ((0, 0), (r, r), (0, 0), (0, 0)), mode="edge")
    x = sum(
        wts[:, i, None, None, None] * jax.lax.dynamic_slice_in_dim(xp, i, h, 1)
        for i in range(taps)
    )
    xp = jnp.pad(x, ((0, 0), (0, 0), (r, r), (0, 0)), mode="edge")
    x = sum(
        wts[:, i, None, None, None] * jax.lax.dynamic_slice_in_dim(xp, i, w, 2)
        for i in range(taps)
    )
    return x


def random_gaussian_blur(
    key: jax.Array,
    images: jnp.ndarray,
    max_sigma: float = 2.0,
    taps: int = 9,
    prob: float = 0.5,
) -> jnp.ndarray:
    """Per-image separable gaussian blur with a random sigma
    (reference: common/image_aug.py:386 iaa.GaussianBlur((0, 3.0)));
    see :func:`_separable_blur` for the shifted-adds scheme."""
    n = images.shape[0]
    k1, k2 = jax.random.split(key)
    sigma = jax.random.uniform(k1, (n,), minval=1e-3, maxval=max_sigma)
    on = jax.random.bernoulli(k2, prob, (n,))
    r = taps // 2
    offs = jnp.arange(-r, r + 1, dtype=jnp.float32)
    wts = jnp.exp(-0.5 * (offs[None, :] / sigma[:, None]) ** 2)  # (n, taps)
    # identity kernel where the blur is off → one jnp.where at the weights
    ident = (offs == 0).astype(jnp.float32)[None, :]
    wts = jnp.where(on[:, None], wts, ident)
    wts = wts / jnp.sum(wts, axis=1, keepdims=True)
    return _separable_blur(images.astype(jnp.float32), wts)


def random_average_blur(
    key: jax.Array,
    images: jnp.ndarray,
    max_radius: int = 3,
) -> jnp.ndarray:
    """Per-image box blur with a random integer radius 1..``max_radius``
    (reference: common/image_aug.py:389 iaa.AverageBlur(k=(2, 7)) —
    kernel size 2r+1). Box weights are built by masking a fixed tap
    window, so the kernel size is data-dependent but every shape is
    static."""
    n = images.shape[0]
    radius = jax.random.randint(key, (n, 1), 1, max_radius + 1)
    offs = jnp.arange(-max_radius, max_radius + 1, dtype=jnp.float32)
    wts = (jnp.abs(offs)[None, :] <= radius).astype(jnp.float32)
    wts = wts / jnp.sum(wts, axis=1, keepdims=True)
    return _separable_blur(images.astype(jnp.float32), wts)


def median_blur3(images: jnp.ndarray) -> jnp.ndarray:
    """3×3 median filter (reference: common/image_aug.py:392
    iaa.MedianBlur(k=(3, 11)) — fixed at k=3: the 9-element median is a
    static sort on the VPU; the reference's larger data-dependent
    kernels would need dynamic windows, and at face-crop resolution the
    visual effect class — impulse-noise removal with edge retention —
    is already delivered at k=3)."""
    x = images.astype(jnp.float32)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    n, h, w, c = x.shape
    shifts = [
        jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (n, h, w, c))
        for dy in range(3) for dx in range(3)
    ]
    return jnp.median(jnp.stack(shifts, axis=0), axis=0)


def random_additive_noise(
    key: jax.Array,
    images: jnp.ndarray,
    max_scale: float = 0.05 * 255.0,
    per_channel_prob: float = 0.5,
) -> jnp.ndarray:
    """Additive gaussian noise, optionally per-channel (reference:
    common/image_aug.py:415 iaa.AdditiveGaussianNoise(scale=(0, 0.05*255),
    per_channel=0.5))."""
    n, h, w, c = images.shape
    k1, k2, k3 = jax.random.split(key, 3)
    scale = jax.random.uniform(k1, (n, 1, 1, 1), maxval=max_scale)
    noise = jax.random.normal(k2, (n, h, w, c))
    per_ch = jax.random.bernoulli(k3, per_channel_prob, (n, 1, 1, 1))
    # shared-channel branch replicates ONE full-strength N(0,1) map —
    # averaging the c iid per-channel draws would shrink its std to
    # 1/sqrt(c) (≈42% weaker noise than configured at c=3)
    shared = noise[..., :1]
    noise = jnp.where(per_ch, noise, shared)
    return jnp.clip(images.astype(jnp.float32) + scale * noise, 0.0, 255.0)


def random_multiply(
    key: jax.Array,
    images: jnp.ndarray,
    lower: float = 0.5,
    upper: float = 1.5,
    per_channel_prob: float = 0.5,
) -> jnp.ndarray:
    """Per-image (sometimes per-channel) brightness multiply (reference:
    common/image_aug.py:439 iaa.Multiply((0.5, 1.5), per_channel=0.5))."""
    n, _, _, c = images.shape
    k1, k2 = jax.random.split(key)
    factor = jax.random.uniform(k1, (n, 1, 1, c), minval=lower, maxval=upper)
    per_ch = jax.random.bernoulli(k2, per_channel_prob, (n, 1, 1, 1))
    factor = jnp.where(per_ch, factor, factor[..., :1])
    return jnp.clip(images.astype(jnp.float32) * factor, 0.0, 255.0)


def random_dropout(
    key: jax.Array,
    images: jnp.ndarray,
    max_rate: float = 0.1,
) -> jnp.ndarray:
    """Per-pixel dropout to 0 at a random per-image rate (reference:
    common/image_aug.py:424 iaa.Dropout((0.01, 0.1)))."""
    n, h, w, _ = images.shape
    k1, k2 = jax.random.split(key)
    rate = jax.random.uniform(k1, (n, 1, 1, 1), minval=0.01, maxval=max_rate)
    keep = jax.random.uniform(k2, (n, h, w, 1)) >= rate
    return images.astype(jnp.float32) * keep


def random_coarse_dropout(
    key: jax.Array,
    images: jnp.ndarray,
    max_rate: float = 0.05,
    cell: int = 16,
) -> jnp.ndarray:
    """Coarse (blocky) dropout: a low-res bernoulli mask nearest-upsampled
    to image size (reference: common/image_aug.py:425 iaa.CoarseDropout
    ((0.03, 0.15), size_percent=(0.02, 0.05)))."""
    n, h, w, _ = images.shape
    gh, gw = max(h // cell, 1), max(w // cell, 1)
    k1, k2 = jax.random.split(key)
    rate = jax.random.uniform(k1, (n, 1, 1), minval=0.0, maxval=max_rate)
    keep = (jax.random.uniform(k2, (n, gh, gw)) >= rate).astype(jnp.float32)
    keep = jnp.repeat(jnp.repeat(keep, -(-h // gh), 1)[:, :h],
                      -(-w // gw), 2)[:, :, :w]
    return images.astype(jnp.float32) * keep[..., None]


def random_erase(
    key: jax.Array,
    images: jnp.ndarray,
    min_extent: float = 0.08,
    max_extent: float = 0.20,
    center_range: Tuple[float, float] = (0.2, 0.8),
) -> jnp.ndarray:
    """Random-erasing occlusion: paint ONE opaque flat-color rectangle per
    image (sunglasses/hand/pole-style), matching the hard-protocol
    occluder geometry (`data/synthetic._render_identity_scene`: flat
    rectangle with half-extents 0.15-0.35 of the face radius, centered
    within ±0.5 radius of the face — at crop level the face fills the
    frame, so defaults are half-extents ``min_extent``-``max_extent`` of
    the image side, centered in the middle ``center_range`` band).

    Unlike :func:`random_coarse_dropout` (scattered blocky zeros), this
    is a single contiguous occluder with a non-zero fill — the failure
    mode the hard e2e protocol measures. Mask built from per-image
    comparisons against a static iota, so it jits with static shapes.
    """
    n, h, w, c = images.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    cx = jax.random.uniform(k1, (n, 1, 1), minval=center_range[0] * w,
                            maxval=center_range[1] * w)
    cy = jax.random.uniform(k2, (n, 1, 1), minval=center_range[0] * h,
                            maxval=center_range[1] * h)
    ext = jax.random.uniform(k3, (n, 2, 1, 1), minval=min_extent,
                             maxval=max_extent)
    rx, ry = ext[:, 0] * w, ext[:, 1] * h
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    mask = (jnp.abs(xx - cx) < rx) & (jnp.abs(yy - cy) < ry)
    color = jax.random.uniform(k4, (n, 1, 1, c), maxval=255.0)
    x = images.astype(jnp.float32)
    return jnp.where(mask[..., None], color, x)


def random_grayscale(
    key: jax.Array, images: jnp.ndarray, max_alpha: float = 1.0
) -> jnp.ndarray:
    """Random blend toward luma grayscale (reference:
    common/image_aug.py:447 iaa.Grayscale(alpha=(0.0, 1.0)))."""
    n = images.shape[0]
    alpha = jax.random.uniform(key, (n, 1, 1, 1), maxval=max_alpha)
    x = images.astype(jnp.float32)
    luma = (
        0.299 * x[..., 0:1] + 0.587 * x[..., 1:2] + 0.114 * x[..., 2:3]
    )
    return x + alpha * (luma - x)


def percentile_contrast_stretch(
    images: jnp.ndarray, lower: float = 2.0, upper: float = 98.0
) -> jnp.ndarray:
    """Per-image percentile contrast stretch: map the [p_lower, p_upper]
    intensity range to [0, 255] (reference: common/image_aug.py:33-36
    skimage rescale_intensity on (2, 98) percentiles; also the
    iterator's contrast_stretching hook, common/iterator.py:471-474).

    ``lower``/``upper`` may be scalars (shared bounds) or (N,) arrays
    (independent percentile bounds per batch element, as the randomized
    augmentation stack draws them).
    """
    x = images.astype(jnp.float32)
    flat = x.reshape(x.shape[0], -1)
    lower = jnp.asarray(lower, jnp.float32)
    upper = jnp.asarray(upper, jnp.float32)
    if lower.ndim == 0 and upper.ndim == 0:
        lo = jnp.percentile(flat, lower, axis=1)
        hi = jnp.percentile(flat, upper, axis=1)
    else:
        lower = jnp.broadcast_to(lower, (flat.shape[0],))
        upper = jnp.broadcast_to(upper, (flat.shape[0],))
        lo = jax.vmap(jnp.percentile)(flat, lower)
        hi = jax.vmap(jnp.percentile)(flat, upper)
    lo = lo[:, None, None, None]
    hi = hi[:, None, None, None]
    return jnp.clip((x - lo) / jnp.maximum(hi - lo, 1e-6) * 255.0, 0.0, 255.0)


def histogram_equalization(images: jnp.ndarray) -> jnp.ndarray:
    """Per-image, per-channel histogram equalization: each pixel maps to
    its intensity CDF value (reference: common/iterator.py:475-477
    skimage exposure.equalize_hist hook).

    CDF(v) = (#pixels ≤ v)/N computed by sort + searchsorted — exact
    tie handling (equal intensities map to one value; flat regions stay
    flat) with no 256-bin one-hot blowup, so it stays cheap under jit.
    """
    x = images.astype(jnp.float32)
    n, h, w, c = x.shape
    flat = jnp.transpose(x, (0, 3, 1, 2)).reshape(n * c, h * w)

    def eq_one(v):
        s = jnp.sort(v)
        cdf = jnp.searchsorted(s, v, side="right").astype(jnp.float32)
        return cdf / v.shape[0] * 255.0

    out = jax.vmap(eq_one)(flat).reshape(n, c, h, w)
    return jnp.transpose(out, (0, 2, 3, 1))


def random_contrast_stretch(
    key: jax.Array, images: jnp.ndarray, max_lower: float = 6.0
) -> jnp.ndarray:
    """Contrast stretch with random percentile bounds (PRNG-keyed wrapper
    for the augmentation stacks). One independent draw per image, like
    every other op in the stack (reference applies its contrast hook
    per-image too: common/iterator.py:471-474)."""
    p = jax.random.uniform(key, (images.shape[0],), minval=0.0,
                           maxval=max_lower)
    return percentile_contrast_stretch(images, p, 100.0 - p)


def random_rotate_crop_matrices(
    key: jax.Array,
    n: int,
    h: int,
    w: int,
    max_rotation_deg: float = 20.0,
) -> jnp.ndarray:
    """FORWARD (src→dst) 2×3 matrices for :func:`random_rotate_crop` —
    exposed for landmark co-transforms (see random_affine_matrices)."""
    theta = jnp.deg2rad(
        jax.random.uniform(
            key, (n,), minval=-max_rotation_deg, maxval=max_rotation_deg
        )
    )
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    ac, as_ = jnp.abs(cos), jnp.abs(sin)
    # extents between outermost pixel CENTERS (w−1, h−1): bilinear samples
    # past the last center blend with the 0 border; a further 1-px
    # relative margin absorbs the two-pass warp's sub-percent skew
    we, he = w - 1.0, h - 1.0
    s = jnp.minimum(we / (we * ac + he * as_), he / (we * as_ + he * ac))
    s = s * (1.0 - 1.0 / min(h, w))
    # FORWARD (src→dst, warp_affine convention) map: rotate by θ about
    # the center and magnify by 1/s ≥ 1, so the s-scaled central crop of
    # the rotated content exactly fills the output frame
    a = cos / s
    b = -sin / s
    c = sin / s
    d = cos / s
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    t_x = cx - a * cx - b * cy
    t_y = cy - c * cx - d * cy
    return jnp.stack(
        [jnp.stack([a, b, t_x], -1), jnp.stack([c, d, t_y], -1)], axis=1
    )


def random_rotate_crop(
    key: jax.Array,
    images: jnp.ndarray,
    max_rotation_deg: float = 20.0,
) -> jnp.ndarray:
    """Rotate and crop the largest same-aspect rectangle with no
    out-of-frame corners, resized back to the input size — as ONE
    composed affine warp (reference: common/image_aug.py:138-310
    rotate_and_crop_largest_rect, a ~170-line host-side geometry
    routine; here the crop is folded into the warp matrix).

    For rotation θ of a w×h frame, the largest inscribed axis-aligned
    rectangle with the same aspect ratio has scale
    s = min(w/(w|cosθ|+h|sinθ|), h/(w|sinθ|+h|cosθ|)); the output grid
    maps through R(θ)·(1/s) about the center, so no black corners ever
    materialize and shapes stay static.
    """
    from deep_insight_face_tpu.ops.align import warp_affine_mxu

    n, h, w, _ = images.shape
    mats = random_rotate_crop_matrices(key, n, h, w, max_rotation_deg)
    return warp_affine_mxu(images, mats, (h, w))


# ---------------------------------------------------------------------------
# local deformation / convolution tail of the reference's "all" stack
# (reference menu: common/image_aug.py:560-626 — Superpixels, Sharpen,
# Emboss, EdgeDetect, Invert, ElasticTransformation, PiecewiseAffine,
# PerspectiveTransform). TPU-first design: ONE gather-free bounded-
# displacement warp kernel serves both elastic and piecewise-affine
# (they differ only in how the displacement field is generated);
# perspective rides the projective generalization of the two-pass MXU
# warp; the 3×3 convolution family is 9 shifted adds with per-image
# kernels (same pattern as the separable blur — no vmapped convs).
# ---------------------------------------------------------------------------


def _smooth_field(f: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable gaussian smoothing of (n, h, w) noise fields with a
    STATIC sigma (weights fold into constants at trace time)."""
    if sigma < 0.3:
        return f
    r = max(int(np.ceil(2.5 * sigma)), 1)
    offs = np.arange(-r, r + 1, dtype=np.float32)
    wts = np.exp(-0.5 * (offs / sigma) ** 2)
    wts /= wts.sum()
    n, h, w = f.shape
    fp = jnp.pad(f, ((0, 0), (r, r), (0, 0)), mode="edge")
    f = sum(float(wts[i]) * jax.lax.dynamic_slice_in_dim(fp, i, h, 1)
            for i in range(2 * r + 1))
    fp = jnp.pad(f, ((0, 0), (0, 0), (r, r)), mode="edge")
    return sum(float(wts[i]) * jax.lax.dynamic_slice_in_dim(fp, i, w, 2)
               for i in range(2 * r + 1))


def displacement_warp(
    images: jnp.ndarray,
    dx: jnp.ndarray,
    dy: jnp.ndarray,
    max_disp: int,
) -> jnp.ndarray:
    """Gather-free bilinear warp by a per-pixel displacement field:
    ``out(y, x) ≈ src(y + dy[y, x], x + dx[y, x])``, edge-replicate
    border.

    TPU-first formulation: XLA TPU gathers price a map_coordinates-style
    warp at tens of ms/batch; with the displacement BOUND static
    (``|d| ≤ max_disp``, fields are clipped), each 1-D pass is a sum of
    ``2·max_disp + 2`` statically-shifted slices weighted by hat
    functions of the fractional displacement — pure VPU FMAs, fused by
    XLA, no gather unit. Vertical pass then horizontal pass (the same
    two-pass row approximation as warp_affine_mxu; exact when the field
    is smooth at the displacement scale).

    ``dx``, ``dy``: (n, h, w) float pixels.
    """
    n, h, w, _ = images.shape
    r = int(max_disp)
    x = images.astype(jnp.float32)

    def _pass(x, disp, axis):
        d = jnp.clip(disp, -r, r)[..., None]  # (n, h, w, 1)
        size = x.shape[axis]
        pad = [(0, 0)] * 4
        pad[axis] = (r + 1, r + 1)
        xp = jnp.pad(x, pad, mode="edge")
        out = 0.0
        for off in range(-r, r + 2):
            wt = jnp.maximum(0.0, 1.0 - jnp.abs(off - d))
            out = out + wt * jax.lax.dynamic_slice_in_dim(
                xp, off + r + 1, size, axis)
        return out

    x = _pass(x, dy, 1)
    return _pass(x, dx, 2)


def random_elastic(
    key: jax.Array,
    images: jnp.ndarray,
    alpha: Tuple[float, float] = (0.5, 3.5),
    sigma: float = 0.25,
    max_disp: int = 4,
) -> jnp.ndarray:
    """Elastic transformation — move pixels locally by a smoothed random
    displacement field (reference: common/image_aug.py:619-620
    iaa.ElasticTransformation(alpha=(0.5, 3.5), sigma=0.25); algorithm
    after Simard et al. 2003: uniform noise in [-1, 1] → gaussian
    smoothing (σ in pixels) → scale by a per-image α in pixels, so
    ``|d| ≤ α ≤ max_disp``)."""
    n, h, w, _ = images.shape
    k1, k2 = jax.random.split(key)
    amp = jax.random.uniform(k1, (n, 1, 1), minval=alpha[0], maxval=alpha[1])
    noise = jax.random.uniform(k2, (2, n, h, w), minval=-1.0, maxval=1.0)
    dx = _smooth_field(noise[0], sigma) * amp
    dy = _smooth_field(noise[1], sigma) * amp
    return displacement_warp(images, dx, dy, max_disp)


def random_piecewise_affine(
    key: jax.Array,
    images: jnp.ndarray,
    scale: Tuple[float, float] = (0.01, 0.05),
    grid: int = 4,
    max_disp: int = 8,
) -> jnp.ndarray:
    """Piecewise-affine jitter — move a coarse grid of control points by
    gaussian offsets and deform the image accordingly (reference:
    common/image_aug.py:622-623 iaa.PiecewiseAffine(scale=(0.01, 0.05))).

    Realized as the SAME bounded-displacement warp as
    :func:`random_elastic`: normal control-point offsets of std
    ``scale·side`` on a (grid+1)² lattice, bilinearly upsampled to a
    dense field — which is exactly the piecewise-bilinear interpolation
    of control-point motion (imgaug's triangulated variant differs only
    in the interpolation simplices)."""
    n, h, w, _ = images.shape
    k1, k2 = jax.random.split(key)
    sc = jax.random.uniform(k1, (1, n, 1, 1),
                            minval=scale[0], maxval=scale[1])
    pts = jax.random.normal(k2, (2, n, grid + 1, grid + 1))
    side = jnp.array([w, h], jnp.float32)[:, None, None, None]
    fields = pts * sc * side  # (2, n, g+1, g+1)
    dense = jax.image.resize(fields, (2, n, h, w), method="linear")
    return displacement_warp(images, dense[0], dense[1], max_disp)


def perspective_matrices_from_corners(
    src: jnp.ndarray, dst: jnp.ndarray
) -> jnp.ndarray:
    """Batched homographies mapping 4 src corners onto 4 dst corners.

    ``src``, ``dst``: (n, 4, 2). Classic DLT: stack the 8 linear
    constraints and solve the (8, 8) system per image (batched LU —
    small and TPU-friendly, unlike SVD which compiles for minutes)."""
    x, y = src[..., 0], src[..., 1]
    xd, yd = dst[..., 0], dst[..., 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    rows_x = jnp.stack([x, y, o, z, z, z, -x * xd, -y * xd], axis=-1)
    rows_y = jnp.stack([z, z, z, x, y, o, -x * yd, -y * yd], axis=-1)
    A = jnp.concatenate([rows_x, rows_y], axis=-2)  # (n, 8, 8)
    rhs = jnp.concatenate([xd, yd], axis=-1)[..., None]  # (n, 8, 1)
    hvec = jnp.linalg.solve(A, rhs)[..., 0]  # (n, 8)
    ones = jnp.ones_like(hvec[..., :1])
    return jnp.concatenate([hvec, ones], axis=-1).reshape(-1, 3, 3)


def random_perspective_matrices(
    key: jax.Array,
    n: int,
    h: int,
    w: int,
    scale: Tuple[float, float] = (0.01, 0.1),
) -> jnp.ndarray:
    """(n, 3, 3) forward homographies jittering the 4 image corners by
    per-image gaussian offsets of std ``scale·side`` (reference:
    common/image_aug.py:625 iaa.PerspectiveTransform(scale=(0.01, 0.1)),
    keep_size semantics — output stays (h, w))."""
    k1, k2 = jax.random.split(key)
    corners = jnp.array(
        [[0.0, 0.0], [w - 1.0, 0.0], [w - 1.0, h - 1.0], [0.0, h - 1.0]],
        jnp.float32,
    )
    src = jnp.broadcast_to(corners, (n, 4, 2))
    sc = jax.random.uniform(k1, (n, 1, 1), minval=scale[0], maxval=scale[1])
    side = jnp.array([w, h], jnp.float32)
    jitter = jax.random.normal(k2, (n, 4, 2)) * sc * side
    return perspective_matrices_from_corners(src, src + jitter)


def transform_keypoints_projective(
    matrices: jnp.ndarray, points: jnp.ndarray
) -> jnp.ndarray:
    """Apply forward (src→dst) 3×3 homographies to (n, K, 2) (x, y)
    point arrays — the projective analogue of
    :func:`transform_keypoints` (exact, unlike pixels' two-pass
    approximation)."""
    ones = jnp.ones_like(points[..., :1])
    p = jnp.concatenate([points, ones], axis=-1)  # (n, K, 3)
    q = jnp.einsum("nij,nkj->nki", matrices, p)
    return q[..., :2] / q[..., 2:3]


def lift_affine_to_homography(mats: jnp.ndarray) -> jnp.ndarray:
    """(n, 2, 3) affine → (n, 3, 3) homography (bottom row [0, 0, 1])."""
    n = mats.shape[0]
    bottom = jnp.broadcast_to(
        jnp.array([[[0.0, 0.0, 1.0]]], jnp.float32), (n, 1, 3))
    return jnp.concatenate([mats, bottom], axis=1)


def random_perspective(
    key: jax.Array,
    images: jnp.ndarray,
    scale: Tuple[float, float] = (0.01, 0.1),
) -> jnp.ndarray:
    """Random perspective warp of a batch (see
    :func:`random_perspective_matrices`)."""
    from deep_insight_face_tpu.ops.align import warp_projective_mxu

    n, h, w, _ = images.shape
    mats = random_perspective_matrices(key, n, h, w, scale)
    return warp_projective_mxu(images.astype(jnp.float32), mats, (h, w))


def _conv3x3(images: jnp.ndarray, kernels: jnp.ndarray) -> jnp.ndarray:
    """Per-image 3×3 convolution as 9 statically-shifted adds with
    per-image scalar weights (edge-replicate border) — the same
    shifted-slice pattern as the separable blur; avoids a vmapped conv
    per image, and XLA fuses the 9 FMAs into one elementwise pass.

    ``kernels``: (n, 3, 3), applied depthwise to every channel."""
    n, h, w, _ = images.shape
    x = images.astype(jnp.float32)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    out = 0.0
    for i in range(3):
        for j in range(3):
            out = out + kernels[:, i, j, None, None, None] * \
                jax.lax.dynamic_slice(xp, (0, i, j, 0), (n, h, w, x.shape[3]))
    return out


def random_sharpen(
    key: jax.Array,
    images: jnp.ndarray,
    alpha: Tuple[float, float] = (0.0, 1.0),
    lightness: Tuple[float, float] = (0.75, 1.5),
) -> jnp.ndarray:
    """Sharpen and blend with the original (reference:
    common/image_aug.py:577 iaa.Sharpen(alpha=(0, 1.0),
    lightness=(0.75, 1.5)) — kernel (1−α)·I + α·[[−1,−1,−1],
    [−1, 8+l, −1], [−1,−1,−1]], blended in kernel space so one 3×3
    pass does both)."""
    n = images.shape[0]
    k1, k2 = jax.random.split(key)
    a = jax.random.uniform(k1, (n, 1, 1), minval=alpha[0], maxval=alpha[1])
    li = jax.random.uniform(k2, (n, 1, 1),
                            minval=lightness[0], maxval=lightness[1])
    ident = jnp.zeros((n, 3, 3)).at[:, 1, 1].set(1.0)
    effect = jnp.full((n, 3, 3), -1.0).at[:, 1, 1].set(8.0 + li[:, 0, 0])
    kern = (1.0 - a) * ident + a * effect
    return jnp.clip(_conv3x3(images, kern), 0.0, 255.0)


def random_emboss(
    key: jax.Array,
    images: jnp.ndarray,
    alpha: Tuple[float, float] = (0.0, 1.0),
    strength: Tuple[float, float] = (0.0, 2.0),
) -> jnp.ndarray:
    """Emboss and blend (reference: common/image_aug.py:578
    iaa.Emboss(alpha=(0, 1.0), strength=(0, 2.0)) — pressed-relief
    kernel [[−1−s, −s, 0], [−s, 1, s], [0, s, 1+s]])."""
    n = images.shape[0]
    k1, k2 = jax.random.split(key)
    a = jax.random.uniform(k1, (n, 1, 1), minval=alpha[0], maxval=alpha[1])
    s = jax.random.uniform(k2, (n,), minval=strength[0], maxval=strength[1])
    z = jnp.zeros_like(s)
    o = jnp.ones_like(s)
    effect = jnp.stack([
        jnp.stack([-1.0 - s, -s, z], -1),
        jnp.stack([-s, o, s], -1),
        jnp.stack([z, s, 1.0 + s], -1),
    ], axis=1)  # (n, 3, 3)
    ident = jnp.zeros((n, 3, 3)).at[:, 1, 1].set(1.0)
    kern = (1.0 - a) * ident + a * effect
    return jnp.clip(_conv3x3(images, kern), 0.0, 255.0)


def random_edge_detect(
    key: jax.Array,
    images: jnp.ndarray,
    alpha: Tuple[float, float] = (0.5, 1.0),
) -> jnp.ndarray:
    """Laplacian edge image blended with the original (reference:
    common/image_aug.py:583 iaa.EdgeDetect(alpha=(0.5, 1.0)) inside a
    noise-masked OneOf; here the blend weight is the per-image α)."""
    n = images.shape[0]
    a = jax.random.uniform(key, (n, 1, 1), minval=alpha[0], maxval=alpha[1])
    lap = jnp.array([[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]])
    ident = jnp.zeros((n, 3, 3)).at[:, 1, 1].set(1.0)
    kern = (1.0 - a) * ident + a * jnp.broadcast_to(lap, (n, 3, 3))
    return jnp.clip(_conv3x3(images, kern), 0.0, 255.0)


def random_invert(
    key: jax.Array,
    images: jnp.ndarray,
    prob: float = 0.05,
) -> jnp.ndarray:
    """Invert color channels with a PER-CHANNEL coin (reference:
    common/image_aug.py:592 iaa.Invert(0.05, per_channel=True))."""
    n, _, _, c = images.shape
    on = jax.random.bernoulli(key, prob, (n, 1, 1, c))
    x = images.astype(jnp.float32)
    return jnp.where(on, 255.0 - x, x)


def random_superpixels(
    key: jax.Array,
    images: jnp.ndarray,
    cell: int = 14,
    p_replace: Tuple[float, float] = (0.0, 1.0),
) -> jnp.ndarray:
    """Superpixel-style cell pooling: replace random cells of a regular
    grid by their mean color (reference: common/image_aug.py:562
    iaa.Superpixels(p_replace=(0, 1.0), n_segments=(20, 200)) — imgaug
    runs SLIC; a regular ``cell``² grid keeps the effect (local color
    posterization) with static shapes and zero clustering cost, the
    same trade the coarse-dropout op makes)."""
    n, h, w, c = images.shape
    gh, gw = -(-h // cell), -(-w // cell)
    k1, k2 = jax.random.split(key)
    x = images.astype(jnp.float32)
    xp = jnp.pad(x, ((0, 0), (0, gh * cell - h), (0, gw * cell - w), (0, 0)),
                 mode="edge")
    means = xp.reshape(n, gh, cell, gw, cell, c).mean(axis=(2, 4))
    up = jnp.repeat(jnp.repeat(means, cell, 1), cell, 2)[:, :h, :w]
    rate = jax.random.uniform(k1, (n, 1, 1, 1),
                              minval=p_replace[0], maxval=p_replace[1])
    coin = jax.random.uniform(k2, (n, gh, gw, 1)) < rate
    coin = jnp.repeat(jnp.repeat(coin, cell, 1), cell, 2)[:, :h, :w]
    return jnp.where(coin, up, x)


def random_directed_edge_detect(
    key: jax.Array,
    images: jnp.ndarray,
    alpha: Tuple[float, float] = (0.5, 1.0),
) -> jnp.ndarray:
    """Edge image from a random direction, blended with the original
    (reference: common/image_aug.py:584-585
    iaa.DirectedEdgeDetect(alpha=(0.5, 1.0), direction=(0.0, 1.0))).

    The per-image 3×3 kernel is the directional derivative
    k[dy,dx] = dx·cosθ + dy·sinθ (zero-sum, so flat regions go black and
    edges perpendicular to θ light up); its magnitude response replaces
    imgaug's ray-casting formulation with one batched conv."""
    n = images.shape[0]
    k1, k2 = jax.random.split(key)
    a = jax.random.uniform(k1, (n, 1, 1, 1), minval=alpha[0], maxval=alpha[1])
    theta = jax.random.uniform(k2, (n, 1, 1), maxval=2.0 * jnp.pi)
    dy, dx = jnp.mgrid[-1:2, -1:2].astype(jnp.float32)
    kern = dx[None] * jnp.cos(theta) + dy[None] * jnp.sin(theta)  # (n,3,3)
    edges = jnp.abs(_conv3x3(images, kern / 2.0))
    x = images.astype(jnp.float32)
    return jnp.clip((1.0 - a) * x + a * edges, 0.0, 255.0)


def smooth_noise_mask(
    key: jax.Array,
    n: int,
    h: int,
    w: int,
    sigma: Tuple[float, float] = (2.0, 10.0),
    taps: int = 11,
) -> jnp.ndarray:
    """Per-image blobby spatial mask in [0, 1]: white PRNG noise pushed
    through the per-image separable blur, then min-max normalized. The
    random blur sigma plays the role of imgaug's noise ``exponent``
    (larger sigma == lower spatial frequency == blobbier mask) — the
    TPU-first stand-in for simplex/frequency noise, reusing the
    shifted-adds blur instead of a host noise generator."""
    k1, k2 = jax.random.split(key)
    noise = jax.random.uniform(k1, (n, h, w, 1))
    sig = jax.random.uniform(k2, (n,), minval=sigma[0], maxval=sigma[1])
    r = taps // 2
    offs = jnp.arange(-r, r + 1, dtype=jnp.float32)
    wts = jnp.exp(-0.5 * (offs[None, :] / sig[:, None]) ** 2)
    wts = wts / jnp.sum(wts, axis=1, keepdims=True)
    m = _separable_blur(noise, wts)
    lo = m.min(axis=(1, 2, 3), keepdims=True)
    hi = m.max(axis=(1, 2, 3), keepdims=True)
    return (m - lo) / jnp.maximum(hi - lo, 1e-6)


def random_edge_noise_alpha(
    key: jax.Array,
    images: jnp.ndarray,
) -> jnp.ndarray:
    """Blend an edge-detect branch into the image through a blobby
    spatial mask (reference: common/image_aug.py:583-586
    iaa.SimplexNoiseAlpha(OneOf([EdgeDetect, DirectedEdgeDetect])) —
    edges appear only inside the mask's blobs, not frame-wide). The
    OneOf is a per-image coin between the plain and directed edge
    branches; both compute (static shapes) and the coin selects."""
    n, h, w, _ = images.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    mask = smooth_noise_mask(k1, n, h, w)
    plain = random_edge_detect(k2, images, alpha=(0.5, 1.0))
    directed = random_directed_edge_detect(k3, images, alpha=(0.5, 1.0))
    coin = jax.random.bernoulli(k4, 0.5, (n, 1, 1, 1))
    effect = jnp.where(coin, plain, directed)
    x = images.astype(jnp.float32)
    return mask * effect + (1.0 - mask) * x


def random_intensity_noise_alpha(
    key: jax.Array,
    images: jnp.ndarray,
) -> jnp.ndarray:
    """Blend a per-channel multiply branch against a contrast-normalize
    branch through a blobby spatial mask (reference:
    common/image_aug.py:600-607 iaa.FrequencyNoiseAlpha(exponent=(-4,0),
    first=Multiply((0.5,1.5), per_channel), second=
    ContrastNormalization((0.5,2.0))) — brightness of SUBAREAS changes,
    the masked alternative to the whole-image Multiply)."""
    n, h, w, c = images.shape
    k1, k2, k3 = jax.random.split(key, 3)
    mask = smooth_noise_mask(k1, n, h, w)
    x = images.astype(jnp.float32)
    factors = jax.random.uniform(k2, (n, 1, 1, c), minval=0.5, maxval=1.5)
    first = jnp.clip(x * factors, 0.0, 255.0)
    cf = jax.random.uniform(k3, (n, 1, 1, 1), minval=0.5, maxval=2.0)
    second = jnp.clip((x - 127.5) * cf + 127.5, 0.0, 255.0)
    return mask * first + (1.0 - mask) * second


AUGMENTATION_OPTIONS = (
    "default", "geometric", "non_geometric", "both", "all", "occlusion",
    "none",
)


def _sometimes(key: jax.Array, prob: float, fn, x: jnp.ndarray) -> jnp.ndarray:
    """Apply ``fn`` to each image with probability ``prob`` (the device
    equivalent of the reference's iaa.Sometimes wrappers, which gate
    every op at 0.1-0.5 — an always-on composition is a far stronger
    distribution shift than the reference ever applies and measurably
    degrades ArcFace convergence on color-coded identities).

    Cost note: under jit's static shapes ``fn`` necessarily computes on
    the FULL batch and the coin only masks the result, so an op's cost
    is proportional to 1.0, not ``prob``. That is why the heavy tail
    ops (exact-CDF histogram equalization's per-image sort, the dense
    rotate-crop warp) live only in the opt-in ``all`` stack — the
    default training stacks keep the always-paid set cheap."""
    k1, k2 = jax.random.split(key)
    on = jax.random.bernoulli(k1, prob, (x.shape[0],))
    return jnp.where(on[:, None, None, None], fn(k2, x), x)


def augment_batch(
    key: jax.Array,
    images: jnp.ndarray,
    option: str = "non_geometric",
) -> jnp.ndarray:
    """Named augmentation stacks mirroring the reference's imgaug pipelines
    (reference: common/image_aug.py:21-30 AUGMENTATION_OPTIONS), composed
    from jit-safe device ops with per-image application probabilities
    (reference: Sometimes gates, common/image_aug.py:497-513).
    ``images`` are float [0, 255] NHWC."""
    if option not in AUGMENTATION_OPTIONS:
        raise ValueError(f"augmentation {option!r} not in {AUGMENTATION_OPTIONS}")
    if option == "none":
        return images
    k = jax.random.split(key, 28)
    x = images.astype(jnp.float32)
    if option in ("geometric", "both", "all", "default", "occlusion"):
        x = random_flip(k[0], x)  # internally per-image p=0.5
        x = _sometimes(k[1], 0.5, random_crop_resize, x)
    if option == "all":
        x = _sometimes(k[5], 0.5, random_affine, x)
        x = _sometimes(k[12], 0.25,
                       lambda kk, im: random_rotate_crop(kk, im, 20.0), x)
        # local-deformation tail (reference: common/image_aug.py:619-625,
        # each inside SomeOf(0..5 of 14) ≈ effective per-op rate ~0.18)
        x = _sometimes(k[16], 0.2, random_perspective, x)
        x = _sometimes(k[17], 0.2, random_elastic, x)
        x = _sometimes(k[18], 0.15, random_piecewise_affine, x)
    return _photometric_stack(k, x, option)


def _photometric_stack(k, x: jnp.ndarray, option: str) -> jnp.ndarray:
    """The non-geometric tail of :func:`augment_batch` (keys pre-split by
    the caller, same index assignment), shared with
    :func:`augment_with_landmarks` — photometric ops never move pixels,
    so landmarks pass through them unchanged."""
    if option in ("non_geometric", "both", "all", "default", "occlusion"):
        x = _sometimes(k[2], 0.5, random_brightness, x)
        x = _sometimes(k[3], 0.5, random_contrast, x)
        x = _sometimes(k[4], 0.5, random_saturation, x)
    if option == "occlusion":
        # "default" plus one opaque occluder on half the batch — trains
        # the embedder against the hard e2e protocol's occlusion
        # distribution (scripts/e2e_quality.py --hard, occlude=0.5)
        x = _sometimes(k[15], 0.5, random_erase, x)
    if option in ("non_geometric", "both", "all"):
        x = _sometimes(k[6], 0.3,
                       lambda kk, im: random_multiply(kk, im, 0.8, 1.25), x)
        x = _sometimes(
            k[7], 0.2,
            lambda kk, im: random_additive_noise(kk, im, 0.03 * 255.0), x)
    if option == "all":
        # the heavy tail of the reference's "all" imgaug stack
        # (common/image_aug.py:368-456): blur OneOf (gaussian/box/median,
        # image_aug.py:564-573), dropout, grayscale blend
        x = random_gaussian_blur(k[8], x, max_sigma=2.0, prob=0.3)
        x = _sometimes(k[24], 0.15, random_average_blur, x)
        x = _sometimes(k[25], 0.1, lambda kk, im: median_blur3(im), x)
        x = _sometimes(k[9], 0.3,
                       lambda kk, im: random_dropout(kk, im, 0.05), x)
        x = _sometimes(k[10], 0.3,
                       lambda kk, im: random_coarse_dropout(kk, im, 0.05), x)
        x = _sometimes(k[11], 0.34,
                       lambda kk, im: random_grayscale(kk, im, 0.7), x)
        # intensity-remap tail (reference: image_aug.py:33-36 percentile
        # stretch; iterator.py:471-480 equalization hooks)
        x = _sometimes(k[13], 0.2, random_contrast_stretch, x)
        x = _sometimes(k[14], 0.15,
                       lambda kk, im: histogram_equalization(im), x)
        # convolution/posterization tail (reference: image_aug.py:562-592
        # Superpixels/Sharpen/Emboss/EdgeDetect/Invert under SomeOf(0..5))
        x = _sometimes(k[19], 0.15, random_sharpen, x)
        x = _sometimes(k[20], 0.1, random_emboss, x)
        # blobby-mask blends (SimplexNoiseAlpha/FrequencyNoiseAlpha,
        # image_aug.py:583-586, 600-607): effects appear in spatial
        # patches, not frame-wide
        x = _sometimes(k[21], 0.1, random_edge_noise_alpha, x)
        x = _sometimes(k[26], 0.15, random_intensity_noise_alpha, x)
        x = random_invert(k[22], x)  # per-channel p=0.05 internally
        x = _sometimes(k[23], 0.1, random_superpixels, x)
    return x


# ---------------------------------------------------------------------------
# keypoint co-transforming augmentation (reference: common/image_aug.py:718-756
# augment_keypoints/augment_seg — imgaug's to_deterministic() applies ONE
# sampled transform to image and keypoints together). Here the whole geometric
# sub-stack composes into a single per-image affine, applied once to pixels
# (one MXU warp) and once to the (K, 2) point array — correspondence is exact
# by construction, not by replaying a stochastic pipeline twice.
# ---------------------------------------------------------------------------


def identity_matrices(n: int) -> jnp.ndarray:
    """(n, 2, 3) identity affines."""
    eye = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)
    return jnp.broadcast_to(eye, (n, 2, 3))


def compose_affine(outer: jnp.ndarray, inner: jnp.ndarray) -> jnp.ndarray:
    """Compose batched forward 2×3 affines: result(p) = outer(inner(p)).

    Both (n, 2, 3); returns (n, 2, 3). Used to fold an augmentation
    sequence (flip → crop → affine …) into one warp matrix per image.
    """
    a = outer[:, :, :2] @ inner[:, :, :2]          # (n, 2, 2)
    t = (outer[:, :, :2] @ inner[:, :, 2:]) + outer[:, :, 2:]
    return jnp.concatenate([a, t], axis=-1)


def transform_keypoints(matrices: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply forward (src→dst) 2×3 affines to (x, y) point arrays.

    ``matrices``: (n, 2, 3); ``points``: (n, K, 2) in pixel coordinates,
    column-first (x, y) — the landmark convention (models/landmark.py).
    Returns (n, K, 2). Matrices act on (x, y) exactly as the warp's
    sampling grid does, so a point riding a warped image lands where the
    underlying pixel content went.
    """
    return jnp.einsum("nij,nkj->nki", matrices[:, :, :2], points) + \
        matrices[:, None, :, 2]


def _gated(key: jax.Array, prob: float, mats: jnp.ndarray) -> jnp.ndarray:
    """Per-image coin: the sampled matrix with probability ``prob``,
    identity otherwise (matrix analogue of :func:`_sometimes`)."""
    on = jax.random.bernoulli(key, prob, (mats.shape[0],))
    return jnp.where(on[:, None, None], mats, identity_matrices(mats.shape[0]))


def _flip_matrices(key: jax.Array, n: int, w: int, prob: float = 0.5) -> jnp.ndarray:
    """Horizontal flip as a forward affine: x' = (w−1) − x."""
    flip = jnp.array([[-1.0, 0.0, w - 1.0], [0.0, 1.0, 0.0]], jnp.float32)
    mats = jnp.broadcast_to(flip, (n, 2, 3))
    return _gated(key, prob, mats)


def _crop_resize_matrices(
    key: jax.Array, n: int, h: int, w: int, min_scale: float = 0.8
) -> jnp.ndarray:
    """Forward affines of :func:`random_crop_resize`'s pull map
    src = (s·dst + o): x' = (x − ox)/sx, y' = (y − oy)/sy."""
    k1, k2, k3 = jax.random.split(key, 3)
    scale = jax.random.uniform(k1, (n,), minval=min_scale, maxval=1.0)
    ch, cw = scale * h, scale * w
    oy = jax.random.uniform(k2, (n,)) * (h - ch)
    ox = jax.random.uniform(k3, (n,)) * (w - cw)
    sx, sy = cw / w, ch / h
    z = jnp.zeros_like(sx)
    return jnp.stack([
        jnp.stack([1.0 / sx, z, -ox / sx], -1),
        jnp.stack([z, 1.0 / sy, -oy / sy], -1),
    ], axis=1)


def random_geometric_matrices(
    key: jax.Array, n: int, h: int, w: int, option: str = "default"
) -> jnp.ndarray:
    """Sample the geometric sub-stack of :func:`augment_batch` for
    ``option`` as ONE composed forward 2×3 affine per image (same ops,
    same per-image gate probabilities). (n, 2, 3); identity for
    photometric-only options."""
    if option not in AUGMENTATION_OPTIONS:
        raise ValueError(f"augmentation {option!r} not in {AUGMENTATION_OPTIONS}")
    k = jax.random.split(key, 4)
    mats = identity_matrices(n)
    if option in ("geometric", "both", "all", "default", "occlusion"):
        mats = compose_affine(_flip_matrices(k[0], n, w, 0.5), mats)
        mats = compose_affine(
            _gated(k[1], 0.5, _crop_resize_matrices(k[1], n, h, w)), mats)
    if option == "all":
        mats = compose_affine(
            _gated(k[2], 0.5, random_affine_matrices(k[2], n, h, w)), mats)
        mats = compose_affine(
            _gated(k[3], 0.25, random_rotate_crop_matrices(k[3], n, h, w, 20.0)),
            mats)
    return mats


def _gated_homography(key: jax.Array, prob: float, mats: jnp.ndarray
                      ) -> jnp.ndarray:
    """Per-image coin over (n, 3, 3) homographies (identity when off)."""
    on = jax.random.bernoulli(key, prob, (mats.shape[0],))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), mats.shape)
    return jnp.where(on[:, None, None], mats, eye)


def _sample_field_at(field: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of (n, h, w) fields at (n, K, 2) (x, y) points.
    A K-element gather per image — tiny (K=68), unlike a dense warp."""
    n, h, w = field.shape
    x = jnp.clip(pts[..., 0], 0.0, w - 1.0)
    y = jnp.clip(pts[..., 1], 0.0, h - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx, fy = x - x0, y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    flat = field.reshape(n, h * w)

    def g(yy, xx):
        return jnp.take_along_axis(flat, yy * w + xx, axis=1)

    return (g(y0, x0) * (1 - fx) * (1 - fy) + g(y0, x1) * fx * (1 - fy)
            + g(y1, x0) * (1 - fx) * fy + g(y1, x1) * fx * fy)


def _sample_deform_tail(
    key: jax.Array, n: int, h: int, w: int,
    perspective_prob: float = 0.2,
    elastic_prob: float = 0.2,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sample the ``all`` stack's co-transformable deformations: a gated
    perspective homography and gated elastic displacement fields
    (zero displacement = exact identity warp). Returns
    ``(mats3, dx, dy)``."""
    kp, ke1, ke2, kg = jax.random.split(key, 4)
    mats3 = _gated_homography(
        kp, perspective_prob, random_perspective_matrices(kp, n, h, w))
    amp = jax.random.uniform(ke1, (n, 1, 1), minval=0.5, maxval=3.5)
    amp = amp * jax.random.bernoulli(kg, elastic_prob, (n, 1, 1))
    noise = jax.random.uniform(ke2, (2, n, h, w), minval=-1.0, maxval=1.0)
    dx = _smooth_field(noise[0], 0.25) * amp
    dy = _smooth_field(noise[1], 0.25) * amp
    return mats3, dx, dy


def augment_with_landmarks(
    key: jax.Array,
    images: jnp.ndarray,
    landmarks: jnp.ndarray,
    option: str = "default",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Co-transforming augmentation: images through the full ``option``
    stack, (n, K, 2) pixel-space landmarks through the SAME per-image
    geometry (reference: common/image_aug.py:718-756 augment_keypoints —
    imgaug deterministic co-transform; there the keypoints ride a
    replayed stochastic pipeline, here both ride one composed affine, so
    correspondence is exact and the geometric cost is one MXU warp).

    Positional semantics like the reference: a horizontal flip moves
    landmark COORDINATES but does not swap left/right semantic indices
    (e.g. landmark 36 stays "left eye outer corner" of the original
    face, which is now on the right side of the image) — callers
    training semantic-indexed heads should remap indices after flips or
    drop flip from the stack.

    Returns ``(augmented_images, augmented_landmarks)``; images float
    [0, 255] NHWC, landmarks float (x, y) pixels.
    """
    from deep_insight_face_tpu.ops.align import (
        warp_affine_mxu, warp_projective_mxu,
    )

    n, h, w, _ = images.shape
    if option == "none":
        return images, landmarks
    k_geo, k_deform, k_photo = jax.random.split(key, 3)
    mats = random_geometric_matrices(k_geo, n, h, w, option)
    if option == "all":
        # perspective composes into ONE projective warp with the affine
        # stack (points transform exactly); elastic rides the bounded
        # displacement warp, points shifted by the first-order inverse
        # −d(p) (error O(|d|·|∇d|) — sub-pixel at α ≤ 3.5, the same
        # approximation imgaug makes for elastic keypoints)
        m3, dx, dy = _sample_deform_tail(k_deform, n, h, w)
        m3 = m3 @ lift_affine_to_homography(mats)
        x = warp_projective_mxu(images.astype(jnp.float32), m3, (h, w))
        pts = transform_keypoints_projective(
            m3, landmarks.astype(jnp.float32))
        x = displacement_warp(x, dx, dy, 4)
        disp = jnp.stack(
            [_sample_field_at(dx, pts), _sample_field_at(dy, pts)], -1)
        pts = pts - disp
    else:
        x = warp_affine_mxu(images.astype(jnp.float32), mats, (h, w))
        pts = transform_keypoints(mats, landmarks.astype(jnp.float32))
    x = _photometric_stack(jax.random.split(k_photo, 24), x, option)
    return x, pts


def transform_segmaps(
    matrices: jnp.ndarray, segmaps: jnp.ndarray, num_classes: int
) -> jnp.ndarray:
    """Warp (n, h, w) integer label maps by forward 2×3 affines with label
    integrity: one-hot per class → the same MXU warp the pixels ride →
    argmax. Interpolating raw labels would blend class IDs into
    meaningless intermediates; argmax over warped indicator channels is
    imgaug's order-0/one-hot segmap semantics, expressed as dense einsums
    instead of a gather (reference: common/image_aug.py:718-733
    augment_seg — SegmentationMapsOnImage rides the deterministic
    pipeline). Out-of-border pixels land on class 0 (all indicator
    channels warp to 0 there) — callers should reserve 0 for background.
    """
    from deep_insight_face_tpu.ops.align import warp_affine_mxu

    onehot = jax.nn.one_hot(segmaps, num_classes, dtype=jnp.float32)
    warped = warp_affine_mxu(onehot, matrices, segmaps.shape[1:3])
    return jnp.argmax(warped, axis=-1).astype(segmaps.dtype)


def augment_with_segmaps(
    key: jax.Array,
    images: jnp.ndarray,
    segmaps: jnp.ndarray,
    num_classes: int,
    option: str = "default",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Co-transforming augmentation for segmentation maps: images through
    the full ``option`` stack, (n, h, w) integer label maps through the
    SAME per-image geometry (reference: common/image_aug.py:718-733
    augment_seg). Photometric ops touch only the pixels — labels are
    invariant to them by construction.

    ``option="occlusion"`` is intentionally AMODAL here: random-erase
    patches overwrite pixels but NOT labels, so the model is supervised
    to predict the part layout behind the occluder (amodal part
    segmentation). For modal supervision (labels must show the
    occluder), erase images and segmaps together outside this helper.

    Returns ``(augmented_images, augmented_segmaps)``; images float
    [0, 255] NHWC, segmaps same integer dtype in, class 0 filling
    revealed borders.
    """
    from deep_insight_face_tpu.ops.align import (
        warp_affine_mxu, warp_projective_mxu,
    )

    n, h, w, _ = images.shape
    if option == "none":
        return images, segmaps
    k_geo, k_deform, k_photo = jax.random.split(key, 3)
    mats = random_geometric_matrices(k_geo, n, h, w, option)
    if option == "all":
        # the label map rides the SAME projective + elastic warps as the
        # pixels (one-hot → warp → argmax, as in transform_segmaps)
        m3, dx, dy = _sample_deform_tail(k_deform, n, h, w)
        m3 = m3 @ lift_affine_to_homography(mats)
        x = warp_projective_mxu(images.astype(jnp.float32), m3, (h, w))
        x = displacement_warp(x, dx, dy, 4)
        onehot = jax.nn.one_hot(segmaps, num_classes, dtype=jnp.float32)
        warped = warp_projective_mxu(onehot, m3, (h, w))
        warped = displacement_warp(warped, dx, dy, 4)
        seg = jnp.argmax(warped, axis=-1).astype(segmaps.dtype)
    else:
        x = warp_affine_mxu(images.astype(jnp.float32), mats, (h, w))
        seg = transform_segmaps(mats, segmaps, num_classes)
    x = _photometric_stack(jax.random.split(k_photo, 24), x, option)
    return x, seg
