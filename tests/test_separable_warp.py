"""Separable MXU warp vs gather warp / cv2 oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from deep_insight_face_tpu.ops import align as A

cv2 = pytest.importorskip("cv2")


def test_scale_translate_matches_gather_warp(rng):
    img = rng.uniform(0, 255, (1, 60, 70, 3)).astype(np.float32)
    scales = np.array([[1.3, 0.8]], np.float32)
    offsets = np.array([[4.0, -2.0]], np.float32)
    fast = np.asarray(
        A.scale_translate_warp(jnp.array(img), jnp.array(scales),
                               jnp.array(offsets), (40, 50))
    )
    # equivalent affine: x' = sx·x + ox, y' = sy·y + oy (inverse map)
    m_inv = np.array([[0.8, 0.0, -2.0], [0.0, 1.3, 4.0]], np.float32)
    m_fwd = np.asarray(A.invert_affine(jnp.array(m_inv)))
    slow = np.asarray(A.warp_affine(jnp.array(img), jnp.array(m_fwd[None]), (40, 50)))
    np.testing.assert_allclose(fast, slow, atol=1e-2)


def test_crop_resize_matches_cv2(rng):
    img = rng.uniform(0, 255, (80, 90, 3)).astype(np.float32)
    box = np.array([10.0, 20.0, 74.0, 68.0])
    out = np.asarray(
        A.crop_resize_boxes(jnp.array(img[None]), jnp.array(box[None]), (32, 32))
    )[0]
    crop = img[20:68, 10:74]
    ref = cv2.resize(crop, (32, 32), interpolation=cv2.INTER_LINEAR)
    diff = np.abs(out - ref)
    assert np.median(diff) < 0.6
    assert np.mean(diff < 2.0) > 0.95


def test_crop_resize_border_zero(rng):
    img = np.full((20, 20, 1), 100.0, np.float32)
    # box hanging off the top-left → out-of-range samples are 0
    box = np.array([-10.0, -10.0, 10.0, 10.0])
    out = np.asarray(
        A.crop_resize_boxes(jnp.array(img[None]), jnp.array(box[None]), (20, 20))
    )[0, :, :, 0]
    assert out[0, 0] == 0.0
    assert out[-1, -1] == pytest.approx(100.0, abs=1e-3)


def test_batched_boxes_independent(rng):
    imgs = rng.uniform(0, 255, (3, 40, 40, 3)).astype(np.float32)
    boxes = np.array(
        [[0, 0, 40, 40], [10, 10, 30, 30], [5, 0, 25, 40]], np.float32
    )
    out = np.asarray(
        A.crop_resize_boxes(jnp.array(imgs), jnp.array(boxes), (16, 16))
    )
    for i in range(3):
        single = np.asarray(
            A.crop_resize_boxes(jnp.array(imgs[i : i + 1]),
                                jnp.array(boxes[i : i + 1]), (16, 16))
        )[0]
        np.testing.assert_allclose(out[i], single, atol=1e-4)
