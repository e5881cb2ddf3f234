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


def test_mxu_warp_matches_gather_on_scale_translate(rng):
    # axis-aligned case: the two-pass decomposition is exact
    img = rng.uniform(0, 255, (3, 64, 64, 3)).astype(np.float32)
    m = np.tile(np.array([[[0.8, 0.0, 4.0], [0.0, 1.1, -2.0]]], np.float32),
                (3, 1, 1))
    ref = np.asarray(A.warp_affine(jnp.array(img), jnp.array(m), (48, 48)))
    out = np.asarray(A.warp_affine_mxu(jnp.array(img), jnp.array(m), (48, 48)))
    np.testing.assert_allclose(out, ref, atol=1e-3)


def test_mxu_warp_close_under_rotation(rng):
    # rotations: two-pass bilinear differs from direct 4-tap by at most
    # gradient x tan(theta) px of horizontal skew on the vertical taps
    img = rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32)
    ms = []
    for th in (0.15, -0.25):
        c, s = np.cos(th) * 0.95, np.sin(th) * 0.95
        ms.append([[c, -s, 6.0], [s, c, 3.0]])
    m = np.asarray(ms, np.float32)
    ref = np.asarray(A.warp_affine(jnp.array(img), jnp.array(m), (56, 56)))
    out = np.asarray(A.warp_affine_mxu(jnp.array(img), jnp.array(m), (56, 56)))
    inner_r, inner_o = ref[:, 3:-3, 3:-3], out[:, 3:-3, 3:-3]
    assert np.mean(np.abs(inner_r - inner_o)) < 4.0  # on white noise
    assert np.corrcoef(inner_r.ravel(), inner_o.ravel())[0, 1] > 0.99


def test_mxu_warp_zero_border(rng):
    img = jnp.ones((1, 32, 32, 3), jnp.float32) * 200.0
    # forward shift +24 in x: output columns < 24 map to src x < 0
    m = jnp.asarray([[[1.0, 0.0, 24.0], [0.0, 1.0, 0.0]]])
    out = np.asarray(A.warp_affine_mxu(img, m, (32, 32)))
    assert np.allclose(out[:, :, :23], 0.0)  # outside the source: 0
    assert np.allclose(out[:, :, 25:], 200.0)  # in-range region
    ref = np.asarray(A.warp_affine(img, m, (32, 32)))
    np.testing.assert_allclose(out, ref, atol=1e-3)


def test_bf16_feed_close_to_fp32(rng):
    """dtype=bfloat16 einsum feeds (the serving pipeline's setting) stay
    within ~1.5 intensity units of the fp32 path on [0, 255] images."""
    import jax.numpy as jnp

    from deep_insight_face_tpu.ops.align import (
        crop_resize_boxes, warp_affine_mxu,
    )

    imgs = jnp.asarray(rng.uniform(0, 255, (3, 64, 64, 3)).astype(np.float32))
    boxes = jnp.asarray(
        np.array([[4, 6, 50, 60], [0, 0, 64, 64], [10, 10, 30, 40]],
                 np.float32)
    )
    a = np.asarray(crop_resize_boxes(imgs, boxes, (32, 32)))
    b = np.asarray(crop_resize_boxes(imgs, boxes, (32, 32),
                                     dtype=jnp.bfloat16))
    assert np.abs(a - b).max() < 1.5

    mats = jnp.asarray(
        np.tile(np.array([[0.9, -0.1, 5.0], [0.1, 0.9, -3.0]],
                         np.float32), (3, 1, 1))
    )
    wa = np.asarray(warp_affine_mxu(imgs, mats, (64, 64)))
    wb = np.asarray(warp_affine_mxu(imgs, mats, (64, 64),
                                    dtype=jnp.bfloat16))
    assert np.abs(wa - wb).max() < 1.5


def test_int8_feed_close_to_fp32(rng):
    """dtype=int8 quantized interpolation (the serving pipeline's
    setting: s8×s8→s32 on the MXU, half the weight-tensor HBM bytes of
    bf16) stays within ~6 intensity units of fp32 on [0, 255] images and
    dequantizes back to float32."""
    import jax.numpy as jnp

    from deep_insight_face_tpu.ops.align import (
        crop_resize_boxes, warp_affine_mxu,
    )

    imgs = jnp.asarray(rng.uniform(0, 255, (3, 64, 64, 3)).astype(np.float32))
    boxes = jnp.asarray(
        np.array([[4, 6, 50, 60], [0, 0, 64, 64], [10, 10, 30, 40]],
                 np.float32)
    )
    a = np.asarray(crop_resize_boxes(imgs, boxes, (32, 32)))
    b = np.asarray(crop_resize_boxes(imgs, boxes, (32, 32),
                                     dtype=jnp.int8))
    assert b.dtype == np.float32
    assert np.abs(a - b).max() < 6.0
    assert np.abs(a - b).mean() < 1.5

    mats = jnp.asarray(
        np.tile(np.array([[0.9, -0.1, 5.0], [0.1, 0.9, -3.0]],
                         np.float32), (3, 1, 1))
    )
    wa = np.asarray(warp_affine_mxu(imgs, mats, (64, 64)))
    wb = np.asarray(warp_affine_mxu(imgs, mats, (64, 64),
                                    dtype=jnp.int8))
    assert wb.dtype == np.float32
    assert np.abs(wa - wb).max() < 6.0
    assert np.abs(wa - wb).mean() < 1.5
