"""Deformation-tail augmentations (reference menu: common/image_aug.py:
560-626 — ElasticTransformation, PiecewiseAffine, PerspectiveTransform,
Sharpen/Emboss/EdgeDetect, Invert, Superpixels).

Oracles: the bounded-displacement warp against a naive per-pixel numpy
two-pass resampler; the projective MXU warp against the affine MXU warp
(homography embedding) and against exact analytic values on linear
ramps (bilinear interpolation of a plane is exact, so the two-pass
approximation introduces zero error there); the 3×3 convolution family
against scipy.ndimage with edge ('nearest') border.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import deep_insight_face_tpu.ops.image as I
from deep_insight_face_tpu.ops.align import (
    invert_homography,
    warp_affine_mxu,
    warp_projective_mxu,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _imgs(rng, n=2, h=24, w=20, c=3):
    return rng.uniform(0, 255, (n, h, w, c)).astype(np.float32)


# ---------------------------------------------------------------------------
# displacement_warp
# ---------------------------------------------------------------------------


def test_displacement_warp_zero_field_is_identity(rng):
    x = _imgs(rng)
    z = jnp.zeros(x.shape[:3])
    out = I.displacement_warp(jnp.array(x), z, z, max_disp=4)
    np.testing.assert_allclose(np.asarray(out), x, atol=1e-4)


def test_displacement_warp_integer_shift(rng):
    """Constant integer dx shifts columns; edge column replicates."""
    x = _imgs(rng, n=1)
    dx = jnp.full(x.shape[:3], 2.0)
    dy = jnp.zeros(x.shape[:3])
    out = np.asarray(I.displacement_warp(jnp.array(x), dx, dy, max_disp=4))
    np.testing.assert_allclose(out[0, :, :-2], x[0, :, 2:], atol=1e-3)
    np.testing.assert_allclose(out[0, :, -1], x[0, :, -1], atol=1e-3)


def _naive_two_pass(x, dx, dy, r):
    """Per-pixel numpy oracle of the two-pass hat resampler (edge pad)."""
    n, h, w, c = x.shape
    out = np.zeros_like(x)
    # vertical
    tmp = np.zeros_like(x)
    for i in range(n):
        for y in range(h):
            for xx in range(w):
                s = y + np.clip(dy[i, y, xx], -r, r)
                y0 = int(np.floor(s))
                f = s - y0
                ya = min(max(y0, 0), h - 1)
                yb = min(max(y0 + 1, 0), h - 1)
                tmp[i, y, xx] = (1 - f) * x[i, ya, xx] + f * x[i, yb, xx]
    for i in range(n):
        for y in range(h):
            for xx in range(w):
                s = xx + np.clip(dx[i, y, xx], -r, r)
                x0 = int(np.floor(s))
                f = s - x0
                xa = min(max(x0, 0), w - 1)
                xb = min(max(x0 + 1, 0), w - 1)
                out[i, y, xx] = (1 - f) * tmp[i, y, xa] + f * tmp[i, y, xb]
    return out


def test_displacement_warp_matches_naive_oracle(rng):
    x = _imgs(rng, n=2, h=12, w=10, c=2)
    dx = rng.uniform(-3.2, 3.2, x.shape[:3]).astype(np.float32)
    dy = rng.uniform(-3.2, 3.2, x.shape[:3]).astype(np.float32)
    got = np.asarray(
        I.displacement_warp(jnp.array(x), jnp.array(dx), jnp.array(dy), 4))
    want = _naive_two_pass(x, dx, dy, 4)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_random_elastic_bounded_and_local(rng):
    """Every output pixel is a convex combination of a bounded
    neighborhood of the input (hat weights ≥ 0 sum to 1)."""
    x = _imgs(rng, n=3, h=16, w=16, c=1)
    out = np.asarray(I.random_elastic(jax.random.key(0), jnp.array(x)))
    assert out.shape == x.shape
    r = 5  # max_disp=4 + 1 tap
    for i in (0, 2):
        for y in range(0, 16, 5):
            for xx in range(0, 16, 5):
                patch = x[i, max(y - r, 0):y + r + 1,
                          max(xx - r, 0):xx + r + 1]
                assert out[i, y, xx] >= patch.min() - 1e-3
                assert out[i, y, xx] <= patch.max() + 1e-3


def test_random_piecewise_affine_shape_and_jit(rng):
    x = _imgs(rng)
    f = jax.jit(lambda k, im: I.random_piecewise_affine(k, im))
    out = np.asarray(f(jax.random.key(1), jnp.array(x)))
    assert out.shape == x.shape
    assert np.isfinite(out).all()


# ---------------------------------------------------------------------------
# projective warp
# ---------------------------------------------------------------------------


def test_invert_homography_roundtrip(rng):
    m = np.eye(3) + rng.uniform(-0.2, 0.2, (5, 3, 3))
    m[:, 2, 2] = 1.0
    inv = np.asarray(invert_homography(jnp.array(m, jnp.float32)))
    prod = np.einsum("nij,njk->nik", m, inv)
    prod /= prod[:, 2:3, 2:3]
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(3), (5, 3, 3)),
                               atol=1e-4)


def test_projective_warp_reduces_to_affine(rng):
    x = _imgs(rng, n=2, h=20, w=18)
    ang = 0.2
    mats = np.array([[[np.cos(ang), -np.sin(ang), 3.0],
                      [np.sin(ang), np.cos(ang), -2.0]],
                     [[1.1, 0.05, -1.0], [0.02, 0.9, 2.0]]], np.float32)
    m3 = np.concatenate(
        [mats, np.broadcast_to([[[0, 0, 1.0]]], (2, 1, 3))], axis=1)
    a = np.asarray(warp_affine_mxu(jnp.array(x), jnp.array(mats), (20, 18)))
    p = np.asarray(
        warp_projective_mxu(jnp.array(x), jnp.array(m3, np.float32), (20, 18)))
    np.testing.assert_allclose(p, a, atol=1e-2)


def test_projective_warp_exact_on_linear_ramp():
    """On a plane image bilinear resampling is exact, so the warped
    output must equal the analytic pull-back ramp(H⁻¹(x, y)) wherever
    all taps are in-bounds."""
    h, w = 24, 22
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    ramp = (2.0 * xx + 3.0 * yy + 10.0)[None, :, :, None]
    # mild keystone: top edge pinched inward
    src = np.array([[[0, 0], [w - 1.0, 0], [w - 1.0, h - 1.0], [0, h - 1.0]]],
                   np.float32)
    dst = src + np.array([[[2.0, 1.0], [-2.0, 0.5], [1.0, -1.0], [-1.5, 0.0]]],
                         np.float32)
    m = I.perspective_matrices_from_corners(jnp.array(src), jnp.array(dst))
    out = np.asarray(warp_projective_mxu(jnp.array(ramp), m, (h, w)))
    inv = np.asarray(invert_homography(m))[0]
    got, want = [], []
    for y in range(4, h - 4):
        for x in range(4, w - 4):
            d = inv[2, 0] * x + inv[2, 1] * y + 1.0
            u = (inv[0, 0] * x + inv[0, 1] * y + inv[0, 2]) / d
            v = (inv[1, 0] * x + inv[1, 1] * y + inv[1, 2]) / d
            if 1 <= u < w - 2 and 1 <= v < h - 2:
                got.append(out[0, y, x, 0])
                want.append(2.0 * u + 3.0 * v + 10.0)
    assert len(got) > 100
    np.testing.assert_allclose(np.array(got), np.array(want), rtol=2e-3)


def test_perspective_corners_map_exactly(rng):
    src = jnp.array(
        [[[0.0, 0.0], [19.0, 0.0], [19.0, 23.0], [0.0, 23.0]]] * 3)
    dst = src + jnp.array(rng.uniform(-2, 2, (3, 4, 2)), jnp.float32)
    m = I.perspective_matrices_from_corners(src, dst)
    got = I.transform_keypoints_projective(m, src)
    np.testing.assert_allclose(np.asarray(got), np.asarray(dst), atol=1e-3)


def test_random_perspective_small_scale_near_identity(rng):
    x = _imgs(rng, n=2, h=32, w=32)
    out = np.asarray(I.random_perspective(
        jax.random.key(3), jnp.array(x), scale=(1e-5, 2e-5)))
    np.testing.assert_allclose(out[:, 4:-4, 4:-4], x[:, 4:-4, 4:-4], atol=1.0)


# ---------------------------------------------------------------------------
# 3×3 convolution family
# ---------------------------------------------------------------------------


def test_conv3x3_matches_scipy(rng):
    scipy_ndimage = pytest.importorskip("scipy.ndimage")
    x = _imgs(rng, n=2, h=10, w=9, c=2)
    kern = rng.uniform(-1, 1, (2, 3, 3)).astype(np.float32)
    got = np.asarray(I._conv3x3(jnp.array(x), jnp.array(kern)))
    for i in range(2):
        for ch in range(2):
            # scipy convolve flips the kernel; the shifted-add form is a
            # correlation — flip to compare
            want = scipy_ndimage.correlate(
                x[i, :, :, ch], kern[i], mode="nearest")
            np.testing.assert_allclose(got[i, :, :, ch], want, atol=1e-3)


def test_sharpen_alpha_zero_identity(rng):
    x = _imgs(rng)
    out = np.asarray(I.random_sharpen(
        jax.random.key(0), jnp.array(x), alpha=(0.0, 0.0)))
    np.testing.assert_allclose(out, x, atol=1e-3)


def test_emboss_alpha_zero_identity(rng):
    x = _imgs(rng)
    out = np.asarray(I.random_emboss(
        jax.random.key(0), jnp.array(x), alpha=(0.0, 0.0)))
    np.testing.assert_allclose(out, x, atol=1e-3)


def test_edge_detect_flat_image():
    """Laplacian of a flat image is 0, so output = (1−α)·v."""
    x = jnp.full((1, 8, 8, 3), 100.0)
    out = np.asarray(I.random_edge_detect(
        jax.random.key(0), x, alpha=(1.0, 1.0)))
    np.testing.assert_allclose(out, 0.0, atol=1e-3)
    out = np.asarray(I.random_edge_detect(
        jax.random.key(0), x, alpha=(0.25, 0.25)))
    np.testing.assert_allclose(out, 75.0, atol=1e-2)


def test_invert_prob_extremes(rng):
    x = _imgs(rng)
    out = np.asarray(I.random_invert(jax.random.key(0), jnp.array(x), 1.0))
    np.testing.assert_allclose(out, 255.0 - x, atol=1e-4)
    out = np.asarray(I.random_invert(jax.random.key(0), jnp.array(x), 0.0))
    np.testing.assert_allclose(out, x, atol=1e-4)


def test_superpixels_full_replace_is_cell_means(rng):
    x = _imgs(rng, n=1, h=8, w=8, c=1)
    out = np.asarray(I.random_superpixels(
        jax.random.key(0), jnp.array(x), cell=4, p_replace=(1.0, 1.0)))
    for cy in range(2):
        for cx in range(2):
            cellv = x[0, cy * 4:(cy + 1) * 4, cx * 4:(cx + 1) * 4]
            np.testing.assert_allclose(
                out[0, cy * 4:(cy + 1) * 4, cx * 4:(cx + 1) * 4],
                cellv.mean(), atol=1e-3)
    out = np.asarray(I.random_superpixels(
        jax.random.key(0), jnp.array(x), cell=4, p_replace=(0.0, 0.0)))
    np.testing.assert_allclose(out, x, atol=1e-4)


# ---------------------------------------------------------------------------
# stack integration + co-transforms
# ---------------------------------------------------------------------------


def test_all_stack_with_deform_tail_jits(rng):
    x = _imgs(rng, n=4, h=32, w=32)
    f = jax.jit(lambda k, im: I.augment_batch(k, im, "all"))
    out = np.asarray(f(jax.random.key(5), jnp.array(x)))
    assert out.shape == x.shape
    assert np.isfinite(out).all()


def test_landmarks_track_projective_warp(rng):
    """Points through a pure perspective co-transform land on the warped
    pixel content: plant a bright dot at a landmark, warp image and
    point with the same homography, the warped dot's argmax must sit at
    the transformed point (±1.5 px)."""
    h = w = 48
    x = np.zeros((1, h, w, 1), np.float32)
    pt = np.array([[[30.0, 18.0]]], np.float32)
    x[0, 18, 30, 0] = 255.0
    src = jnp.array([[[0.0, 0.0], [w - 1.0, 0.0], [w - 1.0, h - 1.0],
                      [0.0, h - 1.0]]])
    dst = src + jnp.array([[[3.0, 2.0], [-2.0, 1.0], [2.0, -2.0],
                            [-1.0, 1.0]]])
    m = I.perspective_matrices_from_corners(src, dst)
    warped = np.asarray(warp_projective_mxu(jnp.array(x), m, (h, w)))
    got_pt = np.asarray(I.transform_keypoints_projective(m, jnp.array(pt)))
    iy, ix = np.unravel_index(np.argmax(warped[0, :, :, 0]), (h, w))
    assert abs(got_pt[0, 0, 0] - ix) <= 1.5
    assert abs(got_pt[0, 0, 1] - iy) <= 1.5


def test_augment_with_landmarks_all_option_tracks_pixels(rng):
    """End-to-end 'all' co-transform (affine ∘ perspective ∘ elastic):
    dots planted at landmarks must stay near the returned points. The
    elastic point shift is a first-order inverse, so the tolerance is
    looser than the exact affine path (±2.5 px at α ≤ 3.5)."""
    h = w = 56
    n = 4
    x = np.zeros((n, h, w, 3), np.float32)
    pts = np.array([[18.0, 20.0], [40.0, 34.0]], np.float32)
    for i in range(n):
        for px, py in pts:
            x[i, int(py), int(px)] = 255.0
    lm = jnp.broadcast_to(jnp.array(pts), (n, 2, 2))
    out, opts = I.augment_with_landmarks(
        jax.random.key(2), jnp.array(x), lm, option="all")
    out, opts = np.asarray(out), np.asarray(opts)
    assert out.shape == x.shape and opts.shape == (n, 2, 2)
    assert np.isfinite(opts).all()
    for i in range(n):
        for k in range(2):
            px, py = opts[i, k]
            if 3 <= px < w - 3 and 3 <= py < h - 3:
                # photometric tail may rescale intensities — look for
                # the brightest pixel in a window around the point
                win = out[i, max(int(py) - 3, 0):int(py) + 4,
                          max(int(px) - 3, 0):int(px) + 4]
                assert win.max() >= out[i].mean()


def test_augment_with_segmaps_all_option_labels_ride_pixels(rng):
    h = w = 40
    n = 2
    x = rng.uniform(0, 255, (n, h, w, 3)).astype(np.float32)
    seg = np.zeros((n, h, w), np.int32)
    seg[:, 10:30, 8:32] = 1
    out, oseg = I.augment_with_segmaps(
        jax.random.key(9), jnp.array(x), jnp.array(seg), 2, option="all")
    oseg = np.asarray(oseg)
    assert oseg.shape == seg.shape
    assert set(np.unique(oseg)) <= {0, 1}
    # the blob survives (same geometry as pixels; area within 2.5× range
    # covers the crop/zoom envelope of the 'all' stack)
    area = oseg.sum(axis=(1, 2))
    want = seg.sum(axis=(1, 2))
    assert (area > want * 0.3).all() and (area < want * 2.5).all()


# ---------------------------------------------------------------------------
# noise-alpha blends + blur OneOf tail (reference: common/image_aug.py:
# 564-573 AverageBlur/MedianBlur, 583-586 SimplexNoiseAlpha(EdgeDetect|
# DirectedEdgeDetect), 600-607 FrequencyNoiseAlpha(Multiply|Contrast))
# ---------------------------------------------------------------------------


def test_average_blur_radius1_matches_numpy_box(rng):
    x = _imgs(rng, n=3, h=10, w=11, c=2)
    # max_radius=1 forces radius 1 on every image → exact 3×3 box filter
    got = np.asarray(I.random_average_blur(
        jax.random.key(0), jnp.array(x), max_radius=1))
    xp = np.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="edge")
    want = (xp[:, :-2] + xp[:, 1:-1] + xp[:, 2:]) / 3.0
    xp = np.pad(want, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge")
    want = (xp[:, :, :-2] + xp[:, :, 1:-1] + xp[:, :, 2:]) / 3.0
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_median_blur3_matches_numpy(rng):
    x = _imgs(rng, n=2, h=9, w=8, c=1)
    got = np.asarray(I.median_blur3(jnp.array(x)))
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    wins = np.stack([
        xp[:, dy:dy + 9, dx:dx + 8] for dy in range(3) for dx in range(3)
    ], 0)
    np.testing.assert_allclose(got, np.median(wins, axis=0), atol=1e-4)


def test_directed_edge_detect_flat_and_ramp():
    # flat image: every directional derivative is 0 → α=1 gives black
    x = jnp.full((1, 8, 8, 3), 120.0)
    out = np.asarray(I.random_directed_edge_detect(
        jax.random.key(0), x, alpha=(1.0, 1.0)))
    np.testing.assert_allclose(out, 0.0, atol=1e-3)
    # a ramp has nonzero gradient: interior must light up for a generic θ
    ramp = jnp.broadcast_to(
        jnp.arange(8.0)[None, None, :, None] * 30.0, (1, 8, 8, 3))
    out = np.asarray(I.random_directed_edge_detect(
        jax.random.key(1), ramp, alpha=(1.0, 1.0)))
    assert out[0, 2:-2, 2:-2].max() > 1.0


def test_smooth_noise_mask_contract():
    m = np.asarray(I.smooth_noise_mask(jax.random.key(3), 4, 24, 20))
    assert m.shape == (4, 24, 20, 1)
    assert m.min() >= 0.0 and m.max() <= 1.0 + 1e-6
    # per-image min-max normalization: each image spans ~[0, 1]
    np.testing.assert_allclose(m.min(axis=(1, 2, 3)), 0.0, atol=1e-5)
    np.testing.assert_allclose(m.max(axis=(1, 2, 3)), 1.0, atol=1e-5)
    # blobby (low-frequency): neighbor pixels are close
    assert np.abs(np.diff(m[..., 0], axis=2)).mean() < 0.1


def test_noise_alpha_blends_are_local(rng):
    """Where the mask is 0 the original survives; the blend must be
    spatially NON-uniform (some pixels nearly original, others nearly
    the effect) — the whole point vs. a scalar-alpha blend."""
    x = _imgs(rng, n=2, h=24, w=24)
    for fn in (I.random_edge_noise_alpha, I.random_intensity_noise_alpha):
        out = np.asarray(fn(jax.random.key(4), jnp.array(x)))
        assert out.shape == x.shape and np.isfinite(out).all()
        diff = np.abs(out - x).mean(-1)  # (n, h, w)
        for i in range(2):
            d = diff[i]
            assert d.min() < 0.1 * max(d.max(), 1e-6), (
                "no near-original region — mask not spatially local")
        assert diff.max() > 1.0, "effect never applied"
