"""Face alignment: similarity/affine transform solvers + batched
bilinear warp, fully on-device.

Replaces the reference's cv2.getAffineTransform + cv2.warpAffine
thumbnail path (reference: deep_insight_face/api.py:132-145) with:

- an exact 3-point affine solve (cv2.getAffineTransform semantics);
- a least-squares Umeyama similarity solve for 5-point ArcFace-style
  alignment (rotation+scale+translation only — more robust than a full
  affine for faces);
- a jit/vmap-friendly bilinear warp with constant border, matching
  cv2.warpAffine(INTER_LINEAR) on the interior.

The warp is batched over faces: one fused XLA computation does
solve → grid → 4-tap gather → lerp for the whole batch. Landmark
templates live in :mod:`deep_insight_face_tpu.ops.templates`.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deep_insight_face_tpu.ops.templates import (  # noqa: F401 (re-export)
    INNER_EYES_AND_BOTTOM_LIP,
    MINMAX_TEMPLATE,
    OUTER_EYES_AND_NOSE,
    TEMPLATE,
)

#: ArcFace canonical 5-point template for 112×112 crops
#: (left eye, right eye, nose, left mouth, right mouth) — public constants.
ARCFACE_TEMPLATE_112 = np.array(
    [
        [38.2946, 51.6963],
        [73.5318, 51.5014],
        [56.0252, 71.7366],
        [41.5493, 92.3655],
        [70.7299, 92.2041],
    ],
    dtype=np.float32,
)


# ---------------------------------------------------------------------------
# transform solvers
# ---------------------------------------------------------------------------


def affine_from_3pts(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Exact 2×3 affine mapping 3 src points onto 3 dst points
    (cv2.getAffineTransform semantics; used by the reference's
    create_thumbnail, api.py:142)."""
    src = jnp.asarray(src, jnp.float32)
    dst = jnp.asarray(dst, jnp.float32)
    ones = jnp.ones((3, 1), jnp.float32)
    a = jnp.concatenate([src, ones], axis=1)  # (3, 3): [x, y, 1]
    # solve a @ Mᵀ = dst  → M (2, 3)
    mt = jnp.linalg.solve(a, dst)  # (3, 2)
    return mt.T


def umeyama_similarity(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Least-squares similarity transform mapping src → dst. Returns 2×3.

    Closed form over scaled rotations: with centered points p, q, the
    optimal ``[[a, -b], [b, a]]`` has ``a = Σ(p·q)/Σ‖p‖²`` and
    ``b = Σ(p×q)/Σ‖p‖²``. Identical to Umeyama (1991) whenever the
    optimal rotation is proper (always true for consistently-oriented
    face landmarks) — and, unlike the SVD formulation, it lowers to a
    handful of VPU ops (jnp.linalg.svd takes >60 s to compile on TPU).
    """
    src = jnp.asarray(src, jnp.float32)
    dst = jnp.asarray(dst, jnp.float32)
    mu_s = jnp.mean(src, axis=0)
    mu_d = jnp.mean(dst, axis=0)
    p = src - mu_s
    q = dst - mu_d
    denom = jnp.maximum(jnp.sum(p * p), 1e-12)
    a = jnp.sum(p * q) / denom
    b = jnp.sum(p[:, 0] * q[:, 1] - p[:, 1] * q[:, 0]) / denom
    m = jnp.array([[1.0, 0.0], [0.0, 1.0]]) * a + jnp.array(
        [[0.0, -1.0], [1.0, 0.0]]
    ) * b
    t = mu_d - m @ mu_s
    return jnp.concatenate([m, t[:, None]], axis=1)


def invert_affine(m: jnp.ndarray) -> jnp.ndarray:
    """Invert a 2×3 affine."""
    a = m[:, :2]
    t = m[:, 2]
    ai = jnp.linalg.inv(a)
    return jnp.concatenate([ai, (-ai @ t)[:, None]], axis=1)


# ---------------------------------------------------------------------------
# bilinear warp
# ---------------------------------------------------------------------------


def _warp_one(
    img: jnp.ndarray, m: jnp.ndarray, out_hw: Tuple[int, int]
) -> jnp.ndarray:
    """Bilinear warp of one HWC image; ``m`` maps dst (x, y) → src (x, y).

    Out-of-bounds samples are constant 0 (cv2 BORDER_CONSTANT). A 4-tap
    flat gather + lerp; vmapped over the batch by :func:`warp_affine`.
    """
    h, w, c = img.shape
    oh, ow = out_hw
    ys, xs = jnp.meshgrid(
        jnp.arange(oh, dtype=jnp.float32),
        jnp.arange(ow, dtype=jnp.float32),
        indexing="ij",
    )
    sx = m[0, 0] * xs + m[0, 1] * ys + m[0, 2]
    sy = m[1, 0] * xs + m[1, 1] * ys + m[1, 2]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0

    def tap(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        flat = img.reshape(h * w, c)
        vals = jnp.take(flat, yc * w + xc, axis=0)
        return jnp.where(valid[..., None], vals, 0.0)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def _interp_matrix(
    pos: jnp.ndarray, in_size: int
) -> jnp.ndarray:
    """(…, out, in) bilinear interpolation matrix for sample positions
    ``pos`` (…, out) along one axis. Out-of-range samples weight to 0."""
    grid = jnp.arange(in_size, dtype=jnp.float32)
    p0 = jnp.floor(pos)
    frac = pos - p0

    def tap(p, weight):
        in_bounds = (p >= 0.0) & (p <= in_size - 1.0)
        pc = jnp.clip(p, 0.0, in_size - 1.0)
        return (grid == pc[..., None]) * (weight * in_bounds)[..., None]

    # per-tap validity (matches the gather warp: an out-of-range tap
    # contributes 0 while its in-range partner still blends)
    return tap(p0, 1.0 - frac) + tap(p0 + 1.0, frac)


@functools.partial(jax.jit, static_argnames=("out_hw", "dtype"))
def scale_translate_warp(
    images: jnp.ndarray,
    scales: jnp.ndarray,
    offsets: jnp.ndarray,
    out_hw: Tuple[int, int],
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Axis-aligned batched warp: dst(y, x) = src(sy·y + oy, sx·x + ox),
    bilinear, constant-0 border.

    The separable case of warp_affine (crop + resize — exactly what the
    detect→embed pipeline needs) expressed as two dense interpolation-
    matrix contractions, which run on the MXU instead of the gather unit:
    TPU gathers made the gather-based warp the single slowest pipeline
    stage (~13 ms/batch-32 vs <1 ms for this formulation).

    ``scales``: (N, 2) [sy, sx]; ``offsets``: (N, 2) [oy, ox].
    ``dtype=bfloat16`` feeds the einsums half-width inputs (halving the
    HBM bytes of the dominant feed) while accumulating fp32; pixel error
    ≤ ~1 intensity unit on [0, 255] (0..256 are exact in bf16, tap
    weights carry ~2⁻⁹ relative error). ``dtype=int8`` quantizes pixels
    to 0..127 and tap weights to 1/127 steps and contracts s8×s8→s32 on
    the MXU — half the HBM bytes of bf16 again; pixel error ≤ ~5 units,
    output is dequantized float32. The serving pipeline uses int8
    (measured quality-neutral end-to-end: scripts/e2e_quality.py);
    oracle tests keep fp32.
    """
    n, h, w, c = images.shape
    oh, ow = out_hw
    ys = scales[:, 0:1] * jnp.arange(oh, dtype=jnp.float32)[None, :] + offsets[:, 0:1]
    xs = scales[:, 1:2] * jnp.arange(ow, dtype=jnp.float32)[None, :] + offsets[:, 1:2]
    wv = _interp_matrix(ys, h)  # (n, oh, h)
    wh = _interp_matrix(xs, w)  # (n, ow, w)
    if dtype == jnp.int8:
        x8 = jnp.clip(jnp.round(images.astype(jnp.float32) * 0.5), 0, 127
                      ).astype(jnp.int8)
        wv8 = jnp.round(wv * 127.0).astype(jnp.int8)
        wh8 = jnp.round(wh * 127.0).astype(jnp.int8)
        t = jnp.einsum("nyh,nhwc->nywc", wv8, x8,
                       preferred_element_type=jnp.int32)
        t8 = jnp.clip((t + 63) >> 7, 0, 127).astype(jnp.int8)  # /128 requant
        o = jnp.einsum("nxw,nywc->nyxc", wh8, t8,
                       preferred_element_type=jnp.int32)
        # scales: pixel 2.0 × tap 127 × requant 128 × tap 127
        return o.astype(jnp.float32) * (2.0 * 128.0 / (127.0 * 127.0))
    x = images.astype(dtype)
    t = jnp.einsum("nyh,nhwc->nywc", wv.astype(dtype), x,
                   preferred_element_type=jnp.float32).astype(dtype)
    return jnp.einsum("nxw,nywc->nyxc", wh.astype(dtype), t,
                      preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("out_hw", "dtype"))
def crop_resize_boxes(
    images: jnp.ndarray, boxes: jnp.ndarray, out_hw: Tuple[int, int],
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Batched box crop + bilinear resize (x1, y1, x2, y2 float boxes) via
    the separable MXU warp. Sampling convention matches
    cv2.resize(crop, out) with half-pixel centers."""
    oh, ow = out_hw
    bw = boxes[:, 2] - boxes[:, 0]
    bh = boxes[:, 3] - boxes[:, 1]
    sy = bh / oh
    sx = bw / ow
    # half-pixel: dst pixel y samples src at y1 + (y + 0.5)·sy − 0.5
    oy = boxes[:, 1] + 0.5 * sy - 0.5
    ox = boxes[:, 0] + 0.5 * sx - 0.5
    return scale_translate_warp(
        images, jnp.stack([sy, sx], -1), jnp.stack([oy, ox], -1), out_hw,
        dtype=dtype,
    )


@functools.partial(jax.jit, static_argnames=("out_hw",))
def warp_affine(
    images: jnp.ndarray, matrices: jnp.ndarray, out_hw: Tuple[int, int]
) -> jnp.ndarray:
    """Batched bilinear warp.

    ``images``: (N, H, W, C) float; ``matrices``: (N, 2, 3) FORWARD
    transforms mapping src → dst (cv2.warpAffine convention); output is
    (N, oh, ow, C). The inverse (dst→src) map is computed internally.
    """
    inv = jax.vmap(invert_affine)(matrices)
    return jax.vmap(lambda im, m: _warp_one(im, m, out_hw))(
        images.astype(jnp.float32), inv
    )


@functools.partial(jax.jit, static_argnames=("out_hw", "dtype"))
def warp_affine_mxu(
    images: jnp.ndarray, matrices: jnp.ndarray, out_hw: Tuple[int, int],
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Batched affine warp as TWO dense interpolation einsums (no gather).

    Same contract as :func:`warp_affine` (forward 2×3 matrices, bilinear,
    constant-0 border) but implemented with the Catmull-Smith two-pass
    decomposition: with the inverse map u = a·x + b·y + c,
    v = d·x + e·y + f, substituting y = (v − d·x − f)/e makes the
    horizontal sample position linear in (x, v) — so each pass is a 1-D
    resample whose two-tap hat weights form a dense (out, in) matrix per
    (image, row), contracted on the MXU. XLA TPU gathers price the
    4-tap warp at ~53 ms/batch-128 @112²; these two einsums run it in a
    few ms (~56× redundant FLOPs, but the MXU has them to spare).

    Sub-percent weight/skew differences vs the direct 4-tap warp are
    expected (two-pass bilinear evaluates the horizontal position at the
    two neighboring source rows, not at the exact sample row). Degenerate
    when the vertical map loses rank (|e| → 0, i.e. rotations near ±90°)
    — face alignment rotations are far from that; use :func:`warp_affine`
    there.
    """
    inv = jax.vmap(invert_affine)(matrices)
    a, b, c = inv[:, 0, 0], inv[:, 0, 1], inv[:, 0, 2]
    d, e, f = inv[:, 1, 0], inv[:, 1, 1], inv[:, 1, 2]
    n, h, w, _ = images.shape
    oh, ow = out_hw
    xg = jnp.arange(ow, dtype=jnp.float32)
    yg = jnp.arange(oh, dtype=jnp.float32)
    vg = jnp.arange(h, dtype=jnp.float32)
    ug = jnp.arange(w, dtype=jnp.float32)
    # sign-preserving clamp: replacing a small NEGATIVE e with +1e-6
    # would flip the vertical map's sign, breaking the documented
    # "degenerate but continuous" behavior on that side of zero
    e_safe = jnp.where(
        jnp.abs(e) < 1e-6, jnp.where(e < 0, -1e-6, 1e-6), e
    )

    # pass 1 (horizontal, over source rows v): u = A1·x + B1·v + C1
    A1 = a - b * d / e_safe
    B1 = b / e_safe
    C1 = c - b * f / e_safe
    p1 = (
        A1[:, None, None] * xg[None, None, :]
        + B1[:, None, None] * vg[None, :, None]
        + C1[:, None, None]
    )  # (n, h, ow)
    w1 = jnp.maximum(0.0, 1.0 - jnp.abs(ug - p1[..., None]))  # (n, h, ow, w)

    # pass 2 (vertical): v = d·x + e·y + f
    p2 = (
        d[:, None, None] * xg[None, None, :]
        + e[:, None, None] * yg[None, :, None]
        + f[:, None, None]
    )  # (n, oh, ow)
    w2 = jnp.maximum(0.0, 1.0 - jnp.abs(vg - p2[..., None]))  # (n, oh, ow, h)

    if dtype == jnp.int8:
        # s8×s8→s32 on the MXU: the (N, 112, 112, 112) weight tensors are
        # the warp's HBM bottleneck — int8 halves their bytes vs bf16
        # (measured −0.6 ms/batch-128 on v5e; pixel error ≤ ~5 on 0..255,
        # quality-neutral end-to-end per scripts/e2e_quality.py)
        x8 = jnp.clip(jnp.round(images.astype(jnp.float32) * 0.5), 0, 127
                      ).astype(jnp.int8)
        w1q = jnp.round(w1 * 127.0).astype(jnp.int8)
        w2q = jnp.round(w2 * 127.0).astype(jnp.int8)
        tmp = jnp.einsum("nvxu,nvuc->nvxc", w1q, x8,
                         preferred_element_type=jnp.int32)
        t8 = jnp.clip((tmp + 63) >> 7, 0, 127).astype(jnp.int8)
        out = jnp.einsum("nyxv,nvxc->nyxc", w2q, t8,
                         preferred_element_type=jnp.int32)
        return out.astype(jnp.float32) * (2.0 * 128.0 / (127.0 * 127.0))

    x = images.astype(dtype)
    tmp = jnp.einsum("nvxu,nvuc->nvxc", w1.astype(dtype), x,
                     preferred_element_type=jnp.float32).astype(dtype)
    return jnp.einsum("nyxv,nvxc->nyxc", w2.astype(dtype), tmp,
                      preferred_element_type=jnp.float32)


def invert_homography(m: jnp.ndarray) -> jnp.ndarray:
    """Invert a 3×3 homography via the adjugate (no LU/`linalg.inv` —
    nine fused multiplies, batch-friendly, and exact up to scale, which
    is all a projective map is defined to)."""
    c = jnp.stack([
        m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1],
        m[..., 0, 2] * m[..., 2, 1] - m[..., 0, 1] * m[..., 2, 2],
        m[..., 0, 1] * m[..., 1, 2] - m[..., 0, 2] * m[..., 1, 1],
        m[..., 1, 2] * m[..., 2, 0] - m[..., 1, 0] * m[..., 2, 2],
        m[..., 0, 0] * m[..., 2, 2] - m[..., 0, 2] * m[..., 2, 0],
        m[..., 0, 2] * m[..., 1, 0] - m[..., 0, 0] * m[..., 1, 2],
        m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0],
        m[..., 0, 1] * m[..., 2, 0] - m[..., 0, 0] * m[..., 2, 1],
        m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0],
    ], axis=-1).reshape(m.shape)
    # normalize so the bottom-right entry is 1 (the warp assumes it)
    return c / c[..., 2:3, 2:3]


@functools.partial(jax.jit, static_argnames=("out_hw", "dtype"))
def warp_projective_mxu(
    images: jnp.ndarray, matrices: jnp.ndarray, out_hw: Tuple[int, int],
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Batched PROJECTIVE warp as two dense interpolation einsums — the
    homography generalization of :func:`warp_affine_mxu` (reference menu:
    imgaug PerspectiveTransform, common/image_aug.py:625; implemented
    here as MXU contractions instead of a per-pixel gather).

    ``matrices``: (N, 3, 3) FORWARD homographies mapping src → dst
    (affine inputs embed as homographies with a [0, 0, 1] bottom row and
    reproduce warp_affine_mxu). Bilinear, constant-0 border.

    Derivation: with the inverse map u = (a·x + b·y + c)/D,
    v = (d·x + e·y + f)/D, D = g·x + h·y + 1, pass 2's vertical sample
    position is v(x, y) directly; pass 1 needs the horizontal position
    at a given SOURCE row v and output column x, so solve v for y:
    y = (d·x + f − v·(g·x + 1)) / (v·h − e), then evaluate u there.
    Both grids are elementwise rational maps; the hat-weight matrices
    and einsums are identical to the affine warp. Same caveats: two-pass
    row approximation, degenerate when |v·h − e| → 0 (near-90° rotation
    combined with strong keystone) — augmentation-scale perspectives
    (corner jitter ≤ ~10%) are far from that.
    """
    inv = invert_homography(matrices)
    a, b, c = inv[:, 0, 0], inv[:, 0, 1], inv[:, 0, 2]
    d, e, f = inv[:, 1, 0], inv[:, 1, 1], inv[:, 1, 2]
    g, hh = inv[:, 2, 0], inv[:, 2, 1]
    n, h, w, _ = images.shape
    oh, ow = out_hw
    xg = jnp.arange(ow, dtype=jnp.float32)[None, None, :]
    yg = jnp.arange(oh, dtype=jnp.float32)[None, :, None]
    vg = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    ug = jnp.arange(w, dtype=jnp.float32)

    def _safe(x, eps=1e-6):
        return jnp.where(jnp.abs(x) < eps, jnp.where(x < 0, -eps, eps), x)

    # pass 1 (horizontal): on the (n, h, ow) grid of (source row v, x)
    a_, b_, c_ = a[:, None, None], b[:, None, None], c[:, None, None]
    d_, f_ = d[:, None, None], f[:, None, None]
    g_, h_ = g[:, None, None], hh[:, None, None]
    y_of_vx = (d_ * xg + f_ - vg * (g_ * xg + 1.0)) / _safe(
        vg * h_ - e[:, None, None])
    den = _safe(g_ * xg + h_ * y_of_vx + 1.0)
    p1 = (a_ * xg + b_ * y_of_vx + c_) / den  # (n, h, ow)
    w1 = jnp.maximum(0.0, 1.0 - jnp.abs(ug - p1[..., None]))  # (n, h, ow, w)

    # pass 2 (vertical): v(x, y) on the (n, oh, ow) output grid
    den2 = _safe(g_ * xg + h_ * yg + 1.0)
    p2 = (d_ * xg + e[:, None, None] * yg + f_) / den2  # (n, oh, ow)
    vfull = jnp.arange(h, dtype=jnp.float32)
    w2 = jnp.maximum(0.0, 1.0 - jnp.abs(vfull - p2[..., None]))  # (n,oh,ow,h)

    x = images.astype(dtype)
    tmp = jnp.einsum("nvxu,nvuc->nvxc", w1.astype(dtype), x,
                     preferred_element_type=jnp.float32).astype(dtype)
    return jnp.einsum("nyxv,nvxc->nyxc", w2.astype(dtype), tmp,
                      preferred_element_type=jnp.float32)


def five_from_68(landmarks68: jnp.ndarray) -> jnp.ndarray:
    """(…, 68, 2) iBUG landmarks → (…, 5, 2) ArcFace points: eye centers
    (mean of 36-41 / 42-47), nose tip (30), mouth corners (48, 54)."""
    lm = jnp.asarray(landmarks68)
    return jnp.stack(
        [
            lm[..., 36:42, :].mean(-2),
            lm[..., 42:48, :].mean(-2),
            lm[..., 30, :],
            lm[..., 48, :],
            lm[..., 54, :],
        ],
        axis=-2,
    )


# ---------------------------------------------------------------------------
# landmark-template alignment (the public "align" op)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("out_size", "mode"))
def align_faces(
    images: jnp.ndarray,
    landmarks: jnp.ndarray,
    out_size: int = 112,
    mode: str = "similarity",
    template: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Warp faces so that ``landmarks`` land on the canonical template.

    - ``mode="similarity"`` with (N, 5, 2) landmarks: ArcFace-style
      Umeyama alignment to :data:`ARCFACE_TEMPLATE_112` (scaled to
      ``out_size``).
    - ``mode="affine3"`` with (N, 3, 2) landmarks: exact 3-point affine to
      the MINMAX_TEMPLATE rows the reference uses
      (reference: api.py:132-145 create_thumbnail).
    """
    n = images.shape[0]
    if template is None:
        if mode == "similarity":
            template = jnp.asarray(ARCFACE_TEMPLATE_112) * (out_size / 112.0)
        else:
            tpl = jnp.asarray(MINMAX_TEMPLATE)[jnp.asarray(INNER_EYES_AND_BOTTOM_LIP)]
            template = tpl * out_size
    else:
        template = jnp.asarray(template)

    solver = umeyama_similarity if mode == "similarity" else affine_from_3pts
    mats = jax.vmap(lambda lm: solver(lm, template))(landmarks.astype(jnp.float32))
    return warp_affine(images, mats, (out_size, out_size))
