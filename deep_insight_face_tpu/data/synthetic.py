"""Procedural face world: parametric faces with analytic 68-pt landmarks.

The reference assumes external datasets (LFW folders, pre-trained
weights) that this environment cannot download, so quality has to be
demonstrated on data we can manufacture. This module renders a
parametric face — head, hair, brows, eyes, nose, lips, all driven by a
per-identity shape/color vector — under a randomized similarity pose,
lighting gradient and noise, and returns the iBUG-68 landmark layout
analytically (the landmarks ARE the geometry the features are drawn
from, so they are exact by construction).

One renderer feeds every trainable subsystem:

- ``landmark_dataset``   → (images, normalized 68×2) for LandmarkNet
  (replaces the reference's external ``face_landmark_detector`` dep,
  reference: api.py:17-25);
- ``identity_dataset``   → (images, labels) with stable per-identity
  appearance across pose/lighting, for ArcFace / triplet training;
- ``detection_scenes``   → cluttered scenes + gt boxes for the YOLO
  trainer (the reference never trains its detector at all);
- ``identity_directory`` → the same identities written as an LFW-style
  folder tree for the directory-driven CLI paths.

68-pt group convention matches api.LANDMARK_GROUPS (chin 0-17,
left/right brow 17-27, nose 27-36, eyes 36-48, lips 48-68).

Pure numpy, CPU-side (this is data generation, not the compute path);
~10⁴ px images render in a few ms each.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# identity parameters
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class FaceParams:
    """Shape + color parameters defining one identity (face-local units:
    the head fits roughly in [-1, 1]², y down)."""

    face_w: float  # head half-width
    face_h: float  # head half-height
    jaw_y0: float  # ear height where the jaw contour starts
    eye_dx: float  # eye center offset from midline
    eye_y: float  # eye row (negative = above center)
    eye_w: float
    eye_h: float
    iris_r: float
    brow_h: float  # brow lift above eye center
    brow_arc: float
    brow_thick: float
    nose_y: float  # nose tip row
    nose_w: float  # nostril half-spread
    mouth_y: float
    mouth_w: float
    lip_top: float
    lip_bot: float
    hairline: float  # hair cap lower boundary (negative y)
    skin: np.ndarray  # (3,) RGB in [0, 1]
    hair: np.ndarray
    iris: np.ndarray
    lip: np.ndarray
    brow: np.ndarray

    @staticmethod
    def from_seed(seed: int) -> "FaceParams":
        r = np.random.default_rng(np.uint64(seed) * np.uint64(2654435761) + 7)
        u = lambda lo, hi: float(r.uniform(lo, hi))
        skin_base = np.array([0.85, 0.66, 0.55])
        skin = np.clip(
            skin_base * r.uniform(0.55, 1.15) + r.normal(0, 0.03, 3), 0.05, 1.0
        )
        hair = np.clip(
            np.array([u(0.02, 0.55), u(0.02, 0.4), u(0.0, 0.3)]), 0.0, 1.0
        )
        iris = np.array(
            [[0.35, 0.22, 0.1], [0.25, 0.42, 0.6], [0.2, 0.4, 0.25],
             [0.45, 0.3, 0.15]][int(r.integers(0, 4))]
        ) * u(0.7, 1.3)
        return FaceParams(
            face_w=u(0.62, 0.8),
            face_h=u(0.85, 1.0),
            jaw_y0=u(-0.12, 0.05),
            eye_dx=u(0.26, 0.38),
            eye_y=u(-0.3, -0.12),
            eye_w=u(0.1, 0.16),
            eye_h=u(0.045, 0.075),
            iris_r=u(0.035, 0.055),
            brow_h=u(0.1, 0.17),
            brow_arc=u(0.0, 0.06),
            brow_thick=u(0.015, 0.035),
            nose_y=u(0.1, 0.24),
            nose_w=u(0.08, 0.14),
            mouth_y=u(0.42, 0.56),
            mouth_w=u(0.18, 0.3),
            lip_top=u(0.035, 0.06),
            lip_bot=u(0.05, 0.09),
            hairline=u(-0.75, -0.35),
            skin=skin,
            hair=hair,
            iris=np.clip(iris, 0.0, 1.0),
            lip=np.clip(np.array([u(0.5, 0.8), u(0.15, 0.35), u(0.2, 0.4)]), 0, 1),
            brow=np.clip(hair * u(0.7, 1.1), 0.0, 1.0),
        )


# ---------------------------------------------------------------------------
# analytic 68-point layout (face-local coordinates)
# ---------------------------------------------------------------------------


def landmarks_local(p: FaceParams) -> np.ndarray:
    """(68, 2) landmark layout in face-local coordinates, iBUG order."""
    pts = np.zeros((68, 2), np.float64)

    # 0-16 jaw: half-ellipse from left ear through chin to right ear
    th = np.linspace(0.0, np.pi, 17)
    pts[0:17, 0] = -p.face_w * np.cos(th)
    pts[0:17, 1] = p.jaw_y0 + (p.face_h * 0.97 - p.jaw_y0) * np.sin(th) ** 0.85

    def brow(cx):
        xs = cx + np.linspace(-1.15 * p.eye_w, 1.15 * p.eye_w, 5)
        ys = (
            p.eye_y
            - p.brow_h
            - p.brow_arc * (1.0 - ((xs - cx) / (1.15 * p.eye_w)) ** 2)
        )
        return np.stack([xs, ys], -1)

    pts[17:22] = brow(-p.eye_dx)  # left (image-left) brow
    pts[22:27] = brow(+p.eye_dx)  # right brow

    # 27-30 nose bridge, 31-35 nose base
    pts[27:31, 0] = 0.0
    pts[27:31, 1] = np.linspace(p.eye_y + 0.04, p.nose_y, 4)
    pts[31:36, 0] = np.linspace(-p.nose_w, p.nose_w, 5)
    pts[31:36, 1] = p.nose_y + 0.05

    def eye(cx):
        # 6 pts: outer corner, 2 top, inner corner, 2 bottom (ccw in
        # image coords), starting at the image-left corner
        ang = np.deg2rad([180.0, 120.0, 60.0, 0.0, -60.0, -120.0])
        return np.stack(
            [cx + p.eye_w * np.cos(ang), p.eye_y - p.eye_h * np.sin(ang)], -1
        )

    pts[36:42] = eye(-p.eye_dx)
    pts[42:48] = eye(+p.eye_dx)

    # 48-59 outer lip (12 pts, from image-left corner, ccw over the top)
    ang = np.deg2rad(np.array([180, 150, 120, 90, 60, 30, 0,
                               -40, -70, -90, -110, -140], np.float64))
    up = np.sin(ang) > 0
    ry = np.where(up, p.lip_top, p.lip_bot)
    pts[48:60, 0] = p.mouth_w * np.cos(ang)
    pts[48:60, 1] = p.mouth_y - ry * np.sin(ang)
    # cupid's bow dip at the top-center point
    pts[51, 1] += 0.012
    # 60-67 inner lip (8 pts)
    ang_i = np.deg2rad(np.array([180, 135, 90, 45, 0, -60, -90, -120],
                                np.float64))
    up_i = np.sin(ang_i) > 0
    ry_i = np.where(up_i, p.lip_top * 0.35, p.lip_bot * 0.35)
    pts[60:68, 0] = 0.8 * p.mouth_w * np.cos(ang_i)
    pts[60:68, 1] = p.mouth_y - ry_i * np.sin(ang_i)
    return pts


#: 68 → 5 reduction (left eye, right eye, nose tip, mouth corners) used
#: for ArcFace-style similarity alignment.
FIVE_POINT_INDICES = {
    "left_eye": list(range(36, 42)),
    "right_eye": list(range(42, 48)),
    "nose": [30],
    "mouth_left": [48],
    "mouth_right": [54],
}


def to_five_points(landmarks68: np.ndarray) -> np.ndarray:
    """(…, 68, 2) → (…, 5, 2): eye centers, nose tip, mouth corners."""
    lm = np.asarray(landmarks68)
    return np.stack(
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
# renderer
# ---------------------------------------------------------------------------


def _ellipse_mask(xs, ys, cx, cy, rx, ry, feather):
    d = np.sqrt(((xs - cx) / rx) ** 2 + ((ys - cy) / ry) ** 2)
    return np.clip((1.0 - d) / feather + 0.5, 0.0, 1.0)


def _capsule_mask(xs, ys, pts, thick, feather):
    """Soft mask of a polyline with round caps."""
    best = np.full(xs.shape, 1e9)
    for i in range(len(pts) - 1):
        a, b = pts[i], pts[i + 1]
        ab = b - a
        denom = float(ab @ ab) + 1e-12
        t = np.clip(((xs - a[0]) * ab[0] + (ys - a[1]) * ab[1]) / denom, 0, 1)
        dx = xs - (a[0] + t * ab[0])
        dy = ys - (a[1] + t * ab[1])
        best = np.minimum(best, dx * dx + dy * dy)
    return np.clip((thick - np.sqrt(best)) / feather + 0.5, 0.0, 1.0)


def render_face(
    params: FaceParams,
    size: int,
    rng: np.random.Generator,
    rotation: Optional[float] = None,
    scale: Optional[float] = None,
    center: Optional[Tuple[float, float]] = None,
    background: Optional[np.ndarray] = None,
    return_alpha: bool = False,
):
    """Render one face; returns (image uint8 (S,S,3), landmarks (68,2) px).

    ``rotation`` radians (default ±0.3 random), ``scale`` = face radius in
    pixels (default ~0.42·size), ``center`` pixel coords. With
    ``return_alpha`` also returns the head+hair alpha mask (S, S) for
    compositing into scenes.
    """
    s = size
    if rotation is None:
        rotation = float(rng.uniform(-0.3, 0.3))
    if scale is None:
        scale = float(rng.uniform(0.36, 0.46)) * s
    if center is None:
        center = (
            s / 2 + float(rng.uniform(-0.05, 0.05)) * s,
            s / 2 + float(rng.uniform(-0.05, 0.05)) * s,
        )

    yy, xx = np.meshgrid(np.arange(s, dtype=np.float64),
                         np.arange(s, dtype=np.float64), indexing="ij")
    # inverse pose: pixel → face-local
    ca, sa = np.cos(rotation), np.sin(rotation)
    fx = ((xx - center[0]) * ca + (yy - center[1]) * sa) / scale
    fy = (-(xx - center[0]) * sa + (yy - center[1]) * ca) / scale
    feather = 1.5 / scale

    p = params
    if background is None:
        bg = np.clip(
            rng.uniform(0.1, 0.9, 3)[None, None]
            + rng.normal(0, 0.04, (s, s, 1)), 0, 1,
        )
    else:
        bg = background.astype(np.float64)
    img = bg.copy()

    def paint(mask, color):
        img[...] = img * (1 - mask[..., None]) + np.asarray(color)[None, None] * mask[..., None]

    # head
    head = _ellipse_mask(fx, fy, 0, 0, p.face_w, p.face_h, feather)
    # cheap shading: light from a random direction in face space
    lx, ly = rng.uniform(-1, 1), rng.uniform(-1, 0.2)
    norm = np.hypot(lx, ly) + 1e-6
    shade = 1.0 + 0.18 * (fx * lx / norm + fy * ly / norm)
    skin = np.clip(p.skin[None, None] * shade[..., None], 0, 1)
    img = img * (1 - head[..., None]) + skin * head[..., None]

    # hair cap: head region above the hairline + a thin outer rim
    hair_zone = _ellipse_mask(fx, fy, 0, -0.08, p.face_w * 1.08, p.face_h * 1.05,
                              feather)
    hairline = np.clip((p.hairline - fy) / (8 * feather) + 0.5, 0, 1)
    paint(hair_zone * hairline, p.hair)

    # brows
    lm = landmarks_local(p)
    for sl in (slice(17, 22), slice(22, 27)):
        paint(_capsule_mask(fx, fy, lm[sl], p.brow_thick, feather), p.brow)

    # eyes: sclera, iris, pupil
    for sign in (-1, 1):
        cx = sign * p.eye_dx
        paint(_ellipse_mask(fx, fy, cx, p.eye_y, p.eye_w, p.eye_h, feather),
              (0.95, 0.95, 0.94))
        paint(_ellipse_mask(fx, fy, cx, p.eye_y, p.iris_r, p.iris_r, feather),
              p.iris)
        paint(_ellipse_mask(fx, fy, cx, p.eye_y, p.iris_r * 0.45,
                            p.iris_r * 0.45, feather), (0.03, 0.03, 0.03))

    # nose: bridge shadow + nostrils
    bridge = _capsule_mask(fx, fy, lm[27:31], 0.02, feather)
    img *= 1.0 - 0.25 * bridge[..., None]
    for sign in (-1, 1):
        paint(_ellipse_mask(fx, fy, sign * p.nose_w * 0.7, p.nose_y + 0.045,
                            0.022, 0.016, feather), p.skin * 0.45)

    # lips: outer ellipse-ish (two half heights), inner mouth line
    up = _ellipse_mask(fx, fy, 0, p.mouth_y, p.mouth_w, p.lip_top, feather) * (
        fy <= p.mouth_y
    )
    dn = _ellipse_mask(fx, fy, 0, p.mouth_y, p.mouth_w, p.lip_bot, feather) * (
        fy > p.mouth_y
    )
    paint(np.clip(up + dn, 0, 1), p.lip)
    mouth_line = _capsule_mask(
        fx, fy, np.array([[-p.mouth_w * 0.85, p.mouth_y],
                          [p.mouth_w * 0.85, p.mouth_y]]), 0.008, feather
    )
    paint(mouth_line, p.lip * 0.4)

    # global lighting gradient + sensor noise
    gdir = rng.uniform(-1, 1, 2)
    g = (xx / s - 0.5) * gdir[0] + (yy / s - 0.5) * gdir[1]
    img = np.clip(img * (1.0 + 0.15 * g[..., None]), 0, 1)
    img = np.clip(img + rng.normal(0, 0.015, img.shape), 0, 1)

    # forward-transform landmarks to pixel coords
    px = center[0] + scale * (lm[:, 0] * ca - lm[:, 1] * sa)
    py = center[1] + scale * (lm[:, 0] * sa + lm[:, 1] * ca)
    landmarks = np.stack([px, py], -1).astype(np.float32)
    out = (img * 255).astype(np.uint8)
    if return_alpha:
        alpha = np.clip(head + hair_zone * hairline, 0, 1)
        return out, landmarks, alpha
    return out, landmarks


# ---------------------------------------------------------------------------
# dataset builders
# ---------------------------------------------------------------------------


def landmark_dataset(
    n: int, size: int = 112, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """(images uint8 (N,S,S,3), landmarks float32 (N,68,2) normalized to
    [0,1]) — randomized identity per sample, full pose/lighting jitter."""
    rng = np.random.default_rng(seed)
    imgs = np.empty((n, size, size, 3), np.uint8)
    lms = np.empty((n, 68, 2), np.float32)
    for i in range(n):
        p = FaceParams.from_seed(int(rng.integers(0, 2**31)))
        img, lm = render_face(p, size, rng)
        imgs[i] = img
        lms[i] = lm / size
    return imgs, lms


def landmark_crop_dataset(
    n: int, size: int = 112, seed: int = 0,
    rotation_range: Optional[float] = None, occlude: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Landmark samples with SERVING crop geometry: the face is rendered
    in a larger frame, cropped at its (jittered-margin) landmark bounding
    box — exactly what api.raw_landmarks / the fused pipeline feed the
    LandmarkNet — and landmarks are normalized to the crop.

    ``rotation_range`` (radians) widens in-plane pose beyond render_face's
    ±0.3 default; ``occlude`` is the probability of painting one opaque
    flat-color rectangle over part of the face (the same occluder family
    the hard e2e protocol uses, _render_identity_scene). Supervision stays
    AMODAL — the labels are the true landmark positions behind the
    occluder — which is exactly what alignment robustness needs: the
    LandmarkNet must keep placing the eyes/nose template points even when
    they are hidden. Defaults reproduce the historical stream bit-exactly
    (no extra draws are made unless a knob is enabled).

    Returns (images uint8 (N,S,S,3), landmarks float32 (N,68,2) in
    crop-normalized [0,1])."""
    from PIL import Image

    rng = np.random.default_rng(seed + 47)
    frame = int(size * 1.6)
    imgs = np.empty((n, size, size, 3), np.uint8)
    lms = np.empty((n, 68, 2), np.float32)
    for i in range(n):
        p = FaceParams.from_seed(int(rng.integers(0, 2**31)))
        rotation = (
            float(rng.uniform(-rotation_range, rotation_range))
            if rotation_range is not None else None
        )
        img, lm = render_face(
            p, frame, rng,
            rotation=rotation,
            scale=float(rng.uniform(0.3, 0.42)) * frame,
            center=(frame / 2 + float(rng.uniform(-0.08, 0.08)) * frame,
                    frame / 2 + float(rng.uniform(-0.08, 0.08)) * frame),
        )
        if occlude > 0.0 and rng.random() < occlude:
            fx1, fy1 = lm.min(0)
            fx2, fy2 = lm.max(0)
            fcx, fcy = (fx1 + fx2) / 2, (fy1 + fy2) / 2
            radius = max(fx2 - fx1, fy2 - fy1) / 2
            ocx = fcx + float(rng.uniform(-0.5, 0.5)) * radius
            ocy = fcy + float(rng.uniform(-0.5, 0.5)) * radius
            orx, ory = rng.uniform(0.15, 0.35, 2) * radius
            yy, xx = np.mgrid[0:frame, 0:frame]
            m = (np.abs(xx - ocx) < orx) & (np.abs(yy - ocy) < ory)
            img = img.copy()
            img[m] = (rng.uniform(0, 1, 3) * 255).astype(np.uint8)
        x1, y1 = lm.min(0)
        x2, y2 = lm.max(0)
        # detector boxes carry a margin; jitter it so the net tolerates
        # loose and tight crops plus a little off-center error
        mx = (x2 - x1) * float(rng.uniform(0.02, 0.22))
        my = (y2 - y1) * float(rng.uniform(0.02, 0.22))
        jx = (x2 - x1) * float(rng.uniform(-0.04, 0.04))
        jy = (y2 - y1) * float(rng.uniform(-0.04, 0.04))
        cx1 = max(x1 - mx + jx, 0.0)
        cy1 = max(y1 - my + jy, 0.0)
        cx2 = min(x2 + mx + jx, frame)
        cy2 = min(y2 + my + jy, frame)
        crop = Image.fromarray(
            img[int(cy1) : int(cy2), int(cx1) : int(cx2)]
        ).resize((size, size), Image.BILINEAR)
        imgs[i] = np.asarray(crop)
        lms[i, :, 0] = (lm[:, 0] - int(cx1)) / (int(cx2) - int(cx1))
        lms[i, :, 1] = (lm[:, 1] - int(cy1)) / (int(cy2) - int(cy1))
    return imgs, lms


def identity_dataset(
    n_ids: int,
    per_id: int,
    size: int = 112,
    seed: int = 0,
    id_offset: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """(images (N,S,S,3) uint8, labels (N,) int32): ``per_id`` renders of
    each identity under varying pose/lighting/noise. Identity appearance
    is a pure function of (seed-space id) so disjoint splits share
    nothing."""
    rng = np.random.default_rng(seed + 991)
    n = n_ids * per_id
    imgs = np.empty((n, size, size, 3), np.uint8)
    labels = np.empty((n,), np.int32)
    k = 0
    for cid in range(n_ids):
        p = FaceParams.from_seed(id_offset + cid)
        for _ in range(per_id):
            imgs[k], _ = render_face(p, size, rng)
            labels[k] = cid
            k += 1
    return imgs, labels


def identity_directory(
    root: str, n_ids: int, per_id: int, size: int = 112, seed: int = 0
) -> List[str]:
    """Write identity_dataset as an LFW-style folder tree
    (root/person_XXXX/person_XXXX_NNNN.jpg); returns class dirs."""
    from PIL import Image

    imgs, labels = identity_dataset(n_ids, per_id, size, seed)
    dirs = []
    for cid in range(n_ids):
        d = os.path.join(root, f"person_{cid:04d}")
        os.makedirs(d, exist_ok=True)
        dirs.append(d)
    counters = [0] * n_ids
    for img, cid in zip(imgs, labels):
        counters[cid] += 1
        Image.fromarray(img).save(
            os.path.join(root, f"person_{cid:04d}",
                         f"person_{cid:04d}_{counters[cid]:04d}.jpg")
        )
    return dirs


def _pool_map(fn, work, workers):
    """Map ``fn`` over ``work`` on a spawn-context process pool, or
    return None when a pool cannot run (interactive ``<stdin>`` main
    module — spawn re-imports the main module and there is nothing to
    import; callers then fall back to the SAME per-item seeded values on
    a sequential schedule). Spawn, not fork: the caller has usually
    initialized JAX (multithreaded) by render time and a forked child
    can deadlock on inherited locks."""
    import multiprocessing
    import sys

    if multiprocessing.parent_process() is not None:
        # already inside a worker (e.g. spawn re-executed an unguarded
        # caller script): never nest pools
        return None
    main = sys.modules.get("__main__")
    main_file = getattr(main, "__file__", None)
    if main_file is None or not os.path.exists(main_file):
        return None
    from concurrent.futures import ProcessPoolExecutor

    with ProcessPoolExecutor(
        max_workers=workers,
        mp_context=multiprocessing.get_context("spawn"),
    ) as ex:
        return list(
            ex.map(fn, work, chunksize=max(1, len(work) // (workers * 8)))
        )


def _render_detection_scene(rng, size, max_faces, min_face, max_face,
                            faceless_frac=0.0, rotation_range=0.25,
                            occlude=0.0):
    """One cluttered scene; draws from ``rng`` in a fixed order.

    ``faceless_frac``: probability the scene contains NO face (pure
    clutter) — hard negatives that teach the objectness head that
    distractor shapes alone are background. When 0 (default) no coin is
    drawn, keeping the stream bit-identical to earlier releases.

    ``rotation_range`` (radians) widens in-plane pose; ``occlude`` is
    the per-face probability of painting an opaque flat rectangle over
    part of the face AFTER compositing — the hard e2e protocol's
    occlusion style (scripts/e2e_quality.py --hard draws the same
    rectangle family via _render_identity_scene). Defaults reproduce
    the historical stream exactly: rotation_range=0.25 draws the same
    uniform, and the occlusion coin is only tossed when occlude > 0."""
    boxes = np.zeros((max_faces, 4), np.float32)
    valid = np.zeros((max_faces,), bool)
    bg = np.clip(
        rng.uniform(0.05, 0.95, 3)[None, None]
        + rng.normal(0, 0.05, (size, size, 1)),
        0, 1,
    )
    # distractor rectangles / ellipses
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    for _ in range(int(rng.integers(2, 6))):
        cx, cy = rng.uniform(0, size, 2)
        rx, ry = rng.uniform(0.03, 0.2, 2) * size
        if rng.random() < 0.5:
            m = (((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2) < 1.0
        else:
            m = (np.abs(xx - cx) < rx) & (np.abs(yy - cy) < ry)
        bg[m] = np.clip(rng.uniform(0, 1, 3) + rng.normal(0, 0.02), 0, 1)

    canvas = bg
    if faceless_frac > 0.0 and rng.random() < faceless_frac:
        k = 0
        # Faceless negatives come in three families; the procedural
        # clutter above is the third (fall-through). Scene rngs are
        # per-index (_detection_scene_seeded), so the extra draws here
        # do not perturb other scenes.
        # 1. "Stark" scenes: a flat (often near-black) background with
        #    un-textured solid rectangles — lens-cap / test-card style
        #    frames. A detector trained only on textured clutter fired
        #    0.68 confidence on a flat rectangle over black
        #    (tests/test_pipeline.py::test_faceless_frames_report_no_face).
        # 2. Noise frames: per-pixel noise at a random spatial scale,
        #    from full-bandwidth white noise to coarse blocky noise
        #    (upsampled low-res noise carries face-scale blobs). The
        #    occluder-hardened tiny_mx fired 0.22 on uniform white
        #    noise — pure noise sat outside both earlier families.
        style = rng.random()
        if style < 1.0 / 3.0:
            base = (rng.uniform(0.0, 0.08, 3) if rng.random() < 0.5
                    else rng.uniform(0.0, 1.0, 3))
            canvas = np.broadcast_to(
                base[None, None], (size, size, 3)).copy()
            for _ in range(int(rng.integers(0, 9))):
                cx, cy = rng.uniform(0, size, 2)
                rx, ry = rng.uniform(0.02, 0.15, 2) * size
                m = (np.abs(xx - cx) < rx) & (np.abs(yy - cy) < ry)
                canvas[m] = rng.uniform(0, 1, 3)
        elif style < 2.0 / 3.0:
            cell = int(2 ** rng.integers(0, 6))  # 1..32 px blocks
            n = -(-size // cell)
            low = rng.uniform(0.0, 1.0, (n, n, 3))
            noise_img = np.repeat(
                np.repeat(low, cell, axis=0), cell, axis=1)[:size, :size]
            amp = float(rng.uniform(0.4, 1.0))
            canvas = np.clip(
                noise_img * amp
                + (1.0 - amp) * rng.uniform(0.0, 1.0, 3)[None, None]
                + rng.normal(0, rng.uniform(0.0, 0.1), (size, size, 1)),
                0, 1,
            )
    else:
        k = int(rng.integers(1, max_faces + 1))
    placed = []
    for f in range(k):
        radius = float(rng.uniform(min_face, max_face)) * size / 2 * 2
        # rejection-sample a center that does not overlap placed faces
        for _ in range(20):
            cx = float(rng.uniform(radius * 0.7, size - radius * 0.7))
            cy = float(rng.uniform(radius * 0.7, size - radius * 0.7))
            if all(
                np.hypot(cx - q[0], cy - q[1]) > 0.8 * (radius + q[2])
                for q in placed
            ):
                break
        else:
            continue
        placed.append((cx, cy, radius))
        p = FaceParams.from_seed(int(rng.integers(0, 2**31)))
        face, lm, alpha = render_face(
            p, size, rng,
            rotation=float(rng.uniform(-rotation_range, rotation_range)),
            scale=radius / 2,
            center=(cx, cy),
            background=canvas,
            return_alpha=True,
        )
        canvas = canvas * (1 - alpha[..., None]) + (
            face.astype(np.float64) / 255.0
        ) * alpha[..., None]
        if occlude > 0.0 and rng.random() < occlude:
            # same occluder family as _render_identity_scene: an opaque
            # flat rectangle over part of the face (the box label stays
            # the FULL face extent — amodal supervision teaches the
            # detector to fire on partially hidden faces)
            ocx = cx + float(rng.uniform(-0.5, 0.5)) * radius
            ocy = cy + float(rng.uniform(-0.5, 0.5)) * radius
            orx, ory = rng.uniform(0.15, 0.35, 2) * radius
            m = (np.abs(xx - ocx) < orx) & (np.abs(yy - ocy) < ory)
            canvas[m] = rng.uniform(0, 1, 3)
        x1, y1 = lm.min(0)
        x2, y2 = lm.max(0)
        mx, my = 0.08 * (x2 - x1), 0.08 * (y2 - y1)
        boxes[f] = [
            max(x1 - mx, 0), max(y1 - my, 0),
            min(x2 + mx, size), min(y2 + my, size),
        ]
        valid[f] = True
    img = (np.clip(canvas, 0, 1) * 255).astype(np.uint8)
    return img, boxes, valid


def _detection_scene_seeded(args):
    (i, seed, size, max_faces, min_face, max_face, faceless_frac,
     rotation_range, occlude) = args
    rng = np.random.default_rng(np.random.SeedSequence([seed + 313, i]))
    return _render_detection_scene(rng, size, max_faces, min_face, max_face,
                                   faceless_frac, rotation_range, occlude)


def detection_scenes(
    n: int,
    size: int = 416,
    max_faces: int = 3,
    seed: int = 0,
    min_face: float = 0.15,
    max_face: float = 0.45,
    workers: int = 0,
    faceless_frac: float = 0.0,
    rotation_range: float = 0.25,
    occlude: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Cluttered scenes with 1..max_faces composited faces.

    ``faceless_frac > 0`` makes that fraction of scenes (in expectation)
    pure clutter with zero faces — hard negatives for objectness
    training. ``rotation_range``/``occlude`` widen in-plane pose and add
    per-face opaque-rectangle occlusion (the hard protocol's stress
    axes — see _render_detection_scene). Defaults keep both random
    streams bit-identical to earlier releases.

    Returns (images uint8 (N,S,S,3), boxes float32 (N,max_faces,4)
    x1y1x2y2 px, valid bool (N,max_faces)). Boxes are the tight landmark
    bounding box expanded 8% (the trainable definition of "face").
    Background contains distractor shapes so the detector must learn
    face structure, not brightness.

    ``workers > 0`` renders scenes on a process pool with DETERMINISTIC
    per-scene seeding (values depend only on (seed, scene index), not on
    the worker count) — the single-threaded render is the wall-clock
    bottleneck of every training script. The ``workers=0`` sequential
    path keeps the original shared-stream draws bit-identical to earlier
    releases; the two streams differ, so committed eval artifacts pin
    one or the other.
    """
    imgs = np.empty((n, size, size, 3), np.uint8)
    boxes = np.zeros((n, max_faces, 4), np.float32)
    valid = np.zeros((n, max_faces), bool)
    if workers > 0:
        work = [(i, seed, size, max_faces, min_face, max_face, faceless_frac,
                 rotation_range, occlude)
                for i in range(n)]
        done = _pool_map(_detection_scene_seeded, work, workers)
        if done is not None:
            for i, (img, b, v) in enumerate(done):
                imgs[i], boxes[i], valid[i] = img, b, v
            return imgs, boxes, valid
        # pool unavailable (interactive main module) → same values,
        # sequential schedule
        for i, args in enumerate(work):
            imgs[i], boxes[i], valid[i] = _detection_scene_seeded(args)
        return imgs, boxes, valid
    rng = np.random.default_rng(seed + 313)
    for i in range(n):
        imgs[i], boxes[i], valid[i] = _render_detection_scene(
            rng, size, max_faces, min_face, max_face, faceless_frac,
            rotation_range, occlude,
        )
    return imgs, boxes, valid


def _render_identity_scene(rng, p, size, min_face, max_face,
                           rotation_range=0.25, occlude=0.0):
    """One cluttered scene of identity ``p``; draws from ``rng`` in a
    fixed order.

    ``rotation_range`` (radians) widens in-plane pose; ``occlude`` is
    the probability of painting an opaque flat rectangle over part of
    the face AFTER compositing (sunglasses/hand/pole-style occlusion).
    Defaults draw exactly the historical stream — the occlusion coin is
    only tossed when ``occlude > 0`` — so committed eval artifacts stay
    pinned; the hard knobs exist because the standard protocol
    saturated at 1.0 (STATUS round 4)."""
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    bg = np.clip(
        rng.uniform(0.05, 0.95, 3)[None, None]
        + rng.normal(0, 0.05, (size, size, 1)),
        0, 1,
    )
    for _ in range(int(rng.integers(2, 6))):
        cx, cy = rng.uniform(0, size, 2)
        rx, ry = rng.uniform(0.03, 0.2, 2) * size
        if rng.random() < 0.5:
            m = (((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2) < 1.0
        else:
            m = (np.abs(xx - cx) < rx) & (np.abs(yy - cy) < ry)
        bg[m] = np.clip(
            rng.uniform(0, 1, 3) + rng.normal(0, 0.02), 0, 1
        )
    radius = float(rng.uniform(min_face, max_face)) * size / 2 * 2
    cx = float(rng.uniform(radius * 0.7, size - radius * 0.7))
    cy = float(rng.uniform(radius * 0.7, size - radius * 0.7))
    face, lm, alpha = render_face(
        p, size, rng,
        rotation=float(rng.uniform(-rotation_range, rotation_range)),
        scale=radius / 2,
        center=(cx, cy),
        background=bg,
        return_alpha=True,
    )
    canvas = bg * (1 - alpha[..., None]) + (
        face.astype(np.float64) / 255.0
    ) * alpha[..., None]
    if occlude > 0.0 and rng.random() < occlude:
        ocx = cx + float(rng.uniform(-0.5, 0.5)) * radius
        ocy = cy + float(rng.uniform(-0.5, 0.5)) * radius
        orx, ory = rng.uniform(0.15, 0.35, 2) * radius
        m = (np.abs(xx - ocx) < orx) & (np.abs(yy - ocy) < ory)
        canvas[m] = rng.uniform(0, 1, 3)
    return (np.clip(canvas, 0, 1) * 255).astype(np.uint8)


def _identity_scene_seeded(args):
    (k, seed, cid, id_offset, size, min_face, max_face,
     rotation_range, occlude) = args
    rng = np.random.default_rng(np.random.SeedSequence([seed + 727, k]))
    p = FaceParams.from_seed(id_offset + cid)
    return _render_identity_scene(rng, p, size, min_face, max_face,
                                  rotation_range, occlude)


def identity_scenes(
    n_ids: int,
    per_id: int,
    size: int = 416,
    seed: int = 0,
    id_offset: int = 0,
    min_face: float = 0.25,
    max_face: float = 0.45,
    workers: int = 0,
    rotation_range: float = 0.25,
    occlude: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Full scenes each containing ONE face of a KNOWN identity — the
    end-to-end quality probe: raw frame in, identity out, so a
    detect → landmark-align → embed pipeline can be scored on
    verification accuracy with no stage short-circuited.

    Returns (images uint8 (n_ids·per_id, S, S, 3), labels int32). Same
    distractor-cluttered backgrounds as :func:`detection_scenes`; face
    pose/scale/position vary per render while identity appearance is the
    pure function of (id_offset + label).

    ``workers > 0`` renders on a process pool with deterministic
    per-scene seeding (values independent of the worker count); the
    sequential ``workers=0`` path keeps the original shared-stream draws
    bit-identical to earlier releases. The two streams differ —
    committed eval artifacts (e2e_quality.json, weight sidecars) pin the
    stream they were measured with.
    """
    n = n_ids * per_id
    imgs = np.empty((n, size, size, 3), np.uint8)
    labels = np.repeat(np.arange(n_ids, dtype=np.int32), per_id)
    if workers > 0:
        work = [(k, seed, int(labels[k]), id_offset, size, min_face,
                 max_face, rotation_range, occlude) for k in range(n)]
        done = _pool_map(_identity_scene_seeded, work, workers)
        if done is not None:
            for k, img in enumerate(done):
                imgs[k] = img
        else:  # pool unavailable → same values, sequential schedule
            for k, args in enumerate(work):
                imgs[k] = _identity_scene_seeded(args)
        return imgs, labels
    rng = np.random.default_rng(seed + 727)
    k = 0
    for cid in range(n_ids):
        p = FaceParams.from_seed(id_offset + cid)
        for _ in range(per_id):
            imgs[k] = _render_identity_scene(rng, p, size, min_face,
                                             max_face, rotation_range,
                                             occlude)
            k += 1
    return imgs, labels


def pipeline_emitted_dataset(
    n_ids: int,
    per_id: int,
    size: int = 112,
    seed: int = 0,
    id_offset: int = 0,
    scene_size: int = 416,
    batch: int = 32,
    min_face: float = 0.25,
    max_face: float = 0.45,
    detector_variant: str = "tiny_mx",  # the serving default (config.py)
    detector_input: "Optional[int]" = None,  # None → DetectorConfig default (416)
    workers: int = 0,  # scene-render process pool (identity_scenes)
    scenes: "Optional[Tuple[np.ndarray, np.ndarray]]" = None,
    rotation_range: float = 0.25,  # hard-protocol stress axes — crops
    occlude: float = 0.0,          # harvested from hard scenes carry the
                                   # REAL occluder/pose jitter through
                                   # detector+landmark+align
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Aligned face crops emitted by the REAL serving pipeline (shipped
    detector → Pallas NMS → LandmarkNet → similarity align) over rendered
    identity scenes — the exact distribution the embedder sees at serving
    time, detector box jitter included.

    ``aligned_identity_dataset`` approximates serving geometry with
    analytic landmarks + noise; this closes the last distribution shift
    by harvesting through :func:`pipeline.build_align_pipeline` itself.
    Scenes whose face the detector misses are dropped (their crop would
    be background). Pass ``scenes=(imgs, labels)`` to reuse pre-rendered
    scenes. Returns (crops uint8 (M, size, size, 3), labels (M,) int32,
    detection_rate).
    """
    import dataclasses

    import jax.numpy as jnp

    from deep_insight_face_tpu.config import default_config
    from deep_insight_face_tpu.models.landmark import LandmarkNet
    from deep_insight_face_tpu.pipeline import (
        build_align_pipeline,
        make_detector_model,
    )
    from deep_insight_face_tpu.utils import pretrained

    cfg = default_config()
    det_kw = dict(variant=detector_variant)
    if detector_input is not None:
        # harvest in the exact serving-tier geometry (e.g. 320-input
        # detector over natively-320 scenes — STATUS r4 tier finding)
        det_kw["input_size"] = detector_input
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, image_size=size),
        detector=dataclasses.replace(cfg.detector, **det_kw),
    )
    dv = pretrained.load_detector_variables(
        detector_variant, cfg.detector.input_size
    )
    lv = pretrained.load_landmark_variables()
    if dv is None or lv is None:
        raise RuntimeError(
            "pipeline_emitted_dataset needs the shipped detector and "
            "landmark weights (scripts/train_detector_weights.py, "
            "scripts/train_landmark_weights.py)"
        )
    dm, _ = make_detector_model(cfg.detector)
    align = build_align_pipeline(cfg, dm, landmark_model=LandmarkNet())

    if scenes is None:
        imgs, labels = identity_scenes(
            n_ids, per_id, size=scene_size, seed=seed, id_offset=id_offset,
            min_face=min_face, max_face=max_face, workers=workers,
            rotation_range=rotation_range, occlude=occlude,
        )
    else:
        imgs, labels = scenes
    from deep_insight_face_tpu.utils.batching import batched_apply

    def run(chunk):
        out = align(dv, lv, jnp.asarray(chunk))
        c = np.clip(np.asarray(out.crops), 0, 255).astype(np.uint8)
        return c, np.asarray(out.found)

    crops, found = batched_apply(run, imgs, batch)
    return crops[found], labels[found], float(found.mean())


def aligned_identity_dataset(
    n_ids: int,
    per_id: int,
    size: int = 112,
    seed: int = 0,
    id_offset: int = 0,
    five_noise_px: float = 2.5,
    clutter: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Identity renders in SERVING geometry: each face is rendered with
    pose/scale/position jitter in a larger frame (over detection-scene
    style clutter), then similarity-warped so its (analytic) 5 points —
    perturbed by ``five_noise_px`` of landmark noise at 112-scale,
    matching LandmarkNet's measured error (NME 0.016 ≈ 1.8 px) — land on
    the ArcFace template: the exact distribution the fused pipeline's
    landmark-align stage produces, including its alignment jitter.
    Train-like-you-serve: an embedder trained on these crops sees no
    geometry or context shift behind the detector+LandmarkNet at
    serving time.

    Returns (images uint8 (n_ids·per_id, size, size, 3), labels int32).
    """
    import jax
    import jax.numpy as jnp

    from deep_insight_face_tpu.ops.align import (
        ARCFACE_TEMPLATE_112, umeyama_similarity, warp_affine,
    )

    rng = np.random.default_rng(seed + 1543)
    frame = int(size * 1.6)
    n = n_ids * per_id
    frames = np.empty((n, frame, frame, 3), np.uint8)
    fives = np.empty((n, 5, 2), np.float32)
    labels = np.empty((n,), np.int32)
    yy, xx = np.meshgrid(np.arange(frame), np.arange(frame), indexing="ij")
    k = 0
    for cid in range(n_ids):
        p = FaceParams.from_seed(id_offset + cid)
        for _ in range(per_id):
            bg = None
            if clutter:
                bg = np.clip(
                    rng.uniform(0.05, 0.95, 3)[None, None]
                    + rng.normal(0, 0.05, (frame, frame, 1)), 0, 1,
                )
                for _ in range(int(rng.integers(2, 5))):
                    cx, cy = rng.uniform(0, frame, 2)
                    rx, ry = rng.uniform(0.05, 0.3, 2) * frame
                    if rng.random() < 0.5:
                        m = (((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2) < 1.0
                    else:
                        m = (np.abs(xx - cx) < rx) & (np.abs(yy - cy) < ry)
                    bg[m] = np.clip(
                        rng.uniform(0, 1, 3) + rng.normal(0, 0.02), 0, 1
                    )
            img, lm = render_face(
                p, frame, rng,
                scale=float(rng.uniform(0.30, 0.44)) * frame,
                center=(
                    frame / 2 + float(rng.uniform(-0.08, 0.08)) * frame,
                    frame / 2 + float(rng.uniform(-0.08, 0.08)) * frame,
                ),
                background=bg,
            )
            frames[k] = img
            five = to_five_points(lm)
            # serving-time landmark error, scaled to this frame
            five += rng.normal(0, five_noise_px * frame / 112.0 / 1.6,
                               five.shape)
            fives[k] = five
            labels[k] = cid
            k += 1

    tpl = np.asarray(ARCFACE_TEMPLATE_112, np.float32) * (size / 112.0)
    out = np.empty((n, size, size, 3), np.uint8)
    warp = jax.jit(lambda im, m: warp_affine(im, m, (size, size)))
    mats_fn = jax.jit(jax.vmap(lambda f: umeyama_similarity(f, jnp.asarray(tpl))))
    for s in range(0, n, 256):
        m = mats_fn(jnp.asarray(fives[s:s + 256]))
        crops = warp(jnp.asarray(frames[s:s + 256]).astype(jnp.float32), m)
        out[s:s + 256] = np.clip(np.asarray(crops), 0, 255).astype(np.uint8)
    return out, labels
