"""Detector evaluation + drawing utilities.

Working equivalents of the reference's detector toolbox
(reference: deep_insight_face/detector/utility.py:147-334): mAP/AP
computation, precision-recall overlap matching, and box drawing — the
numerics vectorized (the reference loops per-box in Python).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def bbox_iou_numpy(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N, M) IoU between (x1, y1, x2, y2) boxes (numpy;
    the device version lives in ops.nms.iou_matrix)."""
    a = np.atleast_2d(a).astype(np.float64)
    b = np.atleast_2d(b).astype(np.float64)
    area_a = np.maximum(a[:, 2] - a[:, 0], 0) * np.maximum(a[:, 3] - a[:, 1], 0)
    area_b = np.maximum(b[:, 2] - b[:, 0], 0) * np.maximum(b[:, 3] - b[:, 1], 0)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-12)


def two_tier_quality(boxes, scores, valid, image_hw, decision_threshold,
                     xp=np):
    """Quality vector for the serving two-threshold best-face selection —
    the ONE source of truth shared by the fused pipeline
    (pipeline._select_best_box) and the per-image API
    (runner.FaceDetector._best_gated_box), so the operating point can
    never drift between the two paths again.

    Center-weighted geometry (area − 2·center_offset², facenet-style,
    reference: detector/run.py:42-61) plus a two-tier bump: any candidate
    clearing ``decision_threshold`` outranks every sub-gate candidate —
    a centered low-score clutter box admitted by the candidate floor must
    never beat a confident off-center face. The bump 4·(h²+w²) clears the
    geometry range (|geom| ≤ max(h·w, (h²+w²)/2)) while keeping float32
    addition precise enough for sub-pixel tie-breaks within a tier
    (a constant like 1e9 would quantize geom to ulp(1e9)=64, erasing
    area differences under 64 px²; 4·(h²+w²) has ulp ≈ 0.125 at 416²).

    ``xp`` is the array namespace (numpy on the host path, jax.numpy
    inside the jitted pipeline). Invalid rows score −inf."""
    h, w = image_hw
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    cx = (boxes[:, 0] + boxes[:, 2]) / 2 - w / 2
    cy = (boxes[:, 1] + boxes[:, 3]) / 2 - h / 2
    geom = areas - 2.0 * (cx**2 + cy**2)
    bump = 4.0 * (float(h) ** 2 + float(w) ** 2)
    tier = xp.where(scores >= decision_threshold, bump, 0.0)
    return xp.where(valid, geom + tier, -xp.inf)


def compute_ap(recall: np.ndarray, precision: np.ndarray) -> float:
    """Area under the interpolated PR curve (VOC-style all-points AP,
    reference: detector/utility.py:309-334)."""
    r = np.concatenate([[0.0], np.asarray(recall, np.float64), [1.0]])
    p = np.concatenate([[0.0], np.asarray(precision, np.float64), [0.0]])
    # envelope: precision monotone non-increasing from the right
    p = np.maximum.accumulate(p[::-1])[::-1]
    idx = np.nonzero(r[1:] != r[:-1])[0]
    return float(np.sum((r[idx + 1] - r[idx]) * p[idx + 1]))


def evaluate_detections(
    pred_boxes: Sequence[np.ndarray],
    pred_scores: Sequence[np.ndarray],
    gt_boxes: Sequence[np.ndarray],
    iou_threshold: float = 0.5,
) -> Dict[str, float]:
    """Single-class detection AP over a set of images.

    ``pred_boxes[i]``: (P_i, 4), ``pred_scores[i]``: (P_i,),
    ``gt_boxes[i]``: (G_i, 4). Greedy matching in global score order
    (reference intent: detector/utility.py:281-334).
    """
    records: List[Tuple[float, int, int]] = []  # (score, image, pred_idx)
    for img, scores in enumerate(pred_scores):
        for j, s in enumerate(np.asarray(scores)):
            records.append((float(s), img, j))
    records.sort(key=lambda r: -r[0])

    matched = [np.zeros(len(np.atleast_2d(g)) if np.size(g) else 0, bool)
               for g in gt_boxes]
    n_gt = sum(m.shape[0] for m in matched)
    tp = np.zeros(len(records))
    fp = np.zeros(len(records))
    for k, (_, img, j) in enumerate(records):
        gts = np.atleast_2d(gt_boxes[img]) if np.size(gt_boxes[img]) else np.zeros((0, 4))
        if gts.shape[0] == 0:
            fp[k] = 1
            continue
        ious = bbox_iou_numpy(np.atleast_2d(pred_boxes[img])[j : j + 1], gts)[0]
        best = int(np.argmax(ious))
        if ious[best] >= iou_threshold and not matched[img][best]:
            matched[img][best] = True
            tp[k] = 1
        else:
            fp[k] = 1

    ctp, cfp = np.cumsum(tp), np.cumsum(fp)
    recall = ctp / max(n_gt, 1)
    precision = ctp / np.maximum(ctp + cfp, 1e-12)
    ap = compute_ap(recall, precision) if len(records) else 0.0
    return {
        "ap": ap,
        "recall": float(recall[-1]) if len(records) else 0.0,
        "precision": float(precision[-1]) if len(records) else 0.0,
        "num_gt": float(n_gt),
        "num_pred": float(len(records)),
    }


def draw_boxes(
    image: np.ndarray,
    boxes: np.ndarray,
    scores: Optional[np.ndarray] = None,
    labels: Optional[Sequence[str]] = None,
    color: Tuple[int, int, int] = (0, 220, 60),
    thickness: int = 2,
) -> np.ndarray:
    """Draw (x1, y1, x2, y2) boxes + captions on a copy of the image
    (reference: detector/utility.py:203-252, without the cv2 dependency
    being mandatory — pure numpy rectangle fill, PIL text when present)."""
    out = np.array(image, copy=True)
    h, w = out.shape[:2]
    for i, box in enumerate(np.atleast_2d(boxes)):
        x1, y1, x2, y2 = [int(np.clip(v, 0, lim)) for v, lim in
                          zip(box, (w - 1, h - 1, w - 1, h - 1))]
        t = thickness
        out[y1 : y1 + t, x1 : x2 + 1] = color
        out[max(y2 - t + 1, 0) : y2 + 1, x1 : x2 + 1] = color
        out[y1 : y2 + 1, x1 : x1 + t] = color
        out[y1 : y2 + 1, max(x2 - t + 1, 0) : x2 + 1] = color
    if labels is not None or scores is not None:
        try:
            from PIL import Image, ImageDraw

            im = Image.fromarray(out)
            d = ImageDraw.Draw(im)
            for i, box in enumerate(np.atleast_2d(boxes)):
                caption = ""
                if labels is not None and i < len(labels):
                    caption = str(labels[i])
                if scores is not None and i < len(scores):
                    caption = f"{caption} {float(scores[i]):.2f}".strip()
                if caption:
                    d.text((float(box[0]), max(float(box[1]) - 12, 0)), caption,
                           fill=tuple(color))
            # np.asarray(PIL) is read-only; callers draw on the result
            out = np.array(im)
        except ImportError:
            pass
    return out
