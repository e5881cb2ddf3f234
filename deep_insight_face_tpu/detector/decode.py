"""YOLOv3 head decoding: raw conv outputs → scored boxes.

Same math as the reference decoder (reference:
deep_insight_face/detector/yolov3.py:36-105): per-cell
``xy = (σ(t_xy) + grid) / grid_size``, ``wh = exp(t_wh)·anchor / input``,
objectness/class sigmoids, then letterbox undo — but fully vectorized
over scales/anchors/cells as one fused jit (no per-anchor Python loop)
and with boxes in (x1, y1, x2, y2).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def decode_yolo_head(
    raw: jnp.ndarray,
    anchors: jnp.ndarray,
    num_classes: int,
    input_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decode one scale.

    ``raw``: (N, g, g, A·(5+nc)); ``anchors``: (A, 2) pixel units.
    Returns (boxes (N, g·g·A, 4) normalized x1y1x2y2, scores (N, g·g·A, nc)).
    """
    n, gy, gx, _ = raw.shape
    a = anchors.shape[0]
    raw = raw.reshape(n, gy, gx, a, 5 + num_classes)

    cell_x = jax.lax.broadcasted_iota(jnp.float32, (gy, gx), 1)
    cell_y = jax.lax.broadcasted_iota(jnp.float32, (gy, gx), 0)
    grid = jnp.stack([cell_x, cell_y], axis=-1)[None, :, :, None, :]  # (1,g,g,1,2)

    xy = (jax.nn.sigmoid(raw[..., 0:2]) + grid) / jnp.array([gx, gy], jnp.float32)
    wh = jnp.exp(raw[..., 2:4]) * anchors[None, None, None, :, :] / float(input_size)
    obj = jax.nn.sigmoid(raw[..., 4:5])
    cls = jax.nn.sigmoid(raw[..., 5:])

    half = wh / 2.0
    boxes = jnp.concatenate([xy - half, xy + half], axis=-1)  # x1 y1 x2 y2
    scores = obj * cls
    return boxes.reshape(n, -1, 4), scores.reshape(n, -1, num_classes)


def decode_detections(
    heads: Sequence[jnp.ndarray],
    anchors: jnp.ndarray,
    anchor_masks: Sequence[Sequence[int]],
    num_classes: int,
    input_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decode all scales and concatenate.

    ``heads`` ordered coarse→fine (13, 26, 52 for 416 input); masks pick
    each scale's anchors (reference: detector/yolov3.py:132 — large
    anchors at the coarse scale).
    """
    all_boxes, all_scores = [], []
    for head, mask in zip(heads, anchor_masks):
        b, s = decode_yolo_head(
            head, anchors[jnp.asarray(mask)], num_classes, input_size
        )
        all_boxes.append(b)
        all_scores.append(s)
    return jnp.concatenate(all_boxes, axis=1), jnp.concatenate(all_scores, axis=1)


def correct_letterbox_boxes(
    boxes: jnp.ndarray,
    letterbox_meta: jnp.ndarray,
    input_size: int,
    orig_hw: Tuple[int, int],
) -> jnp.ndarray:
    """Map normalized letterboxed boxes back to source pixel coords
    (reference: detector/yolov3.py:69-93).

    ``letterbox_meta`` = [scale, pad_top, pad_left] from ops.image.letterbox.
    Returns (…, 4) float boxes in source pixels, clipped to the image.
    """
    scale, pad_t, pad_l = letterbox_meta[0], letterbox_meta[1], letterbox_meta[2]
    px = boxes * input_size
    x1 = (px[..., 0] - pad_l) / scale
    y1 = (px[..., 1] - pad_t) / scale
    x2 = (px[..., 2] - pad_l) / scale
    y2 = (px[..., 3] - pad_t) / scale
    h, w = orig_hw
    return jnp.stack(
        [
            jnp.clip(x1, 0, w),
            jnp.clip(y1, 0, h),
            jnp.clip(x2, 0, w),
            jnp.clip(y2, 0, h),
        ],
        axis=-1,
    )
