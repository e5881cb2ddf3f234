"""YOLOv3 training loss + static-shape anchor/target assignment.

The reference never trains its detector — it only converts pre-trained
Darknet weights (reference: scripts/yolo_convert_tf.py). This module
makes the detector family trainable end-to-end on TPU: classic YOLOv3
multi-part loss (BCE objectness with ignore region, BCE xy, MSE wh,
BCE class) with the standard best-anchor assignment, written with fully
static shapes: ground truth arrives padded to ``max_boxes`` with a valid
mask, and assignment scatters into dense per-scale target tensors.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _wh_iou(wh1: jnp.ndarray, wh2: jnp.ndarray) -> jnp.ndarray:
    """(N, M) IoU of centered boxes given widths/heights only."""
    inter = jnp.minimum(wh1[:, None, 0], wh2[None, :, 0]) * jnp.minimum(
        wh1[:, None, 1], wh2[None, :, 1]
    )
    a1 = wh1[:, 0] * wh1[:, 1]
    a2 = wh2[:, 0] * wh2[:, 1]
    return inter / jnp.maximum(a1[:, None] + a2[None, :] - inter, 1e-9)


def build_targets(
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    anchors: jnp.ndarray,
    anchor_masks: Sequence[Sequence[int]],
    input_size: int,
    grid_sizes: Sequence[int],
) -> List[Dict[str, jnp.ndarray]]:
    """Dense training targets per scale.

    ``gt_boxes``: (B, G, 4) pixel x1y1x2y2, padded; ``gt_valid``: (B, G)
    bool. Each gt is assigned to its best-IoU anchor (over all 9) and the
    center cell at that anchor's scale. Returns per scale:
    {"txy": (B,g,g,A,2) in-cell offsets, "twh": (B,g,g,A,2) log-ratios,
     "obj": (B,g,g,A), "wh_px": (B,g,g,A,2) for loss weighting}.
    """
    b, g_max, _ = gt_boxes.shape
    cx = (gt_boxes[..., 0] + gt_boxes[..., 2]) / 2.0
    cy = (gt_boxes[..., 1] + gt_boxes[..., 3]) / 2.0
    w = jnp.maximum(gt_boxes[..., 2] - gt_boxes[..., 0], 1e-3)
    h = jnp.maximum(gt_boxes[..., 3] - gt_boxes[..., 1], 1e-3)

    # Best-anchor assignment runs over the anchors this variant USES
    # (the union of its masks), not the full table: the tiny family
    # masks only a subset of the 9 anchors, and an argmax over all 9
    # could pick an uncovered anchor — the gt would then be assigned to
    # no scale and actively trained as background (small faces on
    # external data; the synthetic world's min face size masked this).
    covered = sorted({int(a_) for m_ in anchor_masks for a_ in m_})
    wh_flat = jnp.stack([w, h], -1).reshape(-1, 2)
    iou_cov = _wh_iou(wh_flat, anchors[jnp.asarray(covered)])
    best_anchor = jnp.asarray(covered)[jnp.argmax(iou_cov, axis=1)].reshape(
        b, g_max
    )

    targets = []
    for scale_idx, (mask, gsize) in enumerate(zip(anchor_masks, grid_sizes)):
        mask = list(mask)
        a = len(mask)
        stride = input_size / gsize
        # which gts belong to this scale (their best anchor ∈ mask)
        local_idx = jnp.full_like(best_anchor, -1)
        for local, global_a in enumerate(mask):
            local_idx = jnp.where(best_anchor == global_a, local, local_idx)
        on_scale = (local_idx >= 0) & gt_valid

        col = jnp.clip((cx / stride).astype(jnp.int32), 0, gsize - 1)
        row = jnp.clip((cy / stride).astype(jnp.int32), 0, gsize - 1)
        txy = jnp.stack([cx / stride - col, cy / stride - row], -1)
        scale_anchors = anchors[jnp.asarray(mask)]
        anchor_wh = scale_anchors[jnp.clip(local_idx, 0, a - 1)]  # (B, G, 2)
        twh = jnp.log(jnp.maximum(jnp.stack([w, h], -1) / anchor_wh, 1e-9))

        zeros = lambda *sh: jnp.zeros((b, gsize, gsize, a) + tuple(sh))
        t = {
            "txy": zeros(2), "twh": zeros(2), "obj": zeros(), "wh_px": zeros(2),
        }
        batch_idx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, g_max))
        safe_local = jnp.clip(local_idx, 0, a - 1)
        # Collision resolution: if several gts land on the same
        # (cell, anchor), only the FIRST (lowest gt index) writes —
        # otherwise .at[].add would sum their regression targets,
        # corrupting crowded scenes. O(G²) pairwise check; G = max_boxes.
        cell_key = (row * gsize + col) * a + safe_local  # (B, G)
        same_cell = (cell_key[:, :, None] == cell_key[:, None, :]) & (
            on_scale[:, :, None] & on_scale[:, None, :]
        )
        earlier = jnp.tril(jnp.ones((g_max, g_max), bool), k=-1)
        dup = jnp.any(same_cell & earlier[None], axis=2)  # (B, G)
        sel = (on_scale & ~dup).astype(jnp.float32)

        def scatter(tensor, values):
            # masked scatter: deselected entries add zeros at their cell
            return tensor.at[
                batch_idx, row, col, safe_local
            ].add(values * sel[..., None] if values.ndim == 3 else values * sel)

        t["txy"] = scatter(t["txy"], txy)
        t["twh"] = scatter(t["twh"], twh)
        t["obj"] = scatter(t["obj"], jnp.ones_like(sel))
        t["wh_px"] = scatter(t["wh_px"], jnp.stack([w, h], -1))
        targets.append(t)
    return targets


def _pred_box_gt_iou(
    raw: jnp.ndarray,
    anchors_scale: jnp.ndarray,
    input_size: int,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
) -> jnp.ndarray:
    """(B, g, g, A) max IoU of each decoded predicted box vs any valid gt.

    Same decode conventions as detector/decode.py and build_targets:
    axis 1 is rows (y), axis 2 is cols (x); channel 0:2 is txy.
    """
    b, g, _, a, _ = raw.shape
    stride = input_size / g
    col = jnp.arange(g, dtype=jnp.float32)[None, None, :, None]
    row = jnp.arange(g, dtype=jnp.float32)[None, :, None, None]
    pcx = (jax.nn.sigmoid(raw[..., 0]) + col) * stride
    pcy = (jax.nn.sigmoid(raw[..., 1]) + row) * stride
    pwh = jnp.exp(jnp.clip(raw[..., 2:4], -10.0, 10.0)) * anchors_scale
    px1 = pcx - pwh[..., 0] / 2
    py1 = pcy - pwh[..., 1] / 2
    px2 = pcx + pwh[..., 0] / 2
    py2 = pcy + pwh[..., 1] / 2
    # broadcast against (B, 1, 1, 1, G) gt corners
    gx1 = gt_boxes[:, None, None, None, :, 0]
    gy1 = gt_boxes[:, None, None, None, :, 1]
    gx2 = gt_boxes[:, None, None, None, :, 2]
    gy2 = gt_boxes[:, None, None, None, :, 3]
    iw = jnp.maximum(
        jnp.minimum(px2[..., None], gx2) - jnp.maximum(px1[..., None], gx1), 0.0
    )
    ih = jnp.maximum(
        jnp.minimum(py2[..., None], gy2) - jnp.maximum(py1[..., None], gy1), 0.0
    )
    inter = iw * ih
    pa = ((px2 - px1) * (py2 - py1))[..., None]
    ga = jnp.maximum((gx2 - gx1) * (gy2 - gy1), 0.0)
    iou = inter / jnp.maximum(pa + ga - inter, 1e-9)
    iou = jnp.where(gt_valid[:, None, None, None, :], iou, 0.0)
    return jnp.max(iou, axis=-1)


def yolo_scale_loss(
    head: jnp.ndarray,
    target: Dict[str, jnp.ndarray],
    anchors_scale: jnp.ndarray,
    input_size: int,
    num_classes: int = 1,
    obj_weight: float = 1.0,
    noobj_weight: float = 0.5,
    box_weight: float = 5.0,
    gt_boxes: jnp.ndarray = None,
    gt_valid: jnp.ndarray = None,
    ignore_thresh: float = 0.5,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Loss for one detection scale; head (B, g, g, A·(5+nc))."""
    b, g, _, _ = head.shape
    a = anchors_scale.shape[0]
    raw = head.reshape(b, g, g, a, 5 + num_classes)
    obj_t = target["obj"]
    pos = obj_t > 0.5

    # coordinate losses only at positive cells; small boxes weighted up
    wh_px = target["wh_px"]
    box_scale = 2.0 - (wh_px[..., 0] * wh_px[..., 1]) / float(input_size**2)
    box_scale = jnp.where(pos, box_scale, 0.0)

    xy_bce = optax_sigmoid_bce(raw[..., 0:2], target["txy"])
    xy_loss = jnp.sum(jnp.sum(xy_bce, -1) * box_scale)

    wh_err = jnp.square(raw[..., 2:4] - target["twh"])
    wh_loss = jnp.sum(jnp.sum(wh_err, -1) * box_scale)

    obj_bce = optax_sigmoid_bce(raw[..., 4], obj_t)
    # ignore region (standard YOLOv3): non-positive anchors whose
    # DECODED box already overlaps a gt above ignore_thresh are neither
    # positives nor negatives — penalizing them as full negatives pushes
    # confident near-duplicate predictions toward 0 and depresses recall
    if gt_boxes is not None:
        best_iou = _pred_box_gt_iou(
            jax.lax.stop_gradient(raw), anchors_scale, input_size,
            gt_boxes, gt_valid,
        )
        ignore = (~pos) & (best_iou > ignore_thresh)
    else:
        ignore = jnp.zeros_like(pos)
    noobj_term = jnp.where(ignore, 0.0, noobj_weight * obj_bce)
    obj_loss = jnp.sum(jnp.where(pos, obj_weight * obj_bce, noobj_term))

    if num_classes > 1:
        raise NotImplementedError(
            "detector training supervises a single 'face' class — the "
            "annotation contract (boxes + valid mask) carries no class "
            "labels to train num_classes > 1 against; multi-class decode "
            "of CONVERTED weights is unaffected (detector/decode.py)"
        )
    else:  # single class: supervise the class logit at positives
        cls_loss = jnp.sum(optax_sigmoid_bce(raw[..., 5], obj_t) * obj_t)

    n_pos = jnp.maximum(jnp.sum(obj_t), 1.0)
    total = (box_weight * (xy_loss + wh_loss) + obj_loss + cls_loss) / (b * 1.0)
    return total, {
        "xy": xy_loss / n_pos, "wh": wh_loss / n_pos,
        "obj": obj_loss / b, "n_pos": n_pos,
    }


def optax_sigmoid_bce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable BCE with logits (delegates to optax — the
    identical formulation already ships there; no second copy to drift)."""
    import optax

    return optax.losses.sigmoid_binary_cross_entropy(logits, labels)


def yolo_loss(
    heads: Sequence[jnp.ndarray],
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    anchors: jnp.ndarray,
    anchor_masks: Sequence[Sequence[int]],
    input_size: int,
    num_classes: int = 1,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total multi-scale YOLOv3 loss."""
    grid_sizes = [h.shape[1] for h in heads]
    targets = build_targets(
        gt_boxes, gt_valid, anchors, anchor_masks, input_size, grid_sizes
    )
    total = jnp.float32(0.0)
    metrics: Dict[str, jnp.ndarray] = {}
    for i, (head, t, mask) in enumerate(zip(heads, targets, anchor_masks)):
        l, m = yolo_scale_loss(
            head, t, anchors[jnp.asarray(list(mask))], input_size, num_classes,
            gt_boxes=gt_boxes, gt_valid=gt_valid,
        )
        total = total + l
        metrics[f"scale{i}_obj"] = m["obj"]
        metrics[f"scale{i}_npos"] = m["n_pos"]
    metrics["loss"] = total
    return total, metrics
