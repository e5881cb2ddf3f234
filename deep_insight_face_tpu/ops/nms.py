"""Non-maximum suppression: Pallas TPU kernel + jnp reference.

Semantics match ``tf.image.non_max_suppression`` as used by the
reference decoder (reference: deep_insight_face/detector/yolov3.py:155-166):
greedy selection in score order, suppressing candidates whose IoU with
any already-selected box exceeds ``iou_threshold``, emitting at most
``max_boxes`` (reference caps at 20, yolov3.py:127).

Everything is static-shape: candidates are first reduced to the top-K by
score (lax.top_k), then the kernel runs a fixed ``max_boxes``-step greedy
loop over a K×K IoU matrix held entirely in VMEM — no HBM traffic inside
the loop, no dynamic shapes anywhere.

Boxes are (x1, y1, x2, y2).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deep_insight_face_tpu.ops.pallas_utils import interpret_mode, round_up


def iou_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(N, M) pairwise IoU of (x1, y1, x2, y2) boxes."""
    area_a = jnp.maximum(a[:, 2] - a[:, 0], 0) * jnp.maximum(a[:, 3] - a[:, 1], 0)
    area_b = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def _greedy_select(
    scores: jnp.ndarray, iou: jnp.ndarray, max_boxes: int, iou_threshold: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-iteration greedy NMS given scores (K,) and IoU (K, K).

    Returns (indices (max_boxes,), valid mask (max_boxes,)). Used both by
    the jnp reference path and inside the Pallas kernel (it is pure jnp).
    """
    k = scores.shape[0]
    neg = jnp.float32(-jnp.inf)

    def body(carry, _):
        active_scores = carry
        best = jnp.argmax(active_scores)
        best_score = active_scores[best]
        valid = best_score > neg
        # suppress best itself + all high-IoU neighbours
        suppress = (iou[best] > iou_threshold) | (
            jnp.arange(k) == best
        )
        new_scores = jnp.where(valid & suppress, neg, active_scores)
        return new_scores, (jnp.where(valid, best, 0).astype(jnp.int32), valid)

    _, (idx, valid) = jax.lax.scan(body, scores, None, length=max_boxes)
    return idx, valid


def _nms_kernel(max_boxes: int, iou_threshold: float,
                rows_ref, cols_ref, scores_ref, idx_ref, valid_ref):
    """Mosaic-friendly greedy NMS: no gathers and no transposes — boxes
    arrive in BOTH layouts ((4, K) rows and (K, 4) columns) so the
    (K,1)×(1,K) IoU broadcasts need no in-kernel transpose, and the
    selected IoU row is extracted with a one-hot masked reduction.
    Outputs accumulate densely in the fori_loop carry.
    """
    k = scores_ref.shape[1]
    x1r, y1r = rows_ref[0:1, :], rows_ref[1:2, :]  # (1, K)
    x2r, y2r = rows_ref[2:3, :], rows_ref[3:4, :]
    x1c, y1c = cols_ref[:, 0:1], cols_ref[:, 1:2]  # (K, 1)
    x2c, y2c = cols_ref[:, 2:3], cols_ref[:, 3:4]

    area_r = jnp.maximum(x2r - x1r, 0.0) * jnp.maximum(y2r - y1r, 0.0)  # (1, K)
    area_c = jnp.maximum(x2c - x1c, 0.0) * jnp.maximum(y2c - y1c, 0.0)  # (K, 1)

    iw = jnp.maximum(jnp.minimum(x2c, x2r) - jnp.maximum(x1c, x1r), 0.0)
    ih = jnp.maximum(jnp.minimum(y2c, y2r) - jnp.maximum(y1c, y1r), 0.0)
    inter = iw * ih  # (K, K)
    union = area_c + area_r - inter
    iou = inter / jnp.maximum(union, 1e-9)

    neg = jnp.float32(-jnp.inf)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    col_k1 = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
    out_col = jax.lax.broadcasted_iota(jnp.int32, (1, max_boxes), 1)

    def body(i, carry):
        active, idx_acc, valid_acc = carry
        best_score = jnp.max(active)
        best = jnp.argmax(active[0, :]).astype(jnp.int32)
        valid = best_score > neg
        onehot = col == best  # (1, K)
        onehot_col = col_k1 == best  # (K, 1)
        iou_row = jnp.sum(jnp.where(onehot_col, iou, 0.0), axis=0, keepdims=True)
        suppress = (iou_row > iou_threshold) | onehot
        active = jnp.where(valid & suppress, neg, active)
        slot = out_col == i
        idx_acc = jnp.where(slot, jnp.where(valid, best, 0), idx_acc)
        valid_acc = jnp.where(slot, valid.astype(jnp.int32), valid_acc)
        return active, idx_acc, valid_acc

    init = (
        scores_ref[:],
        jnp.zeros((1, max_boxes), jnp.int32),
        jnp.zeros((1, max_boxes), jnp.int32),
    )
    _, idx_acc, valid_acc = jax.lax.fori_loop(0, max_boxes, body, init)
    idx_ref[:] = idx_acc
    valid_ref[:] = valid_acc


@functools.partial(
    jax.jit,
    static_argnames=("max_boxes", "iou_threshold", "score_threshold", "top_k",
                     "approx_topk"),
)
def non_max_suppression(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_boxes: int = 20,
    iou_threshold: float = 0.5,
    score_threshold: float = 0.0,
    top_k: int = 256,
    approx_topk: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """NMS over (N, 4) boxes + (N,) scores.

    Returns (boxes (max_boxes, 4), scores (max_boxes,), valid (max_boxes,)
    bool). Invalid slots are zeroed. Candidates below ``score_threshold``
    never survive. ``approx_topk`` uses the TPU-native approx_max_k
    prefilter (recall 0.99 over the top-k candidate set — fine for the
    serving pipeline, keep exact for eval).
    """
    n = scores.shape[0]
    k = min(top_k, n)
    scores = jnp.where(scores >= score_threshold, scores, -jnp.inf)
    if approx_topk and k < n:
        top_scores, top_idx = jax.lax.approx_max_k(
            scores, k, recall_target=0.99
        )
    else:
        top_scores, top_idx = jax.lax.top_k(scores, k)
    top_boxes = boxes[top_idx]

    kp = max(round_up(k, 128), 128)
    pad = kp - k
    boxes_p = jnp.pad(top_boxes.astype(jnp.float32), ((0, pad), (0, 0)))
    scores_p = jnp.pad(top_scores.astype(jnp.float32), (0, pad),
                       constant_values=-jnp.inf)

    idx, valid = pl.pallas_call(
        functools.partial(_nms_kernel, max_boxes, iou_threshold),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, max_boxes), jnp.int32),
            jax.ShapeDtypeStruct((1, max_boxes), jnp.int32),
        ),
        interpret=interpret_mode(),
    )(boxes_p.T, boxes_p, scores_p[None, :])

    idx = idx[0]
    valid = valid[0].astype(bool)
    out_boxes = jnp.where(valid[:, None], top_boxes[jnp.minimum(idx, k - 1)], 0.0)
    out_scores = jnp.where(valid, top_scores[jnp.minimum(idx, k - 1)], 0.0)
    return out_boxes, out_scores, valid


@functools.partial(
    jax.jit,
    static_argnames=("max_boxes", "iou_threshold", "score_threshold", "top_k",
                     "approx_topk"),
)
def non_max_suppression_batch(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_boxes: int = 20,
    iou_threshold: float = 0.5,
    score_threshold: float = 0.0,
    top_k: int = 256,
    approx_topk: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched NMS over (B, N, 4) boxes + (B, N) scores as ONE kernel
    launch: a single ``pallas_call`` with ``grid=(B,)`` — one grid step
    per image — instead of B vmapped dispatches. Same per-image kernel
    and semantics as :func:`non_max_suppression`; the top-k prefilter
    runs batched in XLA. Returns (boxes (B, max_boxes, 4), scores
    (B, max_boxes), valid (B, max_boxes) bool).
    """
    b, n, _ = boxes.shape
    k = min(top_k, n)
    scores = jnp.where(scores >= score_threshold, scores, -jnp.inf)
    if approx_topk and k < n:
        top_scores, top_idx = jax.lax.approx_max_k(
            scores, k, recall_target=0.99
        )
    else:
        top_scores, top_idx = jax.lax.top_k(scores, k)
    top_boxes = jnp.take_along_axis(
        boxes.astype(jnp.float32), top_idx[..., None], axis=1
    )  # (B, k, 4)

    kp = max(round_up(k, 128), 128)
    pad = kp - k
    boxes_p = jnp.pad(top_boxes, ((0, 0), (0, pad), (0, 0)))
    scores_p = jnp.pad(top_scores.astype(jnp.float32), ((0, 0), (0, pad)),
                       constant_values=-jnp.inf)[:, None, :]  # (B, 1, kp)
    rows = jnp.transpose(boxes_p, (0, 2, 1))  # (B, 4, kp)

    idx, valid = pl.pallas_call(
        functools.partial(_nms_kernel, max_boxes, iou_threshold),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, 4, kp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, kp, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, kp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, 1, max_boxes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, max_boxes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1, max_boxes), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, max_boxes), jnp.int32),
        ),
        interpret=interpret_mode(),
    )(rows, boxes_p, scores_p)

    idx = idx[:, 0]  # (B, max_boxes)
    valid = valid[:, 0].astype(bool)
    safe = jnp.minimum(idx, k - 1)
    out_boxes = jnp.where(
        valid[..., None],
        jnp.take_along_axis(top_boxes, safe[..., None], axis=1),
        0.0,
    )
    out_scores = jnp.where(
        valid, jnp.take_along_axis(top_scores, safe, axis=1), 0.0
    )
    return out_boxes, out_scores, valid


def non_max_suppression_reference(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_boxes: int = 20,
    iou_threshold: float = 0.5,
    score_threshold: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pure-jnp greedy NMS over ALL candidates (no top-k) — the test oracle."""
    scores = jnp.where(scores >= score_threshold, scores.astype(jnp.float32), -jnp.inf)
    iou = iou_matrix(boxes.astype(jnp.float32), boxes.astype(jnp.float32))
    idx, valid = _greedy_select(scores, iou, max_boxes, iou_threshold)
    out_boxes = jnp.where(valid[:, None], boxes[idx], 0.0)
    out_scores = jnp.where(valid, scores[idx], 0.0)
    return out_boxes, out_scores, valid
