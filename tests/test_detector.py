"""NMS kernel, YOLO decode, and detector runner tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep_insight_face_tpu.config import DetectorConfig
from deep_insight_face_tpu.detector import decode as D
from deep_insight_face_tpu.detector.runner import (
    Detections,
    FaceDetector,
    crop_with_margin,
    select_face,
    to_rgb,
)
from deep_insight_face_tpu.models.yolov3 import YoloV3
from deep_insight_face_tpu.ops import nms as N


def _py_nms(boxes, scores, max_boxes, iou_thr, score_thr=0.0):
    """Literal greedy NMS oracle (tf.image.non_max_suppression semantics)."""
    order = np.argsort(-scores, kind="stable")
    selected = []
    for i in order:
        if scores[i] < score_thr or scores[i] == -np.inf:
            continue
        keep = True
        for j in selected:
            # IoU
            xx1 = max(boxes[i, 0], boxes[j, 0]); yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2]); yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(xx2 - xx1, 0) * max(yy2 - yy1, 0)
            a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            b = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / max(a + b - inter, 1e-9) > iou_thr:
                keep = False
                break
        if keep:
            selected.append(i)
        if len(selected) == max_boxes:
            break
    return selected


def _random_boxes(rng, n=60, size=100):
    xy = rng.uniform(0, size * 0.8, (n, 2))
    wh = rng.uniform(4, size * 0.4, (n, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    return boxes, scores


def test_iou_matrix(rng):
    a = np.array([[0, 0, 10, 10], [5, 5, 15, 15]], np.float32)
    got = np.asarray(N.iou_matrix(jnp.array(a), jnp.array(a)))
    np.testing.assert_allclose(np.diag(got), 1.0, atol=1e-6)
    # overlap 5x5=25, union 200-25=175
    np.testing.assert_allclose(got[0, 1], 25 / 175, atol=1e-6)


@pytest.mark.parametrize("iou_thr", [0.3, 0.5, 0.7])
def test_nms_matches_oracle(rng, iou_thr):
    boxes, scores = _random_boxes(rng)
    ob, os_, valid = N.non_max_suppression(
        jnp.array(boxes), jnp.array(scores), max_boxes=20, iou_threshold=iou_thr
    )
    want_idx = _py_nms(boxes, scores, 20, iou_thr)
    got_boxes = np.asarray(ob)[np.asarray(valid)]
    np.testing.assert_allclose(got_boxes, boxes[want_idx], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(os_)[np.asarray(valid)], scores[want_idx], atol=1e-6
    )


# Golden vectors pinning tf.image.non_max_suppression semantics
# (reference detector/yolov3.py:155-166) on adversarial structure:
# expected index lists are hand-derived from the tf kernel's rules —
# stable descending score order (ties → lowest index first), strict
# `iou > threshold` suppression (boundary-exact IoU KEPT), zero-area
# boxes neither suppress nor get suppressed (tf treats area<=0 as
# IoU 0), greedy non-transitive chains. Runs in every environment —
# replaces a torchvision cross-check that needed an uninstallable extra.
_GOLDEN_NMS = {
    "ties_identical": (
        [[0, 0, 10, 10], [0, 0, 10, 10], [0, 0, 10, 10], [20, 20, 30, 30]],
        [0.9, 0.9, 0.9, 0.9],
        0.5,
        [0, 3],
    ),
    # nested small box: IoU = 100/400 = 0.25
    "nested_kept": (
        [[0, 0, 20, 20], [5, 5, 15, 15]],
        [0.9, 0.8],
        0.5,
        [0, 1],
    ),
    "nested_suppressed": (
        [[0, 0, 20, 20], [5, 5, 15, 15]],
        [0.9, 0.8],
        0.2,
        [0],
    ),
    # zero-width boxes inside a real one: all survive
    "degenerate_zero_area": (
        [[0, 0, 10, 10], [5, 0, 5, 10], [5, 0, 5, 10]],
        [0.9, 0.8, 0.7],
        0.5,
        [0, 1, 2],
    ),
    # A kills B (IoU 0.25 > 0.2); C only overlapped B, so C survives
    "chain_not_transitive": (
        [[0, 0, 10, 10], [0, 6, 10, 16], [0, 12, 10, 22]],
        [0.9, 0.8, 0.7],
        0.2,
        [0, 2],
    ),
    # IoU exactly 0.5 (50/100, exact in float32) at threshold 0.5: kept
    "boundary_exact_iou": (
        [[0, 0, 10, 10], [0, 0, 10, 5], [0, 0, 10, 6]],
        [0.9, 0.8, 0.7],
        0.5,
        [0, 1],
    ),
    # equal scores, disjoint boxes, max_boxes cap: stable index order
    "score_tie_order": (
        [[0, 0, 10, 10], [20, 0, 30, 10], [40, 0, 50, 10]],
        [0.5, 0.5, 0.5],
        0.5,
        [0, 1],
    ),
}


@pytest.mark.parametrize("case", sorted(_GOLDEN_NMS))
def test_nms_golden_vectors(case):
    boxes, scores, iou_thr, want = _GOLDEN_NMS[case]
    boxes = np.asarray(boxes, np.float32)
    scores = np.asarray(scores, np.float32)
    max_boxes = 2 if case == "score_tie_order" else 20
    ob, os_, valid = N.non_max_suppression(
        jnp.array(boxes), jnp.array(scores), max_boxes=max_boxes,
        iou_threshold=iou_thr,
    )
    valid = np.asarray(valid)
    np.testing.assert_array_equal(np.asarray(ob)[valid], boxes[want])
    np.testing.assert_array_equal(np.asarray(os_)[valid], scores[want])
    # the batched grid kernel must agree bit-for-bit
    bb, bs, bv = N.non_max_suppression_batch(
        jnp.array(boxes)[None], jnp.array(scores)[None],
        max_boxes=max_boxes, iou_threshold=iou_thr,
    )
    np.testing.assert_array_equal(np.asarray(bv)[0], valid)
    np.testing.assert_array_equal(np.asarray(bb)[0][valid], boxes[want])
    # the in-repo python oracle must agree with the goldens too
    assert _py_nms(boxes, scores, max_boxes, iou_thr) == want


def test_nms_score_threshold(rng):
    boxes, scores = _random_boxes(rng, n=30)
    scores[:] = 0.05
    scores[3] = 0.9
    _, os_, valid = N.non_max_suppression(
        jnp.array(boxes), jnp.array(scores), max_boxes=20,
        iou_threshold=0.5, score_threshold=0.4,
    )
    assert np.asarray(valid).sum() == 1
    assert np.asarray(os_)[np.asarray(valid)][0] == pytest.approx(0.9)


def test_nms_reference_path_agrees(rng):
    boxes, scores = _random_boxes(rng, n=50)
    a = N.non_max_suppression(jnp.array(boxes), jnp.array(scores))
    b = N.non_max_suppression_reference(jnp.array(boxes), jnp.array(scores))
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=1e-5)


def test_decode_yolo_head_geometry():
    # zero logits → sigmoid 0.5: each cell's box centered at (cell+0.5)/g,
    # wh = anchor/input
    g, input_size = 4, 64
    anchors = jnp.array([[16.0, 16.0]])
    raw = jnp.zeros((1, g, g, 1 * 6))
    boxes, scores = D.decode_yolo_head(raw, anchors, 1, input_size)
    boxes = np.asarray(boxes)[0].reshape(g, g, 4)
    # cell (0,0): center (0.5/4, 0.5/4), wh 16/64=0.25
    np.testing.assert_allclose(boxes[0, 0], [0.125 - 0.125, 0.125 - 0.125, 0.25, 0.25], atol=1e-6)
    np.testing.assert_allclose(boxes[2, 1], [0.375 - 0.125, 0.625 - 0.125, 0.5, 0.75], atol=1e-6)
    assert np.allclose(np.asarray(scores), 0.25)  # 0.5 obj × 0.5 cls


def test_correct_letterbox_boxes_roundtrip():
    # a box in a 200(w)×100(h) image letterboxed to 416
    import deep_insight_face_tpu.ops.image as I

    img = jnp.zeros((100, 200, 3))
    _, meta = I.letterbox(img, 416)
    scale = float(meta[0])
    # normalized coords of source box (20, 10, 60, 50) in letterbox space
    src = np.array([20.0, 10.0, 60.0, 50.0])
    lb = np.array(
        [
            (src[0] * scale + float(meta[2])) / 416,
            (src[1] * scale + float(meta[1])) / 416,
            (src[2] * scale + float(meta[2])) / 416,
            (src[3] * scale + float(meta[1])) / 416,
        ]
    )
    out = np.asarray(
        D.correct_letterbox_boxes(jnp.array(lb[None]), meta, 416, (100, 200))
    )[0]
    np.testing.assert_allclose(out, src, atol=0.5)


def test_select_face_center_weighted():
    # two boxes same size: one centered, one at corner → pick centered
    boxes = np.array([[0, 0, 20, 20], [40, 40, 60, 60]], np.float32)
    assert select_face(boxes, (100, 100)) == 1
    # largest-only picks the bigger one regardless of position
    boxes2 = np.array([[0, 0, 50, 50], [45, 45, 55, 55]], np.float32)
    assert select_face(boxes2, (100, 100), largest_only=True) == 0


def test_crop_with_margin():
    img = np.arange(100 * 100 * 3, dtype=np.uint8).reshape(100, 100, 3)
    crop, bb = crop_with_margin(img, np.array([10, 20, 30, 40]), margin=8)
    np.testing.assert_array_equal(bb, [6, 16, 34, 44])
    assert crop.shape == (28, 28, 3)
    # clipping at borders
    _, bb2 = crop_with_margin(img, np.array([0, 0, 99, 99]), margin=8)
    np.testing.assert_array_equal(bb2, [0, 0, 100, 100])


def test_to_rgb():
    g = np.zeros((5, 6), np.uint8)
    assert to_rgb(g).shape == (5, 6, 3)
    assert to_rgb(g[:, :, None]).shape == (5, 6, 3)
    rgb = np.zeros((5, 6, 3), np.uint8)
    assert to_rgb(rgb) is rgb


@pytest.mark.slow
def test_yolo_model_and_detector_end_to_end(rng):
    # random weights; checks shapes, jit, and the full pipeline plumbing
    cfg = DetectorConfig(input_size=128, score_threshold=0.0)
    model = YoloV3(num_classes=1, dtype=jnp.float32)
    x = jnp.zeros((1, 128, 128, 3))
    variables = model.init(jax.random.key(0), x)
    heads = model.apply(variables, x)
    assert heads[0].shape == (1, 4, 4, 18)
    assert heads[1].shape == (1, 8, 8, 18)
    assert heads[2].shape == (1, 16, 16, 18)

    det = FaceDetector(variables, cfg, model)
    img = rng.integers(0, 255, (96, 120, 3), dtype=np.uint8)
    crops, bbs = det(img, detect_multiple_faces=False)
    # random weights → sigmoid ~0.5 scores ≥ 0 threshold: some box returns
    assert len(crops) <= 1
    for crop, bb in zip(crops, bbs):
        assert crop.ndim == 3
        assert bb.shape == (4,)


@pytest.mark.parametrize("seed", range(5))
def test_nms_randomized_stress(seed):
    """Randomized NMS edge cases vs the python oracle: few boxes,
    duplicates, all-below-threshold, degenerate boxes."""
    r = np.random.default_rng(seed)
    n = int(r.integers(1, 40))
    boxes, scores = _random_boxes(r, n=n)
    if seed == 1:  # exact duplicates
        boxes = np.resize(boxes[: max(n // 2, 1)], (n, 4))
    if seed == 2:  # degenerate zero-area boxes mixed in
        boxes[: n // 3, 2] = boxes[: n // 3, 0]
    thr = float(r.uniform(0.2, 0.8))
    score_thr = 0.95 if seed == 3 else 0.0  # nearly everything filtered
    ob, os_, valid = N.non_max_suppression(
        jnp.array(boxes), jnp.array(scores), max_boxes=10,
        iou_threshold=thr, score_threshold=score_thr,
    )
    want = _py_nms(boxes, scores, 10, thr, score_thr)
    got = np.asarray(ob)[np.asarray(valid)]
    np.testing.assert_allclose(got, boxes[want], atol=1e-5)


def test_nms_batch_matches_per_image(rng):
    """non_max_suppression_batch (one pallas_call, grid over images) ==
    vmapped per-image non_max_suppression, elementwise."""
    import jax

    from deep_insight_face_tpu.ops.nms import (
        non_max_suppression, non_max_suppression_batch,
    )

    b, n = 5, 300
    centers = rng.uniform(20, 200, (b, n, 2)).astype(np.float32)
    wh = rng.uniform(10, 60, (b, n, 2)).astype(np.float32)
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1)
    scores = rng.uniform(0, 1, (b, n)).astype(np.float32)

    bb, bs, bv = non_max_suppression_batch(
        jnp.asarray(boxes), jnp.asarray(scores),
        max_boxes=10, iou_threshold=0.5, score_threshold=0.3,
    )
    for i in range(b):
        sb, ss, sv = non_max_suppression(
            jnp.asarray(boxes[i]), jnp.asarray(scores[i]),
            max_boxes=10, iou_threshold=0.5, score_threshold=0.3,
        )
        np.testing.assert_array_equal(np.asarray(bv[i]), np.asarray(sv))
        np.testing.assert_allclose(np.asarray(bb[i]), np.asarray(sb), atol=1e-6)
        np.testing.assert_allclose(np.asarray(bs[i]), np.asarray(ss), atol=1e-6)


@pytest.mark.parametrize("variant,n_heads", [("tiny_s2d", 2), ("tiny_mx", 2)])
def test_tiny_variants_end_to_end(rng, variant, n_heads):
    # every registered tiny-family variant: factory → shapes → serving path
    from deep_insight_face_tpu.models.yolov3 import TINY_ANCHOR_MASKS
    from deep_insight_face_tpu.pipeline import make_detector_model

    cfg = DetectorConfig(variant=variant, input_size=128, score_threshold=0.0)
    model, masks = make_detector_model(cfg)
    assert masks == TINY_ANCHOR_MASKS
    x = jnp.zeros((1, 128, 128, 3))
    variables = model.init(jax.random.key(0), x)
    heads = model.apply(variables, x)
    assert len(heads) == n_heads
    assert heads[0].shape == (1, 4, 4, 18)  # stride 32
    assert heads[1].shape == (1, 8, 8, 18)  # stride 16

    det = FaceDetector(variables, cfg, model)
    img = rng.integers(0, 255, (96, 120, 3), dtype=np.uint8)
    crops, bbs = det(img, detect_multiple_faces=False)
    assert len(crops) <= 1
    for crop, bb in zip(crops, bbs):
        assert crop.ndim == 3 and bb.shape == (4,)


class _StubbedDetector(FaceDetector):
    """FaceDetector with detect_batch stubbed: returns canned detections
    keyed by the requested score_threshold, so the two-threshold
    __call__ selection logic is testable without a network."""

    def __init__(self, cfg, by_threshold):
        self.cfg = cfg
        self._by_threshold = by_threshold

    def detect_batch(self, images, score_threshold=None):
        thr = (self.cfg.score_threshold if score_threshold is None
               else float(score_threshold))
        boxes, scores = self._by_threshold[thr]
        valid = np.ones(len(boxes), bool)
        return [Detections(np.asarray(boxes, np.float32),
                           np.asarray(scores, np.float32), valid)]


def _mk_two_threshold_cfg():
    from deep_insight_face_tpu.config import DetectorConfig

    return DetectorConfig(score_threshold=0.4, candidate_threshold=0.02,
                          decision_threshold=0.1)


def test_call_two_threshold_fallback_finds_subenumeration_face():
    """A face scoring between decision (0.1) and enumeration (0.4)
    thresholds must still be returned by __call__ — the serving
    pipeline's two-threshold semantics (pipeline._select_best_box)."""
    cfg = _mk_two_threshold_cfg()
    face = [30.0, 30.0, 70.0, 70.0]
    det = _StubbedDetector(cfg, {
        0.4: (np.zeros((0, 4)), np.zeros((0,))),       # enumeration: none
        0.02: (np.array([face]), np.array([0.25])),    # candidate floor
    })
    img = np.zeros((100, 100, 3), np.uint8)
    for multi in (False, True):
        crops, bbs = det(img, detect_multiple_faces=multi)
        assert len(bbs) == 1
        assert bbs[0][0] <= face[0] and bbs[0][2] >= face[2]  # margin crop


def test_call_decision_gate_rejects_subgate_candidates():
    """Candidates below decision_threshold must NOT produce a face
    (faceless-frame precision)."""
    cfg = _mk_two_threshold_cfg()
    det = _StubbedDetector(cfg, {
        0.4: (np.zeros((0, 4)), np.zeros((0,))),
        0.02: (np.array([[30.0, 30.0, 70.0, 70.0]]), np.array([0.05])),
    })
    crops, bbs = det(np.zeros((100, 100, 3), np.uint8))
    assert crops == [] and bbs == []


def test_call_two_tier_rank_prefers_confident_offcenter_face():
    """A centered low-score clutter box admitted by the candidate floor
    must not outrank an off-center confident face."""
    cfg = _mk_two_threshold_cfg()
    clutter = [40.0, 40.0, 60.0, 60.0]   # centered, score 0.03
    face = [0.0, 0.0, 30.0, 30.0]        # corner, score 0.9
    det = _StubbedDetector(cfg, {
        0.4: (np.zeros((0, 4)), np.zeros((0,))),
        0.02: (np.array([clutter, face]), np.array([0.03, 0.9])),
    })
    _, bbs = det(np.zeros((100, 100, 3), np.uint8))
    assert len(bbs) == 1
    assert bbs[0][2] <= face[2] + cfg.bbox_margin + 1  # picked the face
