"""Fused detect → align → embed serving pipeline.

The throughput path of the BASELINE north star (≥5k faces/sec/chip on
v5e): one jitted program per batch geometry that runs the detector
(YOLOv3 416), decode + Pallas NMS, box selection, similarity-align to
112×112, preprocessing and the embedding CNN — device-resident end to
end, uint8 in / embeddings out, no host round-trips.

The reference executes this as five separate host-synchronized stages
with cv2/PIL in between (SURVEY §3.3).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deep_insight_face_tpu.config import Config, default_config
from deep_insight_face_tpu.detector.decode import (
    correct_letterbox_boxes,
    decode_detections,
)
from deep_insight_face_tpu.detector.utility import two_tier_quality
from deep_insight_face_tpu.models.embedding import EmbeddingModel
from deep_insight_face_tpu.models.yolov3 import (
    TINY_ANCHOR_MASKS,
    TINY_FAMILY,
    YoloV3,
    YoloV3Tiny,
    YoloV3TinyMX,
)
from deep_insight_face_tpu.ops.align import (
    ARCFACE_TEMPLATE_112,
    crop_resize_boxes,
    five_from_68,
    umeyama_similarity,
    warp_affine_mxu,
)
from deep_insight_face_tpu.ops.image import letterbox, preprocess
from deep_insight_face_tpu.ops.nms import non_max_suppression_batch


def make_detector_model(det_cfg) -> Tuple[object, Tuple]:
    """(model, anchor_masks) for the configured detector variant."""
    if det_cfg.variant == "tiny":
        return YoloV3Tiny(num_classes=det_cfg.num_classes), TINY_ANCHOR_MASKS
    if det_cfg.variant == "tiny_s2d":
        return (
            YoloV3Tiny(num_classes=det_cfg.num_classes, space_to_depth=True),
            TINY_ANCHOR_MASKS,
        )
    if det_cfg.variant == "tiny_mx":
        return YoloV3TinyMX(num_classes=det_cfg.num_classes), TINY_ANCHOR_MASKS
    return YoloV3(num_classes=det_cfg.num_classes), det_cfg.anchor_masks


class PipelineOutput(NamedTuple):
    embeddings: jnp.ndarray  # (N, D)
    boxes: jnp.ndarray  # (N, 4) selected face box, source pixels
    scores: jnp.ndarray  # (N,) detector confidence
    found: jnp.ndarray  # (N,) bool


def _select_best_box(boxes, scores, valid, image_hw, decision_threshold):
    """Center-weighted selection (area − 2·center_offset²) over valid
    detections, fully vectorized (cf. detector/runner.select_face).

    Two-threshold serving semantics: ``valid`` marks every NMS survivor
    down to the low ``candidate_threshold`` floor, so the crop/embedding
    always comes from the best available candidate box (recall), while
    ``found`` additionally requires the selected box to clear
    ``DetectorConfig.decision_threshold`` so faceless frames keep
    reporting no face (precision; the threshold is the measured operating
    point for the shipped detector — see config.py). Measured on the
    held-out procedural world: candidate floor 0.02 lifts pair-level e2e
    accuracy 0.979 → 0.9985 (TAR@FAR=1e-3 0.913 → 0.994) with the
    faceless found-rate 0 at the decision gate.

    When NO candidate survives at all, the box falls back to a centered
    square over the middle of the frame instead of whatever garbage slot
    argmax lands on: a missed face is usually the central object, so the
    downstream crop+embed degrades gracefully (the embedding of a
    central crop still carries signal; an arbitrary slot is noise).
    ``found`` still reports the miss honestly.
    """
    h, w = image_hw
    # two-tier ranking shared with the per-image API path — see
    # detector.utility.two_tier_quality for the geometry + bump rationale
    quality = two_tier_quality(boxes, scores, valid, (h, w),
                               decision_threshold, xp=jnp)
    i = jnp.argmax(quality)
    has_candidate = valid[i]
    found = has_candidate & (scores[i] >= decision_threshold)
    side = 0.6 * min(h, w)
    fallback = jnp.array(
        [(w - side) / 2, (h - side) / 2, (w + side) / 2, (h + side) / 2],
        jnp.float32,
    )
    box = jnp.where(has_candidate, boxes[i], fallback)
    return box, scores[i], found


def build_pipeline(
    cfg: Config,
    embed_model: Optional[EmbeddingModel],
    detector_model: Optional[YoloV3] = None,
    jit: bool = True,
    align: str = "box",
    landmark_model=None,
    landmark_size: int = 112,
    align_only: bool = False,
    frame_dtype=jnp.float32,
    interp_dtype=jnp.float32,
):
    """Fused detect → (align) → embed program for a fixed (N, H, W, 3)
    geometry.

    ``interp_dtype`` selects the contraction dtype of the separable MXU
    crop/warp interpolation. The default is exact fp32; pass ``jnp.int8``
    for the fast serving configuration (taps quantized to 1/127 —
    measured bit-identical end-to-end quality on the held-out procedural
    world and ~2× faster warps; see docs/PERF.md). api.FaceRecognition
    opts into int8 explicitly via its ``precision="fast"`` default.

    - ``align="box"``: margin-box crop + resize (reference pipeline
      semantics: filter_bounding_box margin crop, detector/run.py:76-88).
      Returns fn(detector_vars, embed_vars, images) → PipelineOutput.
    - ``align="landmark"``: LandmarkNet runs on the margin crop and the
      face is similarity-warped so its 5 points land on the ArcFace
      template (the working version of the reference's disabled
      findLandmarks → create_thumbnail path, api.py:124-145) — all
      inside the same jitted program. Returns
      fn(detector_vars, landmark_vars, embed_vars, images).

    The box crop and the landmark crop both use the separable MXU warp;
    the final similarity warp (rotation ≠ axis-aligned) gathers only
    from the small (landmark_size²) crop, never the full frame.
    """
    det_cfg = cfg.detector
    if detector_model is None:
        detector_model, anchor_masks = make_detector_model(det_cfg)
    else:
        anchor_masks = (
            TINY_ANCHOR_MASKS
            if isinstance(detector_model, TINY_FAMILY)
            else det_cfg.anchor_masks
        )
    if align == "landmark" and landmark_model is None:
        from deep_insight_face_tpu.models.landmark import LandmarkNet

        landmark_model = LandmarkNet()
    anchors = jnp.asarray(np.array(det_cfg.anchors, np.float32))
    out_size = cfg.model.image_size
    tpl_dst = jnp.asarray(ARCFACE_TEMPLATE_112) * (out_size / 112.0)

    def detect_best(detector_vars, x, h, w):
        boxed, meta = letterbox(x, det_cfg.input_size)
        heads = detector_model.apply(detector_vars, boxed / 255.0, train=False)
        raw_boxes, raw_scores = decode_detections(
            heads, anchors, anchor_masks, det_cfg.num_classes,
            det_cfg.input_size,
        )
        face_scores = raw_scores[..., 0]
        # ONE NMS kernel launch with a grid over the batch (the vmapped
        # per-image dispatch was ~1.2 ms of the 14.2 ms serving batch)
        ob, os_, valid = non_max_suppression_batch(
            raw_boxes, face_scores, max_boxes=det_cfg.max_boxes,
            iou_threshold=det_cfg.iou_threshold,
            # NMS floor = candidate threshold (recall); the ``found``
            # decision gate is applied in _select_best_box
            score_threshold=min(det_cfg.candidate_threshold,
                                det_cfg.decision_threshold),
            approx_topk=True,
        )

        def per_image(b, s, v):
            b = correct_letterbox_boxes(b, meta, det_cfg.input_size, (h, w))
            return _select_best_box(b, s, v, (h, w),
                                    det_cfg.decision_threshold)

        return jax.vmap(per_image)(ob, os_, valid)

    def margin_box(box):
        m = float(det_cfg.bbox_margin)
        return jnp.stack(
            [
                box[:, 0] - m / 2,
                box[:, 1] - m / 2,
                box[:, 2] + m / 2,
                box[:, 3] + m / 2,
            ],
            axis=-1,
        )

    if align_only and align != "landmark":
        raise ValueError("align_only requires align='landmark'")

    def embed(embed_vars, crops):
        return embed_model.apply(
            embed_vars, preprocess(crops, cfg.data.preprocess_mode), train=False
        )

    if align == "box":

        def run(detector_vars, embed_vars, images) -> PipelineOutput:
            n, h, w, _ = images.shape
            x = images.astype(frame_dtype)
            box, score, found = detect_best(detector_vars, x, h, w)
            crops = crop_resize_boxes(
                x, margin_box(box), (out_size, out_size),
                # int8 MXU interpolation: the warp weight tensors are the
                # stage's HBM bottleneck (see ops/align.scale_translate_warp)
                dtype=interp_dtype,
            )
            emb = embed(embed_vars, crops)
            return PipelineOutput(
                embeddings=emb, boxes=box, scores=score, found=found
            )

        return jax.jit(run) if jit else run

    if align != "landmark":
        raise ValueError(f"unknown align mode {align!r}")

    ls = landmark_size

    def aligned_crops(detector_vars, landmark_vars, x, h, w):
        box, score, found = detect_best(detector_vars, x, h, w)
        expanded = margin_box(box)
        # landmark stage: separable-warp crop → LandmarkNet → 5 points
        # in crop pixel coords
        crops = crop_resize_boxes(x, expanded, (ls, ls), dtype=interp_dtype)
        lm = landmark_model.apply(
            landmark_vars, preprocess(crops, "tf"), train=False
        )  # (N, 68, 2) normalized to the crop
        five = five_from_68(lm) * ls
        # similarity warp within the small crop only (gathers stay in a
        # ls² window; the separable crop already did the heavy resize)
        mats = jax.vmap(lambda f: umeyama_similarity(f, tpl_dst))(five)
        # MXU two-pass warp: the gather-based warp prices this stage at
        # ~53 ms/batch-128 on TPU (XLA gather); the einsum form is ~10x
        aligned = warp_affine_mxu(crops, mats, (out_size, out_size),
                                  dtype=interp_dtype)
        return aligned, box, score, found

    def run_lm(detector_vars, landmark_vars, embed_vars, images) -> PipelineOutput:
        n, h, w, _ = images.shape
        x = images.astype(frame_dtype)
        aligned, box, score, found = aligned_crops(
            detector_vars, landmark_vars, x, h, w
        )
        emb = embed(embed_vars, aligned)
        return PipelineOutput(
            embeddings=emb, boxes=box, scores=score, found=found
        )

    if align_only:
        def run_align(detector_vars, landmark_vars, images) -> "AlignOutput":
            n, h, w, _ = images.shape
            x = images.astype(frame_dtype)
            aligned, box, score, found = aligned_crops(
                detector_vars, landmark_vars, x, h, w
            )
            return AlignOutput(
                crops=aligned, boxes=box, scores=score, found=found
            )

        return jax.jit(run_align) if jit else run_align

    return jax.jit(run_lm) if jit else run_lm


class AlignOutput(NamedTuple):
    crops: jnp.ndarray  # (N, S, S, 3) float32 aligned face crops, 0..255
    boxes: jnp.ndarray  # (N, 4) selected face box, source pixels
    scores: jnp.ndarray  # (N,) detector confidence
    found: jnp.ndarray  # (N,) bool


def build_align_pipeline(
    cfg: Config,
    detector_model=None,
    landmark_model=None,
    jit: bool = True,
    landmark_size: int = 112,
    interp_dtype=jnp.int8,
):
    """Detect → landmark → similarity-align, WITHOUT the embedder: the
    serving pipeline's crop emitter (raw 0..255 crops, pre-preprocess).

    Exists so training can consume *pipeline-emitted* crops — the exact
    distribution (detector box jitter included) the embedder sees at
    serving time — instead of analytically-aligned renders. Shares every
    stage closure with the serving pipeline (no drift between the two).
    Returns fn(detector_vars, landmark_vars, images) → AlignOutput with
    crops sized (model.image_size)².
    """
    # int8 interpolation by default, on purpose: the shipped embedders
    # were trained on crops emitted through this path and the fast serving
    # tier (api.FaceRecognition precision="fast") warps with int8 too —
    # train-like-you-serve requires the emitter to match the serving warp.
    return build_pipeline(
        cfg, embed_model=None, detector_model=detector_model, jit=jit,
        align="landmark", landmark_model=landmark_model,
        landmark_size=landmark_size, align_only=True,
        interp_dtype=interp_dtype,
    )


class MultiFaceOutput(NamedTuple):
    embeddings: jnp.ndarray  # (N, max_boxes, D)
    boxes: jnp.ndarray  # (N, max_boxes, 4)
    scores: jnp.ndarray  # (N, max_boxes)
    valid: jnp.ndarray  # (N, max_boxes) bool


def build_multiface_pipeline(
    cfg: Config,
    embed_model: EmbeddingModel,
    detector_model: Optional[YoloV3] = None,
    jit: bool = True,
    frame_dtype=jnp.float32,
    interp_dtype=jnp.float32,
    align: str = "box",
    landmark_model=None,
    landmark_size: int = 112,
):
    """All-faces variant: embeds every valid detection (up to
    ``detector.max_boxes`` per image) instead of the single best face —
    the serving path behind api.face_encodings for crowd frames
    (reference intent: detect_multiple_faces=True, detector/run.py:146).
    Invalid slots embed a zero crop; mask with ``valid``.

    ``align="landmark"`` runs the SAME landmark stage as the single-face
    pipeline on every box slot (crop → LandmarkNet → Umeyama similarity →
    MXU warp), flattened to N·max_boxes static shapes, so crowd-frame
    embeddings carry the full serving quality and stay gallery-compatible.
    Returns fn(detector_vars, landmark_vars, embed_vars, images); cost
    scales with max_boxes — size ``DetectorConfig.max_boxes`` to the
    expected crowd, not the default 20, when throughput matters.
    """
    det_cfg = cfg.detector
    if detector_model is None:
        detector_model, anchor_masks = make_detector_model(det_cfg)
    else:
        anchor_masks = (
            TINY_ANCHOR_MASKS
            if isinstance(detector_model, TINY_FAMILY)
            else det_cfg.anchor_masks
        )
    if align == "landmark" and landmark_model is None:
        from deep_insight_face_tpu.models.landmark import LandmarkNet

        landmark_model = LandmarkNet()
    if align not in ("box", "landmark"):
        raise ValueError(f"unknown align mode {align!r}")
    anchors = jnp.asarray(np.array(det_cfg.anchors, np.float32))
    out_size = cfg.model.image_size
    ls = landmark_size
    tpl_dst = jnp.asarray(ARCFACE_TEMPLATE_112) * (out_size / 112.0)
    mb = det_cfg.max_boxes

    def detect_all(detector_vars, x, h, w):
        """Shared detection head: (boxes (N, mb, 4), scores, valid,
        margin-expanded boxes flattened to (N·mb, 4), frames repeated
        per box slot)."""
        boxed, meta = letterbox(x, det_cfg.input_size)
        heads = detector_model.apply(detector_vars, boxed / 255.0, train=False)
        raw_boxes, raw_scores = decode_detections(
            heads, anchors, anchor_masks, det_cfg.num_classes,
            det_cfg.input_size,
        )

        ob, os_, valid = non_max_suppression_batch(
            raw_boxes, raw_scores[..., 0], max_boxes=mb,
            iou_threshold=det_cfg.iou_threshold,
            score_threshold=det_cfg.score_threshold,
            approx_topk=True,
        )
        boxes = jax.vmap(
            lambda bx: correct_letterbox_boxes(
                bx, meta, det_cfg.input_size, (h, w)
            )
        )(ob)

        m = float(det_cfg.bbox_margin)
        expanded = jnp.stack(
            [
                boxes[..., 0] - m / 2,
                boxes[..., 1] - m / 2,
                boxes[..., 2] + m / 2,
                boxes[..., 3] + m / 2,
            ],
            axis=-1,
        )  # (N, mb, 4)
        # flatten faces: repeat each image for its box slots
        imgs_rep = jnp.repeat(x, mb, axis=0)  # (N·mb, H, W, C)
        return boxes, os_, valid, expanded.reshape(-1, 4), imgs_rep

    def run(detector_vars, embed_vars, images) -> MultiFaceOutput:
        n, h, w, _ = images.shape
        x = images.astype(frame_dtype)
        boxes, scores, valid, flat_boxes, imgs_rep = detect_all(
            detector_vars, x, h, w
        )
        crops = crop_resize_boxes(
            imgs_rep, flat_boxes, (out_size, out_size), dtype=interp_dtype
        )
        emb = embed_model.apply(
            embed_vars, preprocess(crops, cfg.data.preprocess_mode), train=False
        )
        return MultiFaceOutput(
            embeddings=emb.reshape(n, mb, -1),
            boxes=boxes,
            scores=scores,
            valid=valid,
        )

    def run_lm(
        detector_vars, landmark_vars, embed_vars, images
    ) -> MultiFaceOutput:
        n, h, w, _ = images.shape
        x = images.astype(frame_dtype)
        boxes, scores, valid, flat_boxes, imgs_rep = detect_all(
            detector_vars, x, h, w
        )
        # identical landmark stage to build_pipeline's aligned_crops,
        # over N·mb flattened slots: crop → LandmarkNet → 5 points →
        # Umeyama similarity → MXU two-pass warp
        crops = crop_resize_boxes(imgs_rep, flat_boxes, (ls, ls),
                                  dtype=interp_dtype)
        lm = landmark_model.apply(
            landmark_vars, preprocess(crops, "tf"), train=False
        )
        five = five_from_68(lm) * ls
        mats = jax.vmap(lambda f: umeyama_similarity(f, tpl_dst))(five)
        aligned = warp_affine_mxu(crops, mats, (out_size, out_size),
                                  dtype=interp_dtype)
        emb = embed_model.apply(
            embed_vars, preprocess(aligned, cfg.data.preprocess_mode),
            train=False,
        )
        return MultiFaceOutput(
            embeddings=emb.reshape(n, mb, -1),
            boxes=boxes,
            scores=scores,
            valid=valid,
        )

    fn = run_lm if align == "landmark" else run
    return jax.jit(fn) if jit else fn


def build_benchmark_fn(
    cfg: Config,
    embed_model: EmbeddingModel,
    detector_model: Optional[YoloV3] = None,
    iters: int = 4,
    align: str = "box",
    landmark_model=None,
    frame_dtype=jnp.float32,
    interp_dtype=jnp.float32,
):
    """One jitted program running ``iters`` chained pipeline steps.

    Each step's input depends on the previous step's output (a tiny
    embedding-derived perturbation), which (a) forces truly sequential
    execution of every iteration and (b) defeats any value-level result
    caching between host and device — wall time / iters is the honest
    steady-state batch latency. Keep ``iters`` small (the chain is
    unrolled here — scan-of-pipeline compiles pathologically slowly on
    the remote TPU toolchain) and amortize host round-trips by calling
    the returned fn with several distinct inputs.

    Returns fn(variables, images) with ``variables`` a dict holding
    "detector", "embed" and (align="landmark") "landmark" var trees.
    """
    run = build_pipeline(
        cfg, embed_model, detector_model, jit=False,
        align=align, landmark_model=landmark_model,
        frame_dtype=frame_dtype, interp_dtype=interp_dtype,
    )

    @jax.jit
    def bench(variables, images, perturb=0.0):
        total = jnp.float32(0.0)
        # unique-input perturbation rides INSIDE the program as a scalar
        # (an eager device add in the caller's timed loop costs a full
        # tunnel round trip per call)
        imgs = images + jnp.asarray(perturb, images.dtype)
        for _ in range(iters):
            if align == "landmark":
                out = run(variables["detector"], variables["landmark"],
                          variables["embed"], imgs)
            else:
                out = run(variables["detector"], variables["embed"], imgs)
            eps = jnp.sum(out.embeddings) * 1e-12 + jnp.sum(out.boxes) * 1e-12
            imgs = imgs + eps.astype(imgs.dtype)
            # embeddings feed the result so no stage is dead even on the
            # final step
            total = total + jnp.sum(out.scores) + jnp.sum(out.embeddings)
        return total

    return bench
