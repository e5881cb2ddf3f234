"""Fused pipeline tests (CPU, small geometry, tiny detector)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep_insight_face_tpu.config import (
    Config,
    DataConfig,
    DetectorConfig,
    ModelConfig,
)
from deep_insight_face_tpu.models import build_embedding_model, init_embedding_params
from deep_insight_face_tpu.pipeline import (
    build_benchmark_fn,
    build_pipeline,
    make_detector_model,
)


@pytest.fixture(scope="module")
def small_cfg():
    return Config(
        model=ModelConfig(backbone="mobilenetv2", head="gdc", embedding_size=16,
                          image_size=32, compute_dtype="float32",
                          width_multiplier=0.35),
        detector=DetectorConfig(variant="tiny", input_size=128,
                                score_threshold=0.0,
                                decision_threshold=0.0),
        data=DataConfig(preprocess_mode="tf"),
    )


@pytest.fixture(scope="module")
def pipeline_setup(small_cfg):
    em = build_embedding_model(small_cfg.model)
    ev = init_embedding_params(em, jax.random.key(0), small_cfg.model.image_size)
    dm, _ = make_detector_model(small_cfg.detector)
    dv = dm.init(jax.random.key(1), jnp.zeros((1, 128, 128, 3)))
    return em, ev, dm, dv


def test_make_detector_model_variants():
    from deep_insight_face_tpu.models.yolov3 import (
        TINY_ANCHOR_MASKS, YoloV3, YoloV3Tiny,
    )

    tiny, masks = make_detector_model(DetectorConfig(variant="tiny"))
    assert isinstance(tiny, YoloV3Tiny) and masks == TINY_ANCHOR_MASKS
    full, masks_f = make_detector_model(DetectorConfig(variant="full"))
    assert isinstance(full, YoloV3) and len(masks_f) == 3


def test_pipeline_shapes_and_finiteness(small_cfg, pipeline_setup, rng):
    em, ev, dm, dv = pipeline_setup
    run = build_pipeline(small_cfg, em, dm)
    imgs = jnp.asarray(rng.integers(0, 255, (2, 96, 96, 3), dtype=np.uint8))
    out = run(dv, ev, imgs)
    assert out.embeddings.shape == (2, 16)
    assert out.boxes.shape == (2, 4)
    assert out.scores.shape == (2,)
    assert np.isfinite(np.asarray(out.embeddings)).all()
    # embeddings l2-normalized
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out.embeddings), axis=1), 1.0, atol=1e-4
    )
    # boxes inside the source image
    b = np.asarray(out.boxes)
    assert (b[:, 0] >= 0).all() and (b[:, 2] <= 96).all()
    assert (b[:, 1] >= 0).all() and (b[:, 3] <= 96).all()


def test_benchmark_fn_runs(small_cfg, pipeline_setup, rng):
    em, ev, dm, dv = pipeline_setup
    bench = build_benchmark_fn(small_cfg, em, dm, iters=2)
    imgs = jnp.asarray(
        rng.integers(0, 255, (2, 96, 96, 3), dtype=np.uint8)
    ).astype(jnp.float32)
    out = float(bench({"detector": dv, "embed": ev}, imgs))
    assert np.isfinite(out)


def test_landmark_aligned_pipeline(small_cfg, pipeline_setup, rng):
    from deep_insight_face_tpu.models.landmark import LandmarkNet

    em, ev, dm, dv = pipeline_setup
    lm_model = LandmarkNet(width=0.25, dtype=jnp.float32)
    lv = lm_model.init(jax.random.key(2), jnp.zeros((1, 48, 48, 3)))
    run = build_pipeline(small_cfg, em, dm, align="landmark",
                         landmark_model=lm_model, landmark_size=48)
    imgs = jnp.asarray(rng.integers(0, 255, (2, 96, 96, 3), dtype=np.uint8))
    out = run(dv, lv, ev, imgs)
    assert out.embeddings.shape == (2, 16)
    assert np.isfinite(np.asarray(out.embeddings)).all()
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out.embeddings), axis=1), 1.0, atol=1e-4
    )
    # benchmark variant with the landmark stage fused in
    bench = build_benchmark_fn(small_cfg, em, dm, iters=2, align="landmark",
                               landmark_model=lm_model)
    val = float(bench(
        {"detector": dv, "landmark": lv, "embed": ev},
        imgs.astype(jnp.float32),
    ))
    assert np.isfinite(val)


def test_multiface_pipeline(small_cfg, pipeline_setup, rng):
    from deep_insight_face_tpu.pipeline import build_multiface_pipeline

    em, ev, dm, dv = pipeline_setup
    run = build_multiface_pipeline(small_cfg, em, dm)
    imgs = jnp.asarray(rng.integers(0, 255, (2, 96, 96, 3), dtype=np.uint8))
    out = run(dv, ev, imgs)
    mb = small_cfg.detector.max_boxes
    assert out.embeddings.shape == (2, mb, 16)
    assert out.boxes.shape == (2, mb, 4)
    assert out.valid.shape == (2, mb)
    assert np.isfinite(np.asarray(out.embeddings)).all()


def test_multiface_landmark_pipeline(small_cfg, pipeline_setup, rng):
    """Landmark-aligned multiface path: every box slot goes through the
    SAME crop → LandmarkNet → Umeyama → MXU-warp stage as the single-face
    pipeline, so crowd embeddings stay gallery-compatible."""
    from deep_insight_face_tpu.models.landmark import LandmarkNet
    from deep_insight_face_tpu.pipeline import build_multiface_pipeline

    em, ev, dm, dv = pipeline_setup
    lm_model = LandmarkNet(width=0.25, dtype=jnp.float32)
    lv = lm_model.init(jax.random.key(2), jnp.zeros((1, 48, 48, 3)))
    run = build_multiface_pipeline(
        small_cfg, em, dm, align="landmark", landmark_model=lm_model,
        landmark_size=48,
    )
    imgs = jnp.asarray(rng.integers(0, 255, (2, 96, 96, 3), dtype=np.uint8))
    out = run(dv, lv, ev, imgs)
    mb = small_cfg.detector.max_boxes
    assert out.embeddings.shape == (2, mb, 16)
    assert out.boxes.shape == (2, mb, 4)
    assert np.isfinite(np.asarray(out.embeddings)).all()
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out.embeddings), axis=2), 1.0, atol=1e-4
    )
    with pytest.raises(ValueError):
        build_multiface_pipeline(small_cfg, em, dm, align="nope")


def test_tiny_s2d_variant(rng):
    from deep_insight_face_tpu.models.yolov3 import YoloV3Tiny

    tiny_s2d, masks = make_detector_model(DetectorConfig(variant="tiny_s2d"))
    assert isinstance(tiny_s2d, YoloV3Tiny) and tiny_s2d.space_to_depth
    m = YoloV3Tiny(num_classes=1, space_to_depth=True, dtype=jnp.float32)
    v = m.init(jax.random.key(0), jnp.zeros((1, 128, 128, 3)))
    h13, h26 = m.apply(v, jnp.zeros((2, 128, 128, 3)))
    # same head geometry as the standard tiny model
    assert h13.shape == (2, 4, 4, 18)
    assert h26.shape == (2, 8, 8, 18)


def test_align_pipeline_matches_serving_pipeline(rng):
    """build_align_pipeline's crops are EXACTLY what the serving landmark
    pipeline feeds the embedder: embedding its crops reproduces the
    pipeline embeddings bit-for-bit (shared stage closures, no drift)."""
    import dataclasses

    import jax

    from deep_insight_face_tpu.config import default_config
    from deep_insight_face_tpu.models import (
        build_embedding_model, init_embedding_params,
    )
    from deep_insight_face_tpu.models.landmark import LandmarkNet
    from deep_insight_face_tpu.ops.image import preprocess as pre
    from deep_insight_face_tpu.pipeline import (
        build_align_pipeline, build_pipeline, make_detector_model,
    )

    cfg = default_config()
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model, backbone="mobilenetv2", image_size=32,
            width_multiplier=0.35, compute_dtype="float32",
        ),
        detector=dataclasses.replace(
            cfg.detector, variant="tiny_s2d", input_size=64,
        ),
    )
    em = build_embedding_model(cfg.model)
    ev = init_embedding_params(em, jax.random.key(0), cfg.model.image_size)
    dm, _ = make_detector_model(cfg.detector)
    dv = dm.init(jax.random.key(1), jnp.zeros((1, 64, 64, 3)))
    lm = LandmarkNet()
    lv = lm.init(jax.random.key(2), jnp.zeros((1, 112, 112, 3)))

    imgs = jnp.asarray(
        rng.integers(0, 255, (2, 64, 64, 3)).astype(np.float32)
    )
    # match numerics: the align emitter defaults to int8 interpolation
    # (train-like-you-serve, fast serving tier), so build the serving
    # pipeline with the same interp for the crop↔embedding equivalence
    serve = build_pipeline(cfg, em, dm, align="landmark", landmark_model=lm,
                           interp_dtype=jnp.int8)
    align = build_align_pipeline(cfg, dm, landmark_model=lm)

    out = serve(dv, lv, ev, imgs)
    a = align(dv, lv, imgs)
    assert a.crops.shape == (2, 32, 32, 3)
    np.testing.assert_array_equal(np.asarray(a.boxes), np.asarray(out.boxes))
    emb_from_crops = em.apply(
        ev, pre(a.crops, cfg.data.preprocess_mode), train=False
    )
    np.testing.assert_allclose(
        np.asarray(emb_from_crops), np.asarray(out.embeddings), atol=1e-6
    )


def test_two_threshold_select_best_box():
    """Candidate floor feeds the crop; ``found`` stays decision-gated.

    The serving pipelines keep NMS survivors down to
    DetectorConfig.candidate_threshold so a hard-pose face still yields
    the best possible crop, while ``found`` requires the decision
    threshold (reference score_threshold semantics on faceless frames).
    """
    from deep_insight_face_tpu.pipeline import _select_best_box

    boxes = jnp.asarray(
        [[10.0, 10.0, 50.0, 50.0], [0.0, 0.0, 4.0, 4.0]], jnp.float32
    )
    # confident candidate: crop from it, found=True
    box, score, found = _select_best_box(
        boxes, jnp.asarray([0.9, 0.1]), jnp.asarray([True, True]),
        (64, 64), 0.4,
    )
    assert bool(found) and float(score) == pytest.approx(0.9)
    np.testing.assert_allclose(np.asarray(box), boxes[0])

    # low-confidence candidate only: crop STILL from the candidate box
    # (recall), but found=False (precision)
    box, score, found = _select_best_box(
        boxes, jnp.asarray([0.05, 0.01]), jnp.asarray([True, False]),
        (64, 64), 0.4,
    )
    assert not bool(found)
    np.testing.assert_allclose(np.asarray(box), boxes[0])

    # no candidate at all: centered fallback square, found=False
    box, _, found = _select_best_box(
        boxes, jnp.asarray([0.0, 0.0]), jnp.asarray([False, False]),
        (64, 64), 0.4,
    )
    assert not bool(found)
    side = 0.6 * 64
    np.testing.assert_allclose(
        np.asarray(box),
        [(64 - side) / 2, (64 - side) / 2, (64 + side) / 2, (64 + side) / 2],
    )


def test_faceless_frames_report_no_face():
    """Precision side of the two-threshold design: frames with no face
    (blank, and distractor clutter without a face) must report
    found=False through the serving pipeline, even though the candidate
    floor keeps low-score NMS survivors for the crop."""
    import dataclasses

    from deep_insight_face_tpu.config import default_config
    from deep_insight_face_tpu.models import build_embedding_model
    from deep_insight_face_tpu.pipeline import build_pipeline, make_detector_model
    from deep_insight_face_tpu.utils import pretrained

    cfg = default_config()
    # load the weights matching the serving-default variant so this
    # gates whatever configuration a bare FaceRecognition() serves
    det_vars = pretrained.load_detector_variables(cfg.detector.variant, 416)
    if det_vars is None:
        pytest.skip("shipped detector weights not present")
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, backbone="mobilenetv2"))
    em = build_embedding_model(cfg.model)
    dm, _ = make_detector_model(cfg.detector)
    ev = em.init(jax.random.key(0), jnp.zeros((1, 112, 112, 3)))
    run = build_pipeline(cfg, em, dm, align="box")

    rng_np = np.random.default_rng(3)
    blank = np.zeros((416, 416, 3), np.float32)
    noise = rng_np.uniform(0, 255, (416, 416, 3)).astype(np.float32)
    clutter = np.zeros((416, 416, 3), np.float32)
    for _ in range(8):  # distractor rectangles, no face
        cx, cy = rng_np.integers(40, 376, 2)
        hw = rng_np.integers(10, 60, 2)
        clutter[cy - hw[0] // 2:cy + hw[0] // 2,
                cx - hw[1] // 2:cx + hw[1] // 2] = rng_np.uniform(0, 255, 3)
    batch = jnp.asarray(np.stack([blank, noise, clutter]))
    out = run(det_vars, ev, batch)
    assert not bool(np.asarray(out.found).any()), (
        f"faceless frames reported found={np.asarray(out.found)} "
        f"scores={np.asarray(out.scores)}"
    )


def test_confident_candidate_outranks_centered_clutter():
    """Two-tier selection: a confident off-center face must beat a
    centered low-score candidate admitted by the 0.02 floor — geometry
    breaks ties only WITHIN a confidence tier."""
    from deep_insight_face_tpu.pipeline import _select_best_box

    # centered 100² clutter box (geometry winner) vs 120² face 100 px
    # off-center at score 0.9
    clutter = [158.0, 158.0, 258.0, 258.0]
    face = [258.0, 148.0, 378.0, 268.0]
    boxes = jnp.asarray([clutter, face], jnp.float32)
    box, score, found = _select_best_box(
        boxes, jnp.asarray([0.03, 0.9]), jnp.asarray([True, True]),
        (416, 416), 0.1,
    )
    assert bool(found) and float(score) == pytest.approx(0.9)
    np.testing.assert_allclose(np.asarray(box), face)

    # with NO confident candidate, geometry picks the centered one and
    # found stays False
    box, score, found = _select_best_box(
        boxes, jnp.asarray([0.03, 0.05]), jnp.asarray([True, True]),
        (416, 416), 0.1,
    )
    assert not bool(found)
    np.testing.assert_allclose(np.asarray(box), clutter)


def test_tie_break_keeps_float32_precision_between_confident_boxes():
    """Regression: the confident-tier bump must not quantize the
    geometry tie-break. With a 1e9 bump, float32 addition rounds geom
    to multiples of 64, so two confident candidates whose
    area/centering scores differ by < 64 px² collapsed to the same
    quality and argmax fell back to index order."""
    from deep_insight_face_tpu.pipeline import _select_best_box

    # both confident; box B is ~8 px² larger at near-identical
    # centering — a sub-64 px² difference the old 1e9 bump erased
    a = [100.0, 100.0, 200.0, 200.0]     # area 10000, centered after shift
    b = [99.92, 100.0, 200.0, 200.0]     # area 10008, center off by .04 px
    # shift both so box A sits exactly on the 416² frame center
    boxes = jnp.asarray([a, b], jnp.float32) + jnp.asarray(
        [58.0, 58.0, 58.0, 58.0], jnp.float32
    )
    box, score, found = _select_best_box(
        boxes, jnp.asarray([0.9, 0.9]), jnp.asarray([True, True]),
        (416, 416), 0.1,
    )
    assert bool(found)
    np.testing.assert_allclose(np.asarray(box), np.asarray(boxes[1]))


def test_api_precision_knob(small_cfg):
    """FaceRecognition(precision=…) — 'fast' (default) selects the
    benchmarked bf16-frame/int8-interp serving numerics, 'exact' fp32
    (ADVICE r3: int8 must be an explicit opt-in, never a silent builder
    default)."""
    from deep_insight_face_tpu.api import FaceRecognition

    fr = FaceRecognition(cfg=small_cfg, landmark_variables=False)
    assert fr.precision == "fast"
    assert fr._pipeline_dtypes["interp_dtype"] == jnp.int8
    assert fr._pipeline_dtypes["frame_dtype"] == jnp.bfloat16

    fr = FaceRecognition(cfg=small_cfg, landmark_variables=False,
                         precision="exact")
    assert fr._pipeline_dtypes["interp_dtype"] == jnp.float32
    assert fr._pipeline_dtypes["frame_dtype"] == jnp.float32

    with pytest.raises(ValueError, match="precision"):
        FaceRecognition(cfg=small_cfg, precision="int8")


def test_builders_default_fp32_interp():
    """The raw pipeline builders must default to exact fp32 interpolation
    (quantized warps are a serving opt-in, not a library default)."""
    import inspect

    from deep_insight_face_tpu.pipeline import (
        build_benchmark_fn, build_multiface_pipeline,
    )

    for fn in (build_pipeline, build_multiface_pipeline, build_benchmark_fn):
        assert inspect.signature(fn).parameters["interp_dtype"].default \
            == jnp.float32, fn.__name__
