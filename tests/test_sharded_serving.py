"""Data-parallel serving on the 8-device virtual CPU mesh.

Validates parallel/serve.build_sharded_pipeline: the shard_map-wrapped
pipeline compiles, executes, and produces the SAME outputs as the
single-device program (pure DP with replicated weights is math-identical
per frame — any divergence is a sharding bug, not arithmetic).
"""

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
from deep_insight_face_tpu.models import (
    build_embedding_model,
    init_embedding_params,
)
from deep_insight_face_tpu.parallel.mesh import create_mesh
from deep_insight_face_tpu.parallel.serve import (
    build_sharded_pipeline,
    shard_frames,
)
from deep_insight_face_tpu.pipeline import (
    build_multiface_pipeline,
    build_pipeline,
    make_detector_model,
)


@pytest.fixture(scope="module")
def small_cfg():
    return Config(
        model=ModelConfig(backbone="mobilenetv2", head="gdc",
                          embedding_size=16, image_size=32,
                          compute_dtype="float32", width_multiplier=0.35),
        detector=DetectorConfig(variant="tiny", input_size=128,
                                score_threshold=0.0,
                                decision_threshold=0.0),
        data=DataConfig(preprocess_mode="tf"),
    )


@pytest.fixture(scope="module")
def setup(small_cfg):
    em = build_embedding_model(small_cfg.model)
    ev = init_embedding_params(em, jax.random.key(0),
                               small_cfg.model.image_size)
    dm, _ = make_detector_model(small_cfg.detector)
    dv = dm.init(jax.random.key(1), jnp.zeros((1, 128, 128, 3)))
    return em, ev, dm, dv


def _frames(rng, n=8):
    return jnp.asarray(rng.integers(0, 255, (n, 96, 96, 3), dtype=np.uint8))


def test_sharded_matches_single_device(small_cfg, setup, rng):
    em, ev, dm, dv = setup
    mesh = create_mesh()  # 8×1 data mesh on the virtual CPU devices
    sharded = build_sharded_pipeline(small_cfg, em, mesh, detector_model=dm)
    single = build_pipeline(small_cfg, em, dm)
    imgs = _frames(rng)
    out_s = sharded(dv, ev, shard_frames(imgs, mesh))
    out_1 = single(dv, ev, imgs)
    # outputs live sharded over the data axis
    assert len(out_s.embeddings.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out_s.embeddings),
                               np.asarray(out_1.embeddings),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_s.boxes),
                               np.asarray(out_1.boxes), atol=1e-3)
    assert (np.asarray(out_s.found) == np.asarray(out_1.found)).all()


def test_sharded_landmark_align(small_cfg, setup, rng):
    from deep_insight_face_tpu.models.landmark import LandmarkNet

    em, ev, dm, dv = setup
    lm_model = LandmarkNet(width=0.25, dtype=jnp.float32)
    lv = lm_model.init(jax.random.key(2), jnp.zeros((1, 48, 48, 3)))
    from deep_insight_face_tpu.config import MeshConfig

    mesh = create_mesh(MeshConfig(model_parallel=2))  # 4×2: DP with replicas
    sharded = build_sharded_pipeline(
        small_cfg, em, mesh, detector_model=dm, align="landmark",
        landmark_model=lm_model, landmark_size=48,
    )
    single = build_pipeline(small_cfg, em, dm, align="landmark",
                            landmark_model=lm_model, landmark_size=48)
    imgs = _frames(rng)
    out_s = sharded(dv, lv, ev, shard_frames(imgs, mesh))
    out_1 = single(dv, lv, ev, imgs)
    # The landmark path runs a Umeyama solve whose output feeds a warp —
    # fp32 reassociation differences between the per-shard (N/dp) and
    # full-batch XLA fusions amplify to ~5e-4 in the embeddings, so
    # compare direction (the served quantity) rather than exact values.
    e_s = np.asarray(out_s.embeddings, dtype=np.float64)
    e_1 = np.asarray(out_1.embeddings, dtype=np.float64)
    cos = (e_s * e_1).sum(-1) / (
        np.linalg.norm(e_s, axis=-1) * np.linalg.norm(e_1, axis=-1)
    )
    assert cos.min() > 0.99999, cos.min()


def test_sharded_multiface(small_cfg, setup, rng):
    em, ev, dm, dv = setup
    mesh = create_mesh()
    sharded = build_sharded_pipeline(small_cfg, em, mesh, detector_model=dm,
                                     multiface=True)
    single = build_multiface_pipeline(small_cfg, em, dm)
    imgs = _frames(rng)
    out_s = sharded(dv, ev, shard_frames(imgs, mesh))
    out_1 = single(dv, ev, imgs)
    assert out_s.embeddings.shape == out_1.embeddings.shape
    np.testing.assert_allclose(np.asarray(out_s.embeddings),
                               np.asarray(out_1.embeddings),
                               rtol=0, atol=2e-5)
    assert (np.asarray(out_s.valid) == np.asarray(out_1.valid)).all()


def test_sharded_multiface_landmark(small_cfg, setup, rng):
    from deep_insight_face_tpu.models.landmark import LandmarkNet

    em, ev, dm, dv = setup
    lm_model = LandmarkNet(width=0.25, dtype=jnp.float32)
    lv = lm_model.init(jax.random.key(2), jnp.zeros((1, 48, 48, 3)))
    mesh = create_mesh()
    sharded = build_sharded_pipeline(
        small_cfg, em, mesh, detector_model=dm, multiface=True,
        align="landmark", landmark_model=lm_model, landmark_size=48,
    )
    single = build_multiface_pipeline(
        small_cfg, em, dm, align="landmark", landmark_model=lm_model,
        landmark_size=48,
    )
    imgs = _frames(rng)
    out_s = sharded(dv, lv, ev, shard_frames(imgs, mesh))
    out_1 = single(dv, lv, ev, imgs)
    assert out_s.embeddings.shape == out_1.embeddings.shape
    # direction comparison (see test_sharded_landmark_align for why)
    e_s = np.asarray(out_s.embeddings, dtype=np.float64)
    e_1 = np.asarray(out_1.embeddings, dtype=np.float64)
    cos = (e_s * e_1).sum(-1) / (
        np.linalg.norm(e_s, axis=-1) * np.linalg.norm(e_1, axis=-1)
    )
    assert cos.min() > 0.99999, cos.min()
    assert (np.asarray(out_s.valid) == np.asarray(out_1.valid)).all()


def test_sharded_pipeline_feeds_sharded_gallery(small_cfg, setup, rng):
    """Device-to-device serving: pipeline embeddings (sharded over data)
    flow straight into FaceGallery(mesh=…).identify — queries already
    carry the data-axis sharding the sharded match kernel expects, so
    no host round-trip between detection and identification."""
    from deep_insight_face_tpu.gallery import FaceGallery

    em, ev, dm, dv = setup
    mesh = create_mesh()
    sharded = build_sharded_pipeline(small_cfg, em, mesh, detector_model=dm)
    imgs = _frames(rng)
    out = sharded(dv, ev, shard_frames(imgs, mesh))

    gal = FaceGallery(embedding_size=small_cfg.model.embedding_size,
                      mesh=mesh)
    gal.add_batch([f"id{i}" for i in range(8)], np.asarray(out.embeddings))
    # identify the still-sharded device output: every query self-matches
    names, scores = gal.identify(out.embeddings)
    assert names == [f"id{i}" for i in range(8)]
    assert scores.min() > 0.999


def test_api_mesh_serving(small_cfg, setup, rng):
    """FaceRecognition(mesh=…) routes face_encodings_batch through the
    sharded pipeline and matches the single-device facade."""
    from deep_insight_face_tpu.api import FaceRecognition

    em, ev, dm, dv = setup
    mesh = create_mesh()
    kw = dict(cfg=small_cfg, embed_variables=ev, detector_variables=dv,
              landmark_variables=False)  # box path: cheap CPU compile
    fr_mesh = FaceRecognition(mesh=mesh, **kw)
    fr_one = FaceRecognition(**kw)
    imgs = np.asarray(_frames(rng))
    emb_s, boxes_s, found_s = fr_mesh.face_encodings_batch(imgs)
    emb_1, boxes_1, found_1 = fr_one.face_encodings_batch(imgs)
    np.testing.assert_allclose(emb_s, emb_1, rtol=0, atol=2e-5)
    assert (found_s == found_1).all()
    with pytest.raises(ValueError, match="not divisible"):
        fr_mesh.face_encodings_batch(imgs[:6])


def test_serve_stream_matches_direct_calls(small_cfg, setup, rng):
    """serve_stream yields the same outputs, in order, as direct calls —
    on both the single-device and sharded pipelines — and propagates
    staging errors."""
    from deep_insight_face_tpu.parallel.serve import serve_stream

    em, ev, dm, dv = setup
    mesh = create_mesh()
    sharded = build_sharded_pipeline(small_cfg, em, mesh, detector_model=dm)
    single = build_pipeline(small_cfg, em, dm)
    batches = [np.asarray(_frames(rng)) for _ in range(3)]

    for fn, kw in ((single, {}), (sharded, {"mesh": mesh})):
        outs = list(serve_stream(fn, (dv, ev), iter(batches), **kw))
        assert len(outs) == 3
        for got, b in zip(outs, batches):
            want = single(dv, ev, jnp.asarray(b))
            np.testing.assert_allclose(np.asarray(got.embeddings),
                                       np.asarray(want.embeddings),
                                       rtol=0, atol=2e-5)

    def bad_batches():
        yield batches[0]
        raise OSError("decode failed")

    stream = serve_stream(single, (dv, ev), bad_batches())
    next(stream)
    with pytest.raises(RuntimeError, match="staging failed"):
        list(stream)


def test_serve_stream_abandonment_stops_staging(small_cfg, setup, rng):
    """Closing the stream early must cancel the staging thread — it
    would otherwise block forever on q.put holding device-resident
    batches (leaked thread + pinned memory per abandoned stream)."""
    import time

    from deep_insight_face_tpu.parallel.serve import serve_stream

    em, ev, dm, dv = setup
    single = build_pipeline(small_cfg, em, dm)
    frames = np.asarray(_frames(rng))
    state = {"count": 0}

    def many_batches():
        for _ in range(50):
            state["count"] += 1
            yield frames

    stream = serve_stream(single, (dv, ev), many_batches(), depth=2)
    next(stream)
    stream.close()  # consumer abandons after one batch
    time.sleep(1.0)
    c1 = state["count"]
    time.sleep(0.5)
    assert state["count"] == c1, "staging kept running after close"
    assert state["count"] < 50, "staging consumed the whole iterator"


def test_indivisible_batch_raises(small_cfg, setup, rng):
    em, ev, dm, dv = setup
    mesh = create_mesh()
    sharded = build_sharded_pipeline(small_cfg, em, mesh, detector_model=dm)
    with pytest.raises(ValueError, match="not divisible"):
        sharded(dv, ev, _frames(rng, n=6))
