"""Gallery, one-shot eval, and API helper tests."""

import numpy as np
import pytest

from deep_insight_face_tpu import api as API
from deep_insight_face_tpu import oneshot as O
from deep_insight_face_tpu.data.dataset import IdentityClass
from deep_insight_face_tpu.gallery import FaceGallery


def _emb(rng, d=64):
    v = rng.normal(size=d).astype(np.float32)
    return v / np.linalg.norm(v)


def test_gallery_enroll_identify(rng):
    g = FaceGallery(embedding_size=64)
    people = {name: _emb(rng) for name in ["alice", "bob", "carol"]}
    for n, e in people.items():
        g.add(n, e)
    assert len(g) == 3
    names, scores = g.identify(np.stack([people["bob"], people["alice"]]))
    assert names == ["bob", "alice"]
    np.testing.assert_allclose(scores, 1.0, atol=1e-5)


def test_gallery_verify(rng):
    g = FaceGallery(embedding_size=64)
    e = _emb(rng)
    g.add("alice", e)
    ok, dist = g.verify(e + rng.normal(scale=0.01, size=64).astype(np.float32), "alice")
    assert ok and dist < 0.2
    bad, dist2 = g.verify(_emb(rng), "alice", threshold=0.7)
    assert dist2 > dist
    with pytest.raises(KeyError):
        g.verify(e, "nobody")


def test_gallery_dim_check(rng):
    g = FaceGallery(embedding_size=8)
    with pytest.raises(ValueError):
        g.add("x", np.zeros(16))
    with pytest.raises(ValueError):
        g.identify(np.zeros((1, 8)))  # empty gallery


def test_gallery_save_load(tmp_path, rng):
    g = FaceGallery(embedding_size=16)
    g.add("a", _emb(rng, 16))
    g.add("b", _emb(rng, 16))
    g.save(tmp_path / "g.npz")
    g2 = FaceGallery.load(tmp_path / "g.npz")
    assert g2.names == ["a", "b"]
    names, _ = g2.identify(g2._host())
    assert names == ["a", "b"]


def _fake_classes(tmp_path, rng, n_ids=6, imgs=3):
    classes = []
    for i in range(n_ids):
        paths = tuple(f"/fake/id{i}/img{j}.jpg" for j in range(imgs))
        classes.append(IdentityClass(f"id{i}", paths))
    return classes


def test_make_oneshot_task(tmp_path, rng):
    classes = _fake_classes(tmp_path, rng)
    task = O.make_oneshot_task(classes, n_way=4, rng=np.random.default_rng(0))
    assert len(task.support_paths) == 4
    # query and genuine support come from the same identity folder
    qdir = task.query_path.rsplit("/", 1)[0]
    assert task.support_paths[0].rsplit("/", 1)[0] == qdir
    assert task.query_path != task.support_paths[0]
    for p in task.support_paths[1:]:
        assert p.rsplit("/", 1)[0] != qdir


def test_evaluate_oneshot_with_perfect_embedder(tmp_path, rng):
    classes = _fake_classes(tmp_path, rng)
    # embedder: identity-determined embedding → model should be perfect
    def embed(paths):
        out = []
        for p in paths:
            ident = int(p.split("id")[-1].split("/")[0])
            v = np.zeros(8)
            v[ident] = 1.0
            out.append(v)
        return np.stack(out)

    acc = O.evaluate_oneshot(embed, classes, n_way=4, k_tasks=20, seed=1)
    assert acc == 1.0
    # embed doubles as the pixel loader (fake paths never hit disk)
    base = O.nearest_neighbour_baseline(embed, classes, 4, 10, load_paths=embed)
    assert base["random"] == 0.25
    assert base["pixel_nn"] == 1.0  # identity-determined "pixels"


def test_pixel_nn_baseline_and_sweep(tmp_path, rng):
    classes = _fake_classes(tmp_path, rng, n_ids=8)

    def ident_of(p):
        return int(p.split("id")[-1].split("/")[0])

    def pixels(paths):
        # pixel loader: identity-determined image + per-image noise
        g = np.random.default_rng(0)
        return np.stack([
            np.full((4, 4, 3), ident_of(p), np.float32)
            + g.normal(0, 0.01, (4, 4, 3))
            for p in paths
        ])

    def embed(paths):
        out = np.zeros((len(paths), 8))
        for i, p in enumerate(paths):
            out[i, ident_of(p)] = 1.0
        return out

    nn = O.pixel_nearest_neighbour_oneshot(pixels, classes, 4, 20, seed=3)
    assert nn == 1.0  # identity-separable pixels → NN perfect

    def bad_pixels(paths):
        g = np.random.default_rng(1)
        return g.normal(size=(len(paths), 4, 4, 3))

    nn_bad = O.pixel_nearest_neighbour_oneshot(bad_pixels, classes, 4, 50, seed=3)
    assert nn_bad < 0.6  # uninformative pixels → near chance

    sweep = O.oneshot_sweep(
        embed, classes, ways=(2, 4, 20), k_tasks=10, load_paths=pixels
    )
    assert set(sweep) == {2, 4}  # 20-way impossible with 8 ids
    assert sweep[4]["model"] == 1.0
    assert sweep[4]["random"] == 0.25

    from deep_insight_face_tpu.visualizations.plot import oneshot_sweep_plot

    out = oneshot_sweep_plot(sweep, str(tmp_path / "sweep.png"))
    import os

    assert os.path.exists(out)


def test_oneshot_trainer_validator(tmp_path):
    """make_trainer_validator: runs after each epoch, logs oneshot_acc,
    saves best weights (reference intent: oneshot.py:88-107)."""
    import jax

    from deep_insight_face_tpu.config import (
        Config, DataConfig, MeshConfig, ModelConfig, TrainConfig,
    )
    from deep_insight_face_tpu.data.dataset import get_dataset
    from deep_insight_face_tpu.data.synthetic import identity_directory
    from deep_insight_face_tpu.training.trainer import Trainer

    identity_directory(str(tmp_path / "val"), n_ids=5, per_id=3, size=32)
    classes = get_dataset(str(tmp_path / "val"))

    cfg = Config(
        model=ModelConfig(backbone="mobilenetv2", head="gdc",
                          embedding_size=16, image_size=32,
                          compute_dtype="float32", width_multiplier=0.35),
        data=DataConfig(batch_size=4),
        train=TrainConfig(mode="arcface", num_classes=5, epochs=1,
                          steps_per_epoch=1,
                          checkpoint_dir=str(tmp_path / "ck")),
        mesh=MeshConfig(),
    )
    trainer = Trainer(cfg, log_dir=str(tmp_path / "logs"))
    state = trainer.init_state(resume=False)
    save_path = str(tmp_path / "best.npz")
    hook = O.make_trainer_validator(
        trainer, classes, n_way=3, k_tasks=5, save_path=save_path,
        embed_chunk=8,
    )
    acc = hook(0, state)
    assert 0.0 <= acc <= 1.0
    assert hook.best["epoch"] == 0 and hook.best["acc"] == acc
    import os

    assert os.path.exists(save_path)
    assert any("oneshot_acc" in h for h in trainer.logger.history)


def test_evaluate_oneshot_random_embedder_near_chance(tmp_path, rng):
    classes = _fake_classes(tmp_path, rng, n_ids=10)
    gen = np.random.default_rng(0)

    def embed(paths):
        return gen.normal(size=(len(paths), 16))

    acc = O.evaluate_oneshot(embed, classes, n_way=5, k_tasks=100, seed=2)
    assert 0.05 <= acc <= 0.45  # near 1/5


def test_face_distance_and_compare(rng):
    probe = _emb(rng, 32)
    known = np.stack([probe, _emb(rng, 32), _emb(rng, 32)])
    d = API.face_distance(known, probe)
    assert d.shape == (3,)
    assert d[0] == pytest.approx(0.0, abs=1e-6)
    dist, prob = API.compare_faces(known, probe)
    assert prob[0] == pytest.approx(1.0, abs=1e-5)
    assert np.all(prob <= 1.0) and np.all(prob >= 0.0)
    assert API.face_distance(np.empty((0, 32)), probe).shape == (0,)


def test_largest_face_bounding_box():
    boxes = np.array([[0, 0, 10, 10], [0, 0, 30, 30], [5, 5, 6, 6]], np.float32)
    np.testing.assert_array_equal(API.largest_face_bounding_box(boxes), boxes[1])
    assert API.largest_face_bounding_box(np.empty((0, 4))) is None


def test_landmark_groups_cover_68():
    idxs = {i for grp in API.LANDMARK_GROUPS.values() for i in grp}
    assert idxs == set(range(68))


def test_landmark_net_shapes():
    import jax
    import jax.numpy as jnp
    from deep_insight_face_tpu.models.landmark import LandmarkNet

    m = LandmarkNet(width=0.25, dtype=jnp.float32)
    vs = m.init(jax.random.key(0), jnp.zeros((1, 112, 112, 3)))
    pts = m.apply(vs, jnp.zeros((2, 112, 112, 3)))
    assert pts.shape == (2, 68, 2)
    assert np.all(np.asarray(pts) >= 0) and np.all(np.asarray(pts) <= 1)

def test_gallery_add_batch_bulk(rng):
    """add_batch enrolls a (K, D) block without per-row Python cost and
    matches per-row adds."""
    g1 = FaceGallery(embedding_size=16)
    g2 = FaceGallery(embedding_size=16)
    embs = np.stack([_emb(rng, 16) for _ in range(10)])
    names = [f"p{i}" for i in range(10)]
    g1.add_batch(names, embs)
    for n, e in zip(names, embs):
        g2.add(n, e)
    assert len(g1) == len(g2) == 10
    q = embs[[3, 7]]
    n1, s1 = g1.identify(q)
    n2, s2 = g2.identify(q)
    assert n1 == n2 == ["p3", "p7"]
    np.testing.assert_allclose(s1, s2, atol=1e-6)
    with pytest.raises(ValueError):
        g1.add_batch(["x"], np.zeros((1, 8)))
    with pytest.raises(ValueError):
        g1.add_batch(["x", "y"], np.zeros((1, 16)))


def test_gallery_bfloat16_storage(rng):
    """dtype=bfloat16 halves device storage; identification results must
    match the f32 gallery (same argmax, scores within bf16 rounding)."""
    import jax.numpy as jnp

    n, d = 50, 64
    embs = rng.normal(size=(n, d)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    names = [f"id{i}" for i in range(n)]
    g32 = FaceGallery(embedding_size=d)
    g16 = FaceGallery(embedding_size=d, dtype=jnp.bfloat16)
    g32.add_batch(names, embs)
    g16.add_batch(names, embs)
    assert g16._gallery().dtype == jnp.bfloat16
    q = embs[:8] + rng.normal(scale=0.02, size=(8, d)).astype(np.float32)
    n32, s32 = g32.identify(q)
    n16, s16 = g16.identify(q)
    assert n32 == n16 == names[:8]
    np.testing.assert_allclose(s16, s32, atol=2e-2)
    tn32, ts32 = g32.identify_topk(q, k=3)
    tn16, ts16 = g16.identify_topk(q, k=3)
    assert [r[0] for r in tn32] == [r[0] for r in tn16]
    np.testing.assert_allclose(ts16, ts32, atol=2e-2)
    np.testing.assert_allclose(
        g16.scores_all(q), g32.scores_all(q), atol=2e-2
    )


def test_gallery_bfloat16_sharded(rng):
    """bf16 storage composes with the mesh-sharded path."""
    import jax.numpy as jnp

    from deep_insight_face_tpu.parallel.mesh import create_mesh

    mesh = create_mesh()
    n, d = 37, 32
    embs = rng.normal(size=(n, d)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    names = [f"id{i}" for i in range(n)]
    ref = FaceGallery(embedding_size=d)
    ref.add_batch(names, embs)
    g = FaceGallery(embedding_size=d, mesh=mesh, dtype=jnp.bfloat16)
    g.add_batch(names, embs)
    q = embs[:8]
    n_ref, _ = ref.identify(q)
    n_bf, s_bf = g.identify(q)
    assert n_bf == n_ref
    np.testing.assert_allclose(s_bf, 1.0, atol=2e-2)
    tn, ts = g.identify_topk(q, k=4)
    assert [r[0] for r in tn] == n_ref
