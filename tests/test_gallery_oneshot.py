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
    names, _ = g2.identify(np.stack(g2._embs))
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
    base = O.nearest_neighbour_baseline(embed, classes, 4, 10)
    assert base["random"] == 0.25


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
