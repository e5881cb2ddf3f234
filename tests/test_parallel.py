"""Multi-chip sharding tests on the 8-device virtual CPU mesh.

The reference has zero distribution (SURVEY §2 #26); these tests validate
the new DP (+ model-parallel classifier) design end-to-end: compile,
execute, loss decreases, and sharded == single-device math.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep_insight_face_tpu.config import Config, MeshConfig, ModelConfig, TrainConfig
from deep_insight_face_tpu.models import build_embedding_model
from deep_insight_face_tpu.parallel.mesh import create_mesh
from deep_insight_face_tpu.parallel.train_step import (
    create_train_state,
    make_eval_embed_fn,
    make_train_step,
)


def _tiny_cfg(mode="arcface", model_parallel=1, num_classes=16):
    return Config(
        model=ModelConfig(
            backbone="mobilenetv2", head="gdc", embedding_size=32,
            image_size=32, compute_dtype="float32", width_multiplier=0.35,
        ),
        train=TrainConfig(
            mode=mode, num_classes=num_classes, learning_rate=1e-3,
            warmup_steps=0, weight_decay=0.0,
        ),
        mesh=MeshConfig(model_parallel=model_parallel),
    )


def _batch(rng, cfg, n=16):
    imgs = rng.normal(size=(n, cfg.model.image_size, cfg.model.image_size, 3))
    labels = rng.integers(0, cfg.train.num_classes, size=n)
    return {"images": jnp.array(imgs, jnp.float32), "labels": jnp.array(labels)}


def test_mesh_creation():
    mesh = create_mesh(MeshConfig(model_parallel=2))
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")
    with pytest.raises(ValueError):
        create_mesh(MeshConfig(model_parallel=3))


@pytest.mark.parametrize("mode", ["arcface", "batch_hard", "semi_hard"])
def test_train_step_runs_on_mesh(rng, mode):
    cfg = _tiny_cfg(mode=mode, model_parallel=2 if mode == "arcface" else 1)
    mesh = create_mesh(cfg.mesh)
    model = build_embedding_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0), mesh=mesh)
    step = make_train_step(cfg, mesh)
    batch = _batch(rng, cfg)
    state, metrics = step(state, batch)
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    state, metrics2 = step(state, batch)
    assert int(state.step) == 2


def test_arcface_classifier_is_model_sharded(rng):
    cfg = _tiny_cfg(mode="arcface", model_parallel=4)
    mesh = create_mesh(cfg.mesh)
    model = build_embedding_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0), mesh=mesh)
    sh = state.params["classifier"]["kernel"].sharding
    # the identity axis must actually be split over 'model'
    assert sh.spec == jax.sharding.PartitionSpec(None, "model")


def test_arcface_loss_decreases_over_steps(rng):
    cfg = _tiny_cfg(mode="arcface", model_parallel=2, num_classes=8)
    mesh = create_mesh(cfg.mesh)
    model = build_embedding_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0), mesh=mesh)
    step = make_train_step(cfg, mesh)
    batch = _batch(rng, cfg, n=16)
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_sharded_matches_single_device(rng):
    """Same seed, same batch: 8-way sharded step == single-device step."""
    cfg = _tiny_cfg(mode="batch_hard")
    batch = _batch(rng, cfg, n=16)
    model = build_embedding_model(cfg.model)

    mesh = create_mesh(cfg.mesh)
    state_m = create_train_state(model, cfg, jax.random.key(0), mesh=mesh)
    step_m = make_train_step(cfg, mesh)
    _, metrics_m = step_m(state_m, batch)

    state_s = create_train_state(model, cfg, jax.random.key(0), mesh=None)
    step_s = make_train_step(cfg, mesh=None)
    _, metrics_s = step_s(state_s, batch)

    assert float(metrics_m["loss"]) == pytest.approx(
        float(metrics_s["loss"]), rel=1e-4
    )


def test_siamese_and_triplet_steps(rng):
    for mode in ("siamese", "triplet"):
        cfg = _tiny_cfg(mode=mode)
        mesh = create_mesh(cfg.mesh)
        model = build_embedding_model(cfg.model)
        state = create_train_state(model, cfg, jax.random.key(0), mesh=mesh)
        step = make_train_step(cfg, mesh)
        n, s = 8, cfg.model.image_size
        if mode == "siamese":
            batch = {
                "images_a": jnp.array(rng.normal(size=(n, s, s, 3)), jnp.float32),
                "images_b": jnp.array(rng.normal(size=(n, s, s, 3)), jnp.float32),
                "labels": jnp.array(rng.integers(0, 2, n)),
            }
        else:
            batch = {
                k: jnp.array(rng.normal(size=(n, s, s, 3)), jnp.float32)
                for k in ("anchor", "positive", "negative")
            }
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))


def test_eval_embed_fn_sharded(rng):
    cfg = _tiny_cfg()
    mesh = create_mesh(cfg.mesh)
    model = build_embedding_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0), mesh=mesh)
    embed = make_eval_embed_fn(model, mesh)
    imgs = jnp.array(rng.normal(size=(16, 32, 32, 3)), jnp.float32)
    out = embed(state.params, state.batch_stats, imgs)
    assert out.shape == (16, 32)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=1), 1.0, atol=1e-4)


def test_batch_hard_auto_alpha_threads_state(rng):
    cfg = _tiny_cfg(mode="batch_hard_auto")
    mesh = create_mesh(cfg.mesh)
    model = build_embedding_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0), mesh=mesh)
    step = make_train_step(cfg, mesh)
    a0 = float(state.alpha)
    state, _ = step(state, _batch(rng, cfg))
    assert float(state.alpha) != a0


def test_flash_ce_train_step(rng):
    import dataclasses

    cfg = _tiny_cfg(mode="arcface", model_parallel=1, num_classes=16)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, flash_ce=True)
    )
    mesh = create_mesh(cfg.mesh)
    model = build_embedding_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0), mesh=mesh)
    step = make_train_step(cfg, mesh)
    state, metrics = step(state, _batch(rng, cfg))
    assert np.isfinite(float(metrics["loss"]))


def test_flash_ce_model_parallel_matches_xla_path(rng):
    """Cross-shard flash CE (model_parallel=2) trains and matches the
    XLA vocab-parallel margin softmax loss on the same state/batch."""
    import dataclasses

    cfg = _tiny_cfg(mode="arcface", model_parallel=2, num_classes=32)
    mesh = create_mesh(cfg.mesh)
    model = build_embedding_model(cfg.model)
    batch = _batch(rng, cfg)

    cfg_flash = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, flash_ce=True)
    )
    state_f = create_train_state(model, cfg_flash, jax.random.key(0), mesh=mesh)
    step_f = make_train_step(cfg_flash, mesh)
    state_f, metrics_f = step_f(state_f, batch)

    state_x = create_train_state(model, cfg, jax.random.key(0), mesh=mesh)
    step_x = make_train_step(cfg, mesh)
    state_x, metrics_x = step_x(state_x, batch)

    assert float(metrics_f["loss"]) == pytest.approx(
        float(metrics_x["loss"]), rel=1e-3
    )
    # parameters after the step agree too (same grads through both paths)
    ka = np.asarray(state_f.params["classifier"]["kernel"])
    kb = np.asarray(state_x.params["classifier"]["kernel"])
    np.testing.assert_allclose(ka, kb, atol=5e-4)


def test_sharded_flash_grads_match_single_device(rng):
    from deep_insight_face_tpu.ops.margin_softmax import (
        flash_arcface_loss,
        make_sharded_flash_arcface_loss,
    )

    b, d, c = 16, 32, 128
    emb = rng.normal(size=(b, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    w = rng.normal(size=(d, c)).astype(np.float32)
    w /= np.linalg.norm(w, axis=0, keepdims=True)
    labels = jnp.array(rng.integers(0, c, b).astype(np.int32))
    g_si = jax.grad(
        lambda e, ww: flash_arcface_loss(e, ww, labels), argnums=(0, 1)
    )(jnp.array(emb), jnp.array(w))
    for shape in [(4, 2), (2, 4), (8, 1)]:
        mesh = jax.make_mesh(shape, ("data", "model"))
        fn = make_sharded_flash_arcface_loss(mesh, "data", "model")
        g_sh = jax.jit(jax.grad(fn, argnums=(0, 1)))(
            jnp.array(emb), jnp.array(w), labels
        )
        np.testing.assert_allclose(
            np.asarray(g_sh[0]), np.asarray(g_si[0]), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(g_sh[1]), np.asarray(g_si[1]), atol=1e-5
        )


def test_bn_frozen_step_denies_batch_stats_but_tracks_them(rng):
    """BN-denial training phase (TrainConfig.bn_freeze_step): the loss
    forward must be a pure function of running statistics — identical
    embeddings whether the rest of the batch changes — while the side
    pass keeps the running stats tracking."""
    cfg = _tiny_cfg()
    model = build_embedding_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0))
    step = make_train_step(cfg, bn_frozen=True)
    batch = _batch(rng, cfg)
    before = jax.tree.map(lambda x: np.asarray(x), state.batch_stats)
    p0 = np.asarray(jax.tree.leaves(state.params)[0]).copy()

    # denial property (checked BEFORE the donating step deletes buffers):
    # an image's embedding must not depend on the other batch members
    # during the frozen loss forward
    from deep_insight_face_tpu.parallel.train_step import _embed

    params = {k: v for k, v in state.params.items() if k != "classifier"}
    imgs = batch["images"]
    e1, _ = _embed(model.apply, params, state.batch_stats, imgs,
                   jax.random.key(1), True, bn_frozen=True)
    shuffled = jnp.concatenate([imgs[8:], imgs[:8]], 0)
    e2, _ = _embed(model.apply, params, state.batch_stats, shuffled,
                   jax.random.key(2), True, bn_frozen=True)
    np.testing.assert_allclose(
        np.asarray(e1[0]), np.asarray(e2[8]), atol=1e-5
    )

    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # params moved
    p1 = jax.tree.leaves(state2.params)[0]
    assert not np.allclose(p0, np.asarray(p1))
    # running stats STILL track (side pass ran)
    changed = any(
        not np.allclose(a, np.asarray(b))
        for a, b in zip(jax.tree.leaves(before),
                        jax.tree.leaves(state2.batch_stats))
    )
    assert changed, "side pass did not update running stats"


# ---------------------------------------------------------------------------
# sharded gallery (SURVEY §5 long-axis: O(N·D) over the mesh)
# ---------------------------------------------------------------------------


def _random_embs(rng, n, d=32):
    e = rng.normal(size=(n, d)).astype(np.float32)
    return e / np.linalg.norm(e, axis=1, keepdims=True)


@pytest.mark.parametrize("n_ids,n_q", [(64, 8), (67, 8), (131, 13)])
def test_sharded_gallery_match_equals_single_device(rng, n_ids, n_q):
    """shard_map'd matcher == single-device fused kernel, including the
    row-0-duplicate padding contract (N, M not multiples of the mesh)."""
    from deep_insight_face_tpu.gallery import FaceGallery

    mesh = create_mesh(MeshConfig(model_parallel=2))
    gal_s = FaceGallery(embedding_size=32, mesh=mesh)
    gal_1 = FaceGallery(embedding_size=32)
    embs = _random_embs(rng, n_ids)
    for i, e in enumerate(embs):
        gal_s.add(f"id{i}", e)
        gal_1.add(f"id{i}", e)

    q = _random_embs(rng, n_q)
    names_s, scores_s = gal_s.identify(q)
    names_1, scores_1 = gal_1.identify(q)
    assert names_s == names_1
    np.testing.assert_allclose(scores_s, scores_1, atol=1e-5)

    ss = gal_s.scores_all(q)
    s1 = gal_1.scores_all(q)
    assert ss.shape == (n_q, n_ids)
    np.testing.assert_allclose(ss, s1, atol=1e-5)


def test_sharded_gallery_all_negative_scores(rng):
    """Adversarial padding case: every genuine score negative — the row-0
    duplicate padding in the last shard must not shadow the true best."""
    from deep_insight_face_tpu.gallery import FaceGallery

    mesh = create_mesh(MeshConfig(model_parallel=2))
    gal_s = FaceGallery(embedding_size=32, mesh=mesh)
    gal_1 = FaceGallery(embedding_size=32)
    # gallery clustered around one direction u; pads 33 -> 34 over model=2
    u = _random_embs(rng, 1)
    embs = u + 0.1 * _random_embs(rng, 33)
    embs = embs / np.linalg.norm(embs, axis=1, keepdims=True)
    for i, e in enumerate(embs):
        gal_s.add(f"id{i}", e)
        gal_1.add(f"id{i}", e)
    # queries near the antipode -u: every genuine cosine is negative
    q = -u + 0.05 * _random_embs(rng, 8)
    q = q / np.linalg.norm(q, axis=1, keepdims=True)
    names_s, scores_s = gal_s.identify(q)
    names_1, scores_1 = gal_1.identify(q)
    assert (scores_1 < 0).all(), "test setup: scores should be negative"
    assert names_s == names_1
    np.testing.assert_allclose(scores_s, scores_1, atol=1e-5)


def test_sharded_gallery_one_axis_mesh(rng):
    """A 1-axis mesh shards the gallery over all devices (queries
    replicated)."""
    from jax.sharding import Mesh

    from deep_insight_face_tpu.gallery import FaceGallery

    mesh = Mesh(np.array(jax.devices()[:8]), ("model",))
    gal_s = FaceGallery(embedding_size=32, mesh=mesh)
    gal_1 = FaceGallery(embedding_size=32)
    embs = _random_embs(rng, 50)  # pads 50 -> 56 over 8 shards
    for i, e in enumerate(embs):
        gal_s.add(f"id{i}", e)
        gal_1.add(f"id{i}", e)
    q = _random_embs(rng, 5)
    names_s, scores_s = gal_s.identify(q)
    names_1, scores_1 = gal_1.identify(q)
    assert names_s == names_1
    np.testing.assert_allclose(scores_s, scores_1, atol=1e-5)
    np.testing.assert_allclose(gal_s.scores_all(q), gal_1.scores_all(q),
                               atol=1e-5)


def test_sharded_gallery_topk_padding_cannot_evict_candidates(rng):
    """Regression: with n_model >= 3 multiple row-0 duplicates can land
    on ONE shard; they must be masked out BEFORE the per-shard top-k or
    they evict genuine candidates that a post-hoc mask cannot recover.
    Construction: N=26 over model=4 (pad=2, both on the last shard with
    5 real rows), row 0 scoring above the last shard's k-th candidate."""
    from deep_insight_face_tpu.gallery import FaceGallery

    d, n, q_dim = 32, 26, 32
    base = _random_embs(rng, n + 1)
    query = base[-1]
    # engineer scores: rows 21-23 best, row 0 strong, row 24 in the
    # global top-5, the rest weak — all unit-norm
    def with_score(v, target):
        v = v - np.dot(v, query) * query  # orthogonalize
        v /= np.linalg.norm(v)
        return target * query + np.sqrt(1 - target**2) * v

    embs = np.stack([with_score(base[i], s) for i, s in enumerate(
        [0.95] + [0.1] * 20 + [0.99, 0.98, 0.97, 0.94] + [0.05]
    )]).astype(np.float32)

    mesh = create_mesh(MeshConfig(model_parallel=4))
    gal_s = FaceGallery(embedding_size=d, mesh=mesh)
    gal_1 = FaceGallery(embedding_size=d)
    gal_s.add_batch([f"id{i}" for i in range(n)], embs)
    gal_1.add_batch([f"id{i}" for i in range(n)], embs)

    qb = np.tile(query[None], (2, 1)).astype(np.float32)
    names_s, scores_s = gal_s.identify_topk(qb, k=5)
    names_1, scores_1 = gal_1.identify_topk(qb, k=5)
    assert names_1[0] == ["id21", "id22", "id23", "id0", "id24"]
    assert names_s == names_1
    np.testing.assert_allclose(scores_s, scores_1, atol=1e-5)


@pytest.mark.parametrize("n_ids,n_q,k,mp", [
    (64, 8, 5, 2), (67, 13, 5, 2), (10, 4, 16, 2),
    (26, 8, 5, 4), (21, 8, 3, 8),   # multi-row padding regimes
])
def test_sharded_gallery_topk_equals_single_device(rng, n_ids, n_q, k, mp):
    """Sharded top-k == single-device top-k == dense oracle, including
    row-0-duplicate padding (single- AND multi-row: 21 over 8 shards
    pads 3 rows) which MUST NOT appear as a duplicate entry in any
    top-k list, and k > n clamping."""
    from deep_insight_face_tpu.gallery import FaceGallery

    mesh = create_mesh(MeshConfig(model_parallel=mp))
    gal_s = FaceGallery(embedding_size=32, mesh=mesh)
    gal_1 = FaceGallery(embedding_size=32)
    embs = _random_embs(rng, n_ids)
    gal_s.add_batch([f"id{i}" for i in range(n_ids)], embs)
    gal_1.add_batch([f"id{i}" for i in range(n_ids)], embs)

    q = _random_embs(rng, n_q)
    names_s, scores_s = gal_s.identify_topk(q, k=k)
    names_1, scores_1 = gal_1.identify_topk(q, k=k)
    kk = min(k, n_ids)
    dense = q @ embs.T
    want_idx = np.argsort(-dense, axis=1)[:, :kk]
    assert names_1 == [[f"id{i}" for i in row] for row in want_idx]
    assert names_s == names_1
    np.testing.assert_allclose(scores_s, scores_1, atol=1e-5)
    np.testing.assert_allclose(
        scores_1, np.take_along_axis(dense, want_idx, axis=1), atol=1e-4
    )
    for row in names_s:  # no duplicates (padding leak / merge bug)
        assert len(set(row)) == len(row), row


def test_sharded_gallery_placement(rng):
    """The device gallery really is sharded over the model axis."""
    from deep_insight_face_tpu.gallery import FaceGallery

    mesh = create_mesh(MeshConfig(model_parallel=2))
    gal = FaceGallery(embedding_size=32, mesh=mesh)
    for i, e in enumerate(_random_embs(rng, 64)):
        gal.add(f"id{i}", e)
    gal.identify(_random_embs(rng, 4))
    spec = gal._gallery().sharding.spec
    assert tuple(spec) == ("model", None), spec


def test_classifier_adam_moments_are_model_sharded(rng):
    # the sharded-init path must materialize the optimizer moments (not
    # just the kernel) split over 'model' — at 10^7 identities the
    # unsharded mu/nu alone would OOM a chip during init
    cfg = _tiny_cfg(mode="arcface", model_parallel=4)
    mesh = create_mesh(cfg.mesh)
    model = build_embedding_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0), mesh=mesh)
    spec = jax.sharding.PartitionSpec(None, "model")
    found = 0
    for leaf in jax.tree_util.tree_leaves(
        jax.tree_util.tree_map_with_path(
            lambda p, x: (x.sharding.spec
                          if "classifier" in str(p) and hasattr(x, "sharding")
                          else None),
            state.opt_state,
        )
    ):
        assert leaf == spec, leaf
        found += 1
    assert found >= 2, "expected classifier mu and nu moments"


def test_semi_hard_margin_and_auto_alpha_are_threaded(rng):
    # regression: semi_hard hardcoded margin=1.0 and batch_hard_auto
    # received t.margin as alpha_factor — both now have their own fields
    import dataclasses

    losses = {}
    batch = _batch(np.random.default_rng(0), _tiny_cfg(mode="semi_hard"))
    for margin in (0.2, 2.0):
        cfg = _tiny_cfg(mode="semi_hard")
        cfg = cfg.replace(
            train=dataclasses.replace(cfg.train, semi_hard_margin=margin)
        )
        mesh = create_mesh(cfg.mesh)
        model = build_embedding_model(cfg.model)
        state = create_train_state(model, cfg, jax.random.key(0), mesh=mesh)
        step = make_train_step(cfg, mesh)
        _, metrics = step(state, batch)
        losses[margin] = float(metrics["loss"])
    assert losses[2.0] > losses[0.2], losses

    alphas = {}
    for factor in (0.1, 0.4):
        cfg = _tiny_cfg(mode="batch_hard_auto")
        cfg = cfg.replace(
            train=dataclasses.replace(cfg.train, auto_alpha_factor=factor)
        )
        mesh = create_mesh(cfg.mesh)
        model = build_embedding_model(cfg.model)
        state = create_train_state(model, cfg, jax.random.key(0), mesh=mesh)
        step = make_train_step(cfg, mesh)
        new_state, _ = step(state, batch)
        alphas[factor] = float(new_state.alpha)
    # new_alpha = mean(dists) * factor: same data, 4x factor -> 4x alpha
    assert alphas[0.4] == pytest.approx(4.0 * alphas[0.1], rel=1e-4), alphas


def test_cosine_lr_schedule_decays():
    """Opt-in warmup-cosine schedule: peak after warmup, ~floor at the
    decay horizon; 'constant' (the default) stays flat after warmup."""
    from deep_insight_face_tpu.parallel.train_step import make_optimizer

    cfg = _tiny_cfg()
    cfg = Config(
        model=cfg.model, mesh=cfg.mesh,
        train=TrainConfig(
            mode="arcface", num_classes=16, learning_rate=1e-2,
            warmup_steps=10, lr_schedule="cosine", decay_steps=100,
            lr_floor_frac=0.01, weight_decay=0.0,
        ),
    )
    # optax.adam's inner schedule is observable through the update scale:
    # feed a constant gradient and read back the applied step size.
    tx = make_optimizer(cfg)
    params = {"w": jnp.ones((4,))}
    state = tx.init(params)
    g = {"w": jnp.ones((4,))}
    lrs = []
    for _ in range(100):
        updates, state = tx.update(g, state, params)
        lrs.append(float(-updates["w"][0]))
    # warmup ramps up; decay brings the step far below the peak
    assert lrs[9] > lrs[0]
    assert max(lrs) == pytest.approx(max(lrs[:20]), rel=1e-6)
    assert lrs[-1] < 0.15 * max(lrs)

    with pytest.raises(ValueError):
        make_optimizer(Config(
            model=cfg.model, mesh=cfg.mesh,
            train=TrainConfig(mode="arcface", lr_schedule="cosine",
                              decay_steps=0),
        ))
