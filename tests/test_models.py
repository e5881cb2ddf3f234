"""Model zoo shape/jit/determinism tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep_insight_face_tpu.config import ModelConfig
from deep_insight_face_tpu.models import build_embedding_model, init_embedding_params
from deep_insight_face_tpu.models.backbones import MobileNetV2, ResNetV2, VGG16
from deep_insight_face_tpu.models.inception import InceptionNN4Small2


def _tiny(cls, **kw):
    return cls(dtype=jnp.float32, **kw)


def test_resnetv2_feature_shape():
    m = _tiny(ResNetV2, depths=(1, 1, 1, 1))
    x = jnp.zeros((2, 112, 112, 3))
    vs = m.init(jax.random.key(0), x)
    y = m.apply(vs, x)
    assert y.shape == (2, 4, 4, 2048)


def test_mobilenetv2_feature_shape():
    m = _tiny(MobileNetV2)
    x = jnp.zeros((1, 112, 112, 3))
    vs = m.init(jax.random.key(0), x)
    y = m.apply(vs, x)
    assert y.shape == (1, 4, 4, 1280)


def test_vgg16_feature_shape():
    m = _tiny(VGG16)
    x = jnp.zeros((1, 112, 112, 3))
    vs = m.init(jax.random.key(0), x)
    y = m.apply(vs, x)
    assert y.shape == (1, 3, 3, 512)


def test_inception_nn4_small2():
    m = InceptionNN4Small2(dtype=jnp.float32)
    x = jnp.zeros((2, 96, 96, 3))
    vs = m.init(jax.random.key(0), x)
    y = m.apply(vs, x)
    assert y.shape == (2, 128)
    # l2-normalized output
    np.testing.assert_allclose(np.linalg.norm(np.asarray(y), axis=1), 1.0, atol=1e-5)


@pytest.mark.parametrize("head", ["v1", "dense", "gdc", "none"])
def test_heads_on_small_backbone(head):
    cfg = ModelConfig(
        backbone="mobilenetv2", head=head, embedding_size=64, image_size=112,
        compute_dtype="float32", width_multiplier=0.35,
    )
    model = build_embedding_model(cfg)
    vs = init_embedding_params(model, jax.random.key(0), image_size=112)
    x = jnp.ones((2, 112, 112, 3))
    y = model.apply(vs, x, train=False)
    if head == "none":
        assert y.ndim == 2 and y.shape[0] == 2
    else:
        assert y.shape == (2, 64)
    # l2-normalized by default
    np.testing.assert_allclose(np.linalg.norm(np.asarray(y), axis=1), 1.0, atol=1e-4)


def test_embedding_jit_and_determinism():
    cfg = ModelConfig(
        backbone="mobilenetv2", head="gdc", embedding_size=32,
        compute_dtype="float32", width_multiplier=0.35,
    )
    model = build_embedding_model(cfg)
    vs = init_embedding_params(model, jax.random.key(1), image_size=112)
    f = jax.jit(lambda v, x: model.apply(v, x, train=False))
    x = jnp.array(np.random.default_rng(0).normal(size=(2, 112, 112, 3)), jnp.float32)
    y1, y2 = f(vs, x), f(vs, x)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_train_mode_mutates_batch_stats():
    cfg = ModelConfig(
        backbone="mobilenetv2", head="gdc", embedding_size=32,
        compute_dtype="float32", width_multiplier=0.35,
    )
    model = build_embedding_model(cfg)
    vs = init_embedding_params(model, jax.random.key(1), image_size=112)
    x = jnp.ones((2, 112, 112, 3))
    y, mutated = model.apply(
        vs, x, train=True,
        rngs={"dropout": jax.random.key(2)},
        mutable=["batch_stats"],
    )
    assert "batch_stats" in mutated
    # at least one running stat changed
    before = jax.tree_util.tree_leaves(vs["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after))


def test_resnet_remat_matches():
    x = jnp.array(np.random.default_rng(3).normal(size=(1, 64, 64, 3)), jnp.float32)
    m1 = ResNetV2(depths=(1, 1), filters=(8, 16), dtype=jnp.float32, remat=False)
    m2 = ResNetV2(depths=(1, 1), filters=(8, 16), dtype=jnp.float32, remat=True)
    vs = m1.init(jax.random.key(0), x)
    y1 = m1.apply(vs, x)
    y2 = m2.apply(vs, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


def test_mobilenet_groupnorm_is_batch_independent(rng):
    """norm="group" variant: no running stats, per-sample normalization —
    an image's embedding cannot depend on its batch (the architectural
    fix for the BN shortcut, STATUS round-2)."""
    import jax
    import jax.numpy as jnp

    from deep_insight_face_tpu.config import ModelConfig
    from deep_insight_face_tpu.models import build_embedding_model

    cfg = ModelConfig(backbone="mobilenetv2", head="gdc", embedding_size=16,
                      image_size=32, compute_dtype="float32",
                      width_multiplier=0.35, norm="group")
    m = build_embedding_model(cfg)
    x = jnp.asarray(rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32))
    v = m.init(jax.random.key(0), x[:1])
    # no batch statistics anywhere
    assert not jax.tree.leaves(v.get("batch_stats", {}))
    e1 = np.asarray(m.apply(v, x, train=False))
    shuffled = jnp.concatenate([x[4:], x[:4]], 0)
    e2 = np.asarray(m.apply(v, shuffled, train=False))
    np.testing.assert_allclose(e1[0], e2[4], atol=1e-5)
    # train-mode forward (mutable for API compat) equals eval modulo
    # dropout randomness being the only difference
    e3, mut = m.apply(v, x, train=True, mutable=["batch_stats"],
                      rngs={"dropout": jax.random.key(1)})
    assert not jax.tree.leaves(mut.get("batch_stats", {}))
    assert np.isfinite(np.asarray(e3)).all()
