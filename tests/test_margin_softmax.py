"""Flash margin-softmax kernel vs the XLA reference (values + grads)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep_insight_face_tpu.ops import losses as L
from deep_insight_face_tpu.ops.margin_softmax import flash_arcface_loss


def _normalized(rng, b, d, c):
    emb = rng.normal(size=(b, d)).astype(np.float32)
    w = rng.normal(size=(d, c)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    w /= np.linalg.norm(w, axis=0, keepdims=True)
    labels = rng.integers(0, c, size=b)
    return jnp.array(emb), jnp.array(w), jnp.array(labels)


def _xla_loss(emb_n, w_n, labels, m1, m2, m3, s):
    # identical math on pre-normalized inputs (incl. the InsightFace
    # monotonicity guard past theta > pi - m2)
    import math

    cos = jnp.clip(emb_n @ w_n, -1 + 1e-7, 1 - 1e-7)
    onehot = jax.nn.one_hot(labels, w_n.shape[1], dtype=cos.dtype)
    theta = jnp.arccos(cos)
    tgt = jnp.cos(m1 * theta + m2) - m3
    if m2 > 0:
        tgt = jnp.where(cos > math.cos(math.pi - m2), tgt,
                        cos - m2 * math.sin(m2) - m3)
    logits = jnp.where(onehot > 0, tgt, cos) * s
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1)[:, 0])


@pytest.mark.parametrize("b,d,c", [(8, 32, 100), (16, 128, 600), (3, 17, 40)])
@pytest.mark.parametrize("margins", [(1.0, 0.5, 0.0), (1.0, 0.0, 0.35)])
def test_flash_value_matches_xla(rng, b, d, c, margins):
    m1, m2, m3 = margins
    emb, w, labels = _normalized(rng, b, d, c)
    got = float(flash_arcface_loss(emb, w, labels, m1, m2, m3, 64.0))
    want = float(_xla_loss(emb, w, labels, m1, m2, m3, 64.0))
    assert got == pytest.approx(want, rel=1e-4)


def test_flash_grads_match_xla(rng):
    m1, m2, m3, s = 1.0, 0.5, 0.0, 64.0
    emb, w, labels = _normalized(rng, 8, 64, 300)

    g_flash = jax.grad(
        lambda e, ww: flash_arcface_loss(e, ww, labels, m1, m2, m3, s),
        argnums=(0, 1),
    )(emb, w)
    g_xla = jax.grad(
        lambda e, ww: _xla_loss(e, ww, labels, m1, m2, m3, s), argnums=(0, 1)
    )(emb, w)
    np.testing.assert_allclose(np.asarray(g_flash[0]), np.asarray(g_xla[0]),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_flash[1]), np.asarray(g_xla[1]),
                               rtol=1e-3, atol=1e-5)


def test_flash_multi_tile(rng):
    # C spanning several 512-column tiles exercises the online rescale
    emb, w, labels = _normalized(rng, 4, 32, 1500)
    got = float(flash_arcface_loss(emb, w, labels))
    want = float(_xla_loss(emb, w, labels, 1.0, 0.5, 0.0, 64.0))
    assert got == pytest.approx(want, rel=1e-4)


def test_flash_cotangent_scaling(rng):
    emb, w, labels = _normalized(rng, 6, 16, 64)
    g1 = jax.grad(lambda e: flash_arcface_loss(e, w, labels))(emb)
    g3 = jax.grad(lambda e: 3.0 * flash_arcface_loss(e, w, labels))(emb)
    np.testing.assert_allclose(np.asarray(g3), 3 * np.asarray(g1), rtol=1e-5)
