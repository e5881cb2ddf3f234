"""Distance primitives + Pallas gallery kernels (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from deep_insight_face_tpu.ops import distances as D


def test_pairwise_sq_euclidean(rng):
    a = rng.normal(size=(17, 9)).astype(np.float32)
    b = rng.normal(size=(23, 9)).astype(np.float32)
    got = np.asarray(D.pairwise_sq_euclidean(jnp.array(a), jnp.array(b)))
    want = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_pairwise_sq_euclidean_self_zero_diag(rng):
    a = rng.normal(size=(11, 5)).astype(np.float32)
    got = np.asarray(D.pairwise_sq_euclidean(jnp.array(a), zero_diagonal=True))
    assert np.all(np.diag(got) == 0.0)


def test_pairwise_cosine(rng):
    a = rng.normal(size=(12, 7)).astype(np.float32)
    got = np.asarray(D.pairwise_cosine_similarity(jnp.array(a)))
    an = a / np.linalg.norm(a, axis=1, keepdims=True)
    np.testing.assert_allclose(got, an @ an.T, atol=1e-5)


def test_euclidean_distance(rng):
    a = rng.normal(size=(6, 8)).astype(np.float32)
    b = rng.normal(size=(6, 8)).astype(np.float32)
    got = np.asarray(D.euclidean_distance(jnp.array(a), jnp.array(b)))
    np.testing.assert_allclose(got, np.linalg.norm(a - b, axis=1), atol=1e-5)


@pytest.mark.parametrize("m,n,d", [(5, 7, 16), (130, 260, 128), (128, 128, 200)])
def test_gallery_scores_matches_dense(rng, m, n, d):
    q = rng.normal(size=(m, d)).astype(np.float32)
    g = rng.normal(size=(n, d)).astype(np.float32)
    got = np.asarray(D.gallery_scores(jnp.array(q), jnp.array(g)))
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    gn = g / np.linalg.norm(g, axis=1, keepdims=True)
    np.testing.assert_allclose(got, qn @ gn.T, atol=1e-4)


@pytest.mark.parametrize("m,n,d", [(5, 7, 16), (130, 300, 128)])
def test_gallery_match_fused_argmax(rng, m, n, d):
    q = rng.normal(size=(m, d)).astype(np.float32)
    g = rng.normal(size=(n, d)).astype(np.float32)
    score, idx = D.gallery_match(jnp.array(q), jnp.array(g))
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    gn = g / np.linalg.norm(g, axis=1, keepdims=True)
    dense = qn @ gn.T
    np.testing.assert_array_equal(np.asarray(idx), dense.argmax(1))
    np.testing.assert_allclose(np.asarray(score), dense.max(1), atol=1e-4)


@pytest.mark.parametrize("m,n,d,k,chunk", [
    (5, 7, 16, 3, 131072),      # single short chunk, k < n
    (13, 300, 32, 5, 128),      # many chunks incl. a short tail (300 % 128)
    (4, 6, 16, 10, 131072),     # k > n: clamped to n
])
def test_gallery_topk_matches_dense(rng, m, n, d, k, chunk):
    q = rng.normal(size=(m, d)).astype(np.float32)
    g = rng.normal(size=(n, d)).astype(np.float32)
    scores, idx = D.gallery_topk(jnp.array(q), jnp.array(g), k, chunk=chunk)
    kk = min(k, n)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    gn = g / np.linalg.norm(g, axis=1, keepdims=True)
    dense = qn @ gn.T
    want_idx = np.argsort(-dense, axis=1)[:, :kk]
    want_scores = np.take_along_axis(dense, want_idx, axis=1)
    np.testing.assert_allclose(np.asarray(scores), want_scores, atol=1e-4)
    # indices must agree wherever scores aren't tied (random floats: none)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
    # descending order
    s = np.asarray(scores)
    assert (s[:, :-1] >= s[:, 1:] - 1e-7).all()


def test_gallery_topk_top1_equals_match(rng):
    q = rng.normal(size=(9, 24)).astype(np.float32)
    g = rng.normal(size=(40, 24)).astype(np.float32)
    s1, i1 = D.gallery_match(jnp.array(q), jnp.array(g))
    sk, ik = D.gallery_topk(jnp.array(q), jnp.array(g), 1)
    np.testing.assert_array_equal(np.asarray(ik)[:, 0], np.asarray(i1))
    np.testing.assert_allclose(np.asarray(sk)[:, 0], np.asarray(s1), atol=1e-5)


def test_gallery_match_identity_recovery(rng):
    # the best match of a gallery vector against the gallery is itself
    g = rng.normal(size=(50, 64)).astype(np.float32)
    score, idx = D.gallery_match(jnp.array(g), jnp.array(g))
    np.testing.assert_array_equal(np.asarray(idx), np.arange(50))
    np.testing.assert_allclose(np.asarray(score), 1.0, atol=1e-5)
