"""Loss/mining tests vs literal numpy oracles of the reference math
(reference: deep_insight_face/common/losses.py, networks/siamese.py:32-39,
networks/triplet.py:16-46)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep_insight_face_tpu.ops import losses as L
from deep_insight_face_tpu.ops import mining as M


def _batch(rng, n=24, d=16, n_ids=6):
    labels = rng.integers(0, n_ids, size=n)
    # ensure every identity appears at least twice
    labels[:n_ids] = np.arange(n_ids)
    labels[n_ids : 2 * n_ids] = np.arange(n_ids)
    emb = rng.normal(size=(n, d)).astype(np.float32)
    return labels, emb


# --- numpy oracles ---------------------------------------------------------


def _oracle_batch_hard_cosine(labels, emb, alpha):
    pos = labels[:, None] == labels[None, :]
    nrm = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    sims = nrm @ nrm.T
    hardest_pos = np.where(pos, sims, 1.0).min(-1)
    hardest_neg = np.where(pos, -1.0, sims).max(-1)
    return np.maximum(hardest_neg - hardest_pos + alpha, 0.0)


def _oracle_batch_hard_euclidean(labels, emb, alpha):
    pos = labels[:, None] == labels[None, :]
    sq = (emb**2).sum(-1)
    dists = sq[:, None] + sq[None, :] - 2 * emb @ emb.T
    hardest_pos = np.where(pos, dists, 0.0).max(-1)
    hardest_neg = np.where(pos, dists.max(), dists).min(-1)
    return np.maximum(hardest_pos + alpha - hardest_neg, 0.0)


def _oracle_batch_all_cosine(labels, emb, alpha):
    pos = labels[:, None] == labels[None, :]
    nrm = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    sims = nrm @ nrm.T
    pos_sims = np.where(pos, sims, 1.0)
    pos_loss = (1.0 - pos_sims).sum(-1) / pos.sum(-1)
    hardest_pos = pos_sims.min(-1, keepdims=True)
    neg_valid = (~pos) & ((hardest_pos - sims) < alpha)
    neg_loss = np.where(neg_valid, sims, 0.0).sum(-1) / (neg_valid.sum(-1) + 1)
    return pos_loss + neg_loss


def _oracle_semi_hard(labels, emb, margin=1.0):
    """Literal triplet-semihard per TF metric learning (with correct pdist)."""
    n = len(labels)
    sq = (emb**2).sum(-1)
    pdist = np.maximum(sq[:, None] + sq[None, :] - 2 * emb @ emb.T, 0.0)
    adj = labels[:, None] == labels[None, :]
    total, count = 0.0, 0
    for i in range(n):
        for j in range(n):
            if i == j or not adj[i, j]:
                continue
            d_ap = pdist[i, j]
            negs = pdist[i][~adj[i]]
            outside = negs[negs > d_ap]
            d_an = outside.min() if len(outside) else negs.max()
            total += max(margin + d_ap - d_an, 0.0)
            count += 1
    return total / max(count, 1)


# --- tests -----------------------------------------------------------------


def test_contrastive_loss(rng):
    y = rng.integers(0, 2, size=32).astype(np.float32)
    d = np.abs(rng.normal(size=32)).astype(np.float32)
    got = float(L.contrastive_loss(jnp.array(y), jnp.array(d), margin=1.0))
    want = np.mean(y * d**2 + (1 - y) * np.maximum(1.0 - d, 0) ** 2)
    assert got == pytest.approx(want, rel=1e-5)


def test_contrastive_accuracy(rng):
    y = rng.integers(0, 2, size=100).astype(np.float32)
    d = np.abs(rng.normal(size=100)).astype(np.float32)
    got = float(L.contrastive_accuracy(jnp.array(y), jnp.array(d), threshold=0.4))
    want = np.mean((d < 0.4).astype(np.float32) == y)
    assert got == pytest.approx(want)


def test_naive_triplet_loss(rng):
    a, p, n = (rng.normal(size=(8, 16)).astype(np.float32) for _ in range(3))
    got = float(L.naive_triplet_loss(jnp.array(a), jnp.array(p), jnp.array(n), alpha=0.4))
    pos = ((a - p) ** 2).sum(-1)
    neg = ((a - n) ** 2).sum(-1)
    want = np.maximum(pos - neg + 0.4, 0).mean()
    assert got == pytest.approx(want, rel=1e-5)


def test_batch_hard_cosine(rng):
    labels, emb = _batch(rng)
    got = np.asarray(M.batch_hard_cosine_loss(jnp.array(labels), jnp.array(emb), 0.35, reduce=False))
    np.testing.assert_allclose(got, _oracle_batch_hard_cosine(labels, emb, 0.35), atol=1e-5)


def test_batch_hard_euclidean(rng):
    labels, emb = _batch(rng)
    got = np.asarray(M.batch_hard_euclidean_loss(jnp.array(labels), jnp.array(emb), 0.35, reduce=False))
    np.testing.assert_allclose(got, _oracle_batch_hard_euclidean(labels, emb, 0.35), atol=1e-4)


def test_batch_hard_auto_alpha(rng):
    labels, emb = _batch(rng)
    loss, new_alpha = M.batch_hard_euclidean_auto_alpha_loss(
        jnp.array(labels), jnp.array(emb), jnp.array(1.0), alpha_factor=0.1
    )
    oracle = _oracle_batch_hard_euclidean(labels, emb, 1.0).mean()
    assert float(loss) == pytest.approx(oracle, rel=1e-4)
    sq = (emb**2).sum(-1)
    dists = sq[:, None] + sq[None, :] - 2 * emb @ emb.T
    assert float(new_alpha) == pytest.approx(dists.mean() * 0.1, rel=1e-4)


def test_batch_all_cosine(rng):
    labels, emb = _batch(rng)
    got = np.asarray(M.batch_all_cosine_loss(jnp.array(labels), jnp.array(emb), 0.35, reduce=False))
    np.testing.assert_allclose(got, _oracle_batch_all_cosine(labels, emb, 0.35), atol=1e-5)


def test_semi_hard_triplet(rng):
    labels, emb = _batch(rng, n=16, n_ids=4)
    got = float(L.semi_hard_triplet_loss(jnp.array(labels), jnp.array(emb), margin=1.0))
    want = _oracle_semi_hard(labels, emb)
    assert got == pytest.approx(want, rel=1e-4)


def test_mining_losses_differentiable(rng):
    labels, emb = _batch(rng)
    for fn in (M.batch_hard_cosine_loss, M.batch_hard_euclidean_loss, M.batch_all_cosine_loss):
        g = jax.grad(lambda e: fn(jnp.array(labels), e))(jnp.array(emb))
        assert np.isfinite(np.asarray(g)).all()


def test_arcface_margin_penalizes_target(rng):
    emb = rng.normal(size=(8, 32)).astype(np.float32)
    w = rng.normal(size=(32, 10)).astype(np.float32)
    labels = rng.integers(0, 10, size=8)
    plain = L.arcface_logits(jnp.array(emb), jnp.array(w), jnp.array(labels),
                             margin1=1.0, margin2=0.0, margin3=0.0, scale=1.0)
    margined = L.arcface_logits(jnp.array(emb), jnp.array(w), jnp.array(labels),
                                margin1=1.0, margin2=0.5, margin3=0.0, scale=1.0)
    # margin lowers only the target-class logit
    tgt = np.arange(8), np.asarray(labels)
    assert np.all(np.asarray(margined)[tgt] <= np.asarray(plain)[tgt] + 1e-6)
    off = np.array(margined - plain)
    off[tgt] = 0.0
    np.testing.assert_allclose(off, 0.0, atol=1e-6)


def test_arcface_cosface_margin(rng):
    emb = rng.normal(size=(4, 16)).astype(np.float32)
    w = rng.normal(size=(16, 6)).astype(np.float32)
    labels = np.array([0, 1, 2, 3])
    got = L.arcface_logits(jnp.array(emb), jnp.array(w), jnp.array(labels),
                           margin1=1.0, margin2=0.0, margin3=0.35, scale=64.0)
    nrm = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    wn = w / np.linalg.norm(w, axis=0, keepdims=True)
    cos = np.clip(nrm @ wn, -1 + 1e-7, 1 - 1e-7)
    want = cos.copy()
    want[np.arange(4), labels] -= 0.35
    np.testing.assert_allclose(np.asarray(got), want * 64.0, atol=1e-4)


def test_arcface_loss_decreases_with_alignment(rng):
    # embeddings aligned with their class weight column → lower loss
    w = rng.normal(size=(16, 4)).astype(np.float32)
    labels = np.array([0, 1, 2, 3])
    aligned = w.T[labels]
    random = rng.normal(size=(4, 16)).astype(np.float32)
    la = float(L.arcface_loss(jnp.array(aligned), jnp.array(w), jnp.array(labels)))
    lr = float(L.arcface_loss(jnp.array(random), jnp.array(w), jnp.array(labels)))
    assert la < lr


def test_distance_to_probability():
    d = jnp.array([0.0, 0.3, 0.6, 2.0])
    p = np.asarray(L.distance_to_probability(d))
    np.testing.assert_allclose(p[0], 1.0)
    # inside tolerance: gaussian kernel; outside: reciprocal
    np.testing.assert_allclose(p[1], np.exp(-0.3 / 2.0), atol=1e-5)
    np.testing.assert_allclose(p[3], 1.0 / 3.0, atol=1e-5)
    assert np.all(np.diff(p) < 0)


def test_wing_loss_properties(rng):
    from deep_insight_face_tpu.ops.landmark_loss import wing_loss

    pred = jnp.array(rng.normal(size=(4, 68, 2)).astype(np.float32))
    assert float(wing_loss(pred, pred)) == pytest.approx(0.0, abs=1e-6)
    # monotone in error magnitude
    t = jnp.zeros_like(pred)
    small = float(wing_loss(pred * 0.1, t))
    big = float(wing_loss(pred * 10.0, t))
    assert small < big
    # matches the analytic form at a known offset
    x = 30.0  # > omega → linear branch
    import math
    c = 10.0 - 10.0 * math.log(1 + 10.0 / 2.0)
    got = float(wing_loss(jnp.full((1, 1, 2), x), jnp.zeros((1, 1, 2))))
    assert got == pytest.approx(x - c, rel=1e-5)


def test_normalized_mean_error(rng):
    from deep_insight_face_tpu.ops.landmark_loss import normalized_mean_error

    target = jnp.array(rng.uniform(0, 100, (2, 68, 2)).astype(np.float32))
    assert float(normalized_mean_error(target, target)) == pytest.approx(0.0, abs=1e-6)
    shifted = target + 5.0
    nme = float(normalized_mean_error(shifted, target))
    iod = np.linalg.norm(np.asarray(target)[:, 45] - np.asarray(target)[:, 36], axis=-1)
    want = np.mean(np.sqrt(50.0) / iod)
    assert nme == pytest.approx(want, rel=1e-4)


def test_calc_mean_score():
    s = np.zeros(10); s[4] = 2.0  # all mass on bucket 5
    assert float(L.calc_mean_score(jnp.array(s))) == pytest.approx(5.0)
    uniform = np.ones(10)
    assert float(L.calc_mean_score(jnp.array(uniform))) == pytest.approx(5.5)


def test_arcface_no_antipodal_degenerate_minimum(rng):
    """Regression: without the InsightFace monotonicity guard, collapsing
    every embedding ANTIPODAL to every class weight is a near-global
    minimum of margin-softmax — non-target logits sit at −s while the
    wrapped cos(θ+m) boosts the target to −s·cos(m), giving loss ≈ 0.13
    and accuracy 1.0 with ZERO discrimination (observed in real training
    on chip). With the guard, this configuration must be expensive and
    must NOT classify."""
    d, c = 32, 400
    u = rng.normal(size=d).astype(np.float32)
    u /= np.linalg.norm(u)
    emb = np.tile(u, (8, 1)) + 1e-4 * rng.normal(size=(8, d)).astype(np.float32)
    w = np.tile(-u[:, None], (1, c)) + 1e-4 * rng.normal(size=(d, c)).astype(
        np.float32
    )
    labels = np.arange(8)
    loss = float(L.arcface_loss(jnp.array(emb), jnp.array(w),
                                jnp.array(labels)))
    assert loss > 5.0, f"antipodal collapse is still cheap: loss={loss}"
    logits = np.asarray(L.arcface_logits(jnp.array(emb), jnp.array(w),
                                         jnp.array(labels)))
    acc = (logits.argmax(1) == labels).mean()
    assert acc < 0.5, f"margin alone still wins argmax: acc={acc}"
