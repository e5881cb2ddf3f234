"""Loss functions: contrastive, naive triplet, semi-hard triplet, and
margin-softmax (ArcFace/CosFace) heads.

Pure functions over (labels, embeddings/logits); the batch-mining losses
live in :mod:`deep_insight_face_tpu.ops.mining`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from deep_insight_face_tpu.ops.distances import pairwise_sq_euclidean


def contrastive_loss(
    y_true: jnp.ndarray, distances: jnp.ndarray, margin: float = 1.0
) -> jnp.ndarray:
    """Hadsell et al. '06 contrastive loss.

    ``y_true == 1`` marks a genuine (same-identity) pair
    (reference: networks/siamese.py:32-39).
    """
    y = y_true.astype(distances.dtype)
    pos = y * jnp.square(distances)
    neg = (1.0 - y) * jnp.square(jnp.maximum(margin - distances, 0.0))
    return jnp.mean(pos + neg)


def contrastive_accuracy(
    y_true: jnp.ndarray, distances: jnp.ndarray, threshold: float = 0.4
) -> jnp.ndarray:
    """Fixed-threshold pair accuracy metric (reference: networks/siamese.py:42-45)."""
    pred = (distances < threshold).astype(y_true.dtype)
    return jnp.mean((pred == y_true).astype(jnp.float32))


def naive_triplet_loss(
    anchor: jnp.ndarray,
    positive: jnp.ndarray,
    negative: jnp.ndarray,
    alpha: float = 0.4,
    reduce: bool = True,
) -> jnp.ndarray:
    """max(‖a−p‖² − ‖a−n‖² + α, 0) (reference: networks/triplet.py:16-46)."""
    pos = jnp.sum(jnp.square(anchor - positive), axis=-1)
    neg = jnp.sum(jnp.square(anchor - negative), axis=-1)
    loss = jnp.maximum(pos - neg + alpha, 0.0)
    return jnp.mean(loss) if reduce else loss


def semi_hard_triplet_loss(
    labels: jnp.ndarray, embeddings: jnp.ndarray, margin: float = 1.0
) -> jnp.ndarray:
    """Semi-hard online triplet loss (FaceNet).

    For each positive pair (a, p): the negative is the closest one that is
    still farther than d(a, p) ("outside"); if none exists, the farthest
    negative ("inside"). Matches the TF metric-learning semantics the
    reference ports (reference: common/losses.py:249-308) — but with the
    *correct* pairwise distance (the reference's drops the −2ab cross
    term, common/losses.py:180-183).
    """
    labels = labels.reshape(-1)
    n = embeddings.shape[0]
    pdist = pairwise_sq_euclidean(embeddings)  # (n, n), squared
    adjacency = labels[:, None] == labels[None, :]
    adjacency_not = ~adjacency

    # For pair (i, j): among k with label != label_i and d(i, k) > d(i, j),
    # take min d(i, k). mask[i, j, k]
    d_ij = pdist[:, :, None]  # (n, n, 1)
    d_ik = pdist[:, None, :]  # (n, 1, n)
    outside_mask = adjacency_not[:, None, :] & (d_ik > d_ij)
    has_outside = jnp.any(outside_mask, axis=2)

    big = jnp.max(pdist)
    neg_outside = jnp.min(jnp.where(outside_mask, d_ik, big + 1.0), axis=2)
    neg_inside = jnp.max(jnp.where(adjacency_not, pdist, -1.0), axis=1)  # (n,)
    semi_hard_neg = jnp.where(has_outside, neg_outside, neg_inside[:, None])

    loss_mat = margin + pdist - semi_hard_neg
    mask_positives = adjacency.astype(jnp.float32) - jnp.eye(n)
    num_positives = jnp.maximum(jnp.sum(mask_positives), 1.0)
    return jnp.sum(jnp.maximum(loss_mat * mask_positives, 0.0)) / num_positives


# ---------------------------------------------------------------------------
# margin softmax (ArcFace / CosFace / combined)
# ---------------------------------------------------------------------------


def arcface_logits(
    embeddings: jnp.ndarray,
    weights: jnp.ndarray,
    labels: jnp.ndarray,
    margin1: float = 1.0,
    margin2: float = 0.5,
    margin3: float = 0.0,
    scale: float = 64.0,
    eps: float = 1e-12,
) -> jnp.ndarray:
    """Combined-margin softmax logits: s·cos(m1·θ + m2) − m3 on the target
    class, s·cosθ elsewhere.

    (m1, m2, m3) = (1, 0.5, 0) is ArcFace, (1, 0, 0.35) is CosFace,
    (1, 0.3, 0.2) the InsightFace combined default. The reference's
    "arcface-style" head (networks/triplet.py:119-141) stops at the
    l2-normalized embedding; the margin head itself is part of the
    BASELINE north star.
    """
    emb_n = embeddings / jnp.maximum(
        jnp.linalg.norm(embeddings, axis=-1, keepdims=True), eps
    )
    w_n = weights / jnp.maximum(jnp.linalg.norm(weights, axis=0, keepdims=True), eps)
    cos = jnp.dot(emb_n, w_n, preferred_element_type=jnp.float32)
    cos = jnp.clip(cos, -1.0 + 1e-7, 1.0 - 1e-7)

    onehot = jax.nn.one_hot(labels, weights.shape[1], dtype=cos.dtype)
    theta = jnp.arccos(cos)
    target_cos = jnp.cos(margin1 * theta + margin2) - margin3
    if margin2 > 0.0 or margin1 > 1.0:
        # InsightFace monotonicity guard: past m1·θ + m2 > π the wrapped
        # cosine increases again, creating a degenerate global minimum
        # (every embedding antipodal to every class weight → the margin
        # alone boosts the target by s·(1 − cos m2) with zero
        # discrimination; loss floor ≈ ln(1 + C·e^{−s(1−cos m2)}) ≈ 0.13
        # at C=400, s=64 — observed). Linearize beyond the threshold so
        # the target logit is strictly decreasing in θ. Applies to any
        # (m1, m2) with m1·θ + m2 reachable past π — SphereFace-style
        # m1 > 1 with m2 == 0 included, where the fallback offset
        # 1 + cos(π/m1) keeps the branch at or below cos(π) = −1 at the
        # threshold (continuity bound; m2·sin m2 is the InsightFace
        # constant and dominates for the m1 == 1 family).
        import math as _math

        threshold = _math.cos((_math.pi - margin2) / max(margin1, 1e-9))
        mm = max(margin2 * _math.sin(margin2), threshold + 1.0)
        target_cos = jnp.where(
            cos > threshold, target_cos, cos - mm - margin3,
        )
    logits = jnp.where(onehot > 0, target_cos, cos)
    return logits * scale


def arcface_loss(
    embeddings: jnp.ndarray,
    weights: jnp.ndarray,
    labels: jnp.ndarray,
    margin1: float = 1.0,
    margin2: float = 0.5,
    margin3: float = 0.0,
    scale: float = 64.0,
) -> jnp.ndarray:
    """Cross entropy over combined-margin logits."""
    logits = arcface_logits(embeddings, weights, labels, margin1, margin2, margin3, scale)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    return jnp.mean(nll)


def distance_to_probability(
    distance: jnp.ndarray, tolerance: float = 0.6, tuning_factor: float = 1.0
) -> jnp.ndarray:
    """Map a face distance to a match probability.

    Within the tolerance: gaussian kernel exp(−d / 2σ²); beyond it the
    reciprocal 1/(1+d) (reference: networks/utils.py:12-29 as dispatched
    by api.compare_faces, api.py:242-256).
    """
    gauss = jnp.exp(-distance / (2.0 * tuning_factor**2))
    recip = 1.0 / (1.0 + distance)
    return jnp.where(distance <= tolerance, gauss, recip)


def calc_mean_score(score_dist: jnp.ndarray) -> jnp.ndarray:
    """Normalize a 10-bucket score distribution and return its mean score
    (reference: networks/utils.py:31-39)."""
    s = jnp.asarray(score_dist, jnp.float32)
    s = s / jnp.sum(s)
    return jnp.sum(s * jnp.arange(1, s.shape[-1] + 1))
