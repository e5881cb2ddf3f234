"""Online batch-mining triplet losses (batch-hard / batch-all per
arXiv 1703.07737).

Semantics match the reference loss classes
(reference: deep_insight_face/common/losses.py:33-148), re-expressed as
pure jnp functions over integer labels:

- cosine variants operate on the similarity matrix of l2-normalized
  embeddings: the hardest positive is the *least similar* positive, the
  hardest negative the *most similar* negative;
- euclidean variants operate on squared distances computed as
  ‖a‖²+‖b‖²−2ab;
- the auto-alpha variant threads its margin as explicit state instead of
  a hidden mutable variable (reference: losses.py:93,112-113 uses a
  non-trainable tf.Variable — impossible under jit; here the caller
  carries ``alpha_state`` in the train state).

All are differentiable and shard_map-friendly: for global mining under
data parallelism, all-gather embeddings+labels over the ``data`` axis and
call these on the gathered batch (see parallel/train_step.py).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from deep_insight_face_tpu.ops.distances import (
    pairwise_cosine_similarity,
    pairwise_sq_euclidean,
)


def _positive_mask(labels: jnp.ndarray) -> jnp.ndarray:
    labels = labels.reshape(-1)
    return labels[:, None] == labels[None, :]


def batch_hard_cosine_loss(
    labels: jnp.ndarray,
    embeddings: jnp.ndarray,
    alpha: float = 0.35,
    reduce: bool = True,
) -> jnp.ndarray:
    """Batch-hard on cosine similarity (reference: losses.py:33-51).

    loss_i = max(max_neg_sim_i − min_pos_sim_i + α, 0). Note the diagonal
    (self-similarity ≈ 1) participates in the positive min exactly as in
    the reference.
    """
    pos_mask = _positive_mask(labels)
    sims = pairwise_cosine_similarity(embeddings)
    hardest_pos = jnp.min(jnp.where(pos_mask, sims, 1.0), axis=-1)
    hardest_neg = jnp.max(jnp.where(pos_mask, -1.0, sims), axis=-1)
    loss = jnp.maximum(hardest_neg - hardest_pos + alpha, 0.0)
    return jnp.mean(loss) if reduce else loss


def batch_hard_euclidean_loss(
    labels: jnp.ndarray,
    embeddings: jnp.ndarray,
    alpha: float = 0.35,
    reduce: bool = True,
) -> jnp.ndarray:
    """Batch-hard on squared euclidean distance (reference: losses.py:54-85).

    loss_i = max(max_pos_dist_i + α − min_neg_dist_i, 0); negatives at
    positive positions are masked to the global max distance.
    """
    pos_mask = _positive_mask(labels)
    dists = pairwise_sq_euclidean(embeddings)
    hardest_pos = jnp.max(jnp.where(pos_mask, dists, 0.0), axis=-1)
    big = jnp.max(dists)
    hardest_neg = jnp.min(jnp.where(pos_mask, big, dists), axis=-1)
    loss = jnp.maximum(hardest_pos + alpha - hardest_neg, 0.0)
    return jnp.mean(loss) if reduce else loss


def batch_hard_euclidean_auto_alpha_loss(
    labels: jnp.ndarray,
    embeddings: jnp.ndarray,
    alpha_state: jnp.ndarray,
    alpha_factor: float = 0.1,
    reduce: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Auto-alpha batch-hard (reference: losses.py:88-128).

    The margin used this step is ``alpha_state`` (carried by the caller);
    the returned new state is mean(dists) × alpha_factor, matching the
    reference's post-step variable assign.
    Returns (loss, new_alpha_state).
    """
    pos_mask = _positive_mask(labels)
    dists = pairwise_sq_euclidean(embeddings)
    hardest_pos = jnp.max(jnp.where(pos_mask, dists, 0.0), axis=-1)
    big = jnp.max(dists)
    hardest_neg = jnp.min(jnp.where(pos_mask, big, dists), axis=-1)
    loss = jnp.maximum(hardest_pos + alpha_state - hardest_neg, 0.0)
    new_alpha = jnp.mean(dists) * alpha_factor
    return (jnp.mean(loss) if reduce else loss), new_alpha


def batch_all_cosine_loss(
    labels: jnp.ndarray,
    embeddings: jnp.ndarray,
    alpha: float = 0.35,
    reduce: bool = True,
) -> jnp.ndarray:
    """Batch-all on cosine similarity (reference: losses.py:131-148).

    Positive term: mean (1 − sim) over all positives of the anchor.
    Negative term: mean sim over negatives within α of the hardest
    positive (denominator +1 as in the reference).
    """
    pos_mask = _positive_mask(labels)
    sims = pairwise_cosine_similarity(embeddings)

    pos_sims = jnp.where(pos_mask, sims, 1.0)
    n_pos = jnp.sum(pos_mask.astype(sims.dtype), axis=-1)
    pos_loss = jnp.sum(1.0 - pos_sims, axis=-1) / n_pos
    hardest_pos = jnp.min(pos_sims, axis=-1, keepdims=True)

    neg_valid = (~pos_mask) & ((hardest_pos - sims) < alpha)
    neg_count = jnp.sum(neg_valid.astype(sims.dtype), axis=-1)
    neg_loss = jnp.sum(jnp.where(neg_valid, sims, 0.0), axis=-1) / (neg_count + 1.0)

    loss = pos_loss + neg_loss
    return jnp.mean(loss) if reduce else loss
