from deep_insight_face_tpu.ops.distances import (  # noqa: F401
    euclidean_distance,
    gallery_match,
    gallery_scores,
    pairwise_cosine_similarity,
    pairwise_sq_euclidean,
)
from deep_insight_face_tpu.ops.losses import (  # noqa: F401
    arcface_logits,
    arcface_loss,
    contrastive_loss,
    naive_triplet_loss,
    semi_hard_triplet_loss,
)
from deep_insight_face_tpu.ops.mining import (  # noqa: F401
    batch_all_cosine_loss,
    batch_hard_cosine_loss,
    batch_hard_euclidean_auto_alpha_loss,
    batch_hard_euclidean_loss,
)

__all__ = [
    "euclidean_distance",
    "gallery_match",
    "gallery_scores",
    "pairwise_cosine_similarity",
    "pairwise_sq_euclidean",
    "arcface_logits",
    "arcface_loss",
    "contrastive_loss",
    "naive_triplet_loss",
    "semi_hard_triplet_loss",
    "batch_all_cosine_loss",
    "batch_hard_cosine_loss",
    "batch_hard_euclidean_auto_alpha_loss",
    "batch_hard_euclidean_loss",
]
