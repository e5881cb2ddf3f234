from deep_insight_face_tpu.models.embedding import (  # noqa: F401
    EmbeddingModel,
    build_embedding_model,
    init_embedding_params,
)

__all__ = ["EmbeddingModel", "build_embedding_model", "init_embedding_params"]
