from deep_insight_face_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    data_sharding,
    initialize_distributed,
)
from deep_insight_face_tpu.parallel.serve import (  # noqa: F401
    build_sharded_pipeline,
    serve_stream,
    shard_frames,
)
from deep_insight_face_tpu.parallel.train_step import (  # noqa: F401
    TrainState,
    create_train_state,
    make_eval_embed_fn,
    make_train_step,
)

__all__ = [
    "TrainState",
    "build_sharded_pipeline",
    "shard_frames",
    "create_mesh",
    "create_train_state",
    "data_sharding",
    "serve_stream",
    "initialize_distributed",
    "make_eval_embed_fn",
    "make_train_step",
]
