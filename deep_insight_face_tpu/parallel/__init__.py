from deep_insight_face_tpu.parallel.mesh import create_mesh, data_sharding  # noqa: F401
from deep_insight_face_tpu.parallel.train_step import (  # noqa: F401
    TrainState,
    create_train_state,
    make_eval_embed_fn,
    make_train_step,
)

__all__ = [
    "TrainState",
    "create_mesh",
    "create_train_state",
    "data_sharding",
    "make_eval_embed_fn",
    "make_train_step",
]
