from deep_insight_face_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    data_sharding,
    initialize_distributed,
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


# serve.py pulls the whole serving stack (pipeline, detector models,
# align/NMS ops); keep it OUT of the eager imports so training-only
# entry points don't pay the import (PEP 562 lazy re-export).
_SERVE_EXPORTS = ("build_sharded_pipeline", "serve_stream", "shard_frames")


def __getattr__(name):
    if name in _SERVE_EXPORTS:
        from deep_insight_face_tpu.parallel import serve

        return getattr(serve, name)
    raise AttributeError(
        f"module {__name__!r} has no attribute {name!r}"
    )
