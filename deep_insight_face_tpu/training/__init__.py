from deep_insight_face_tpu.training.trainer import Trainer, TrainResult  # noqa: F401

__all__ = ["Trainer", "TrainResult"]
