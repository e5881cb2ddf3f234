from deep_insight_face_tpu.detector.decode import (  # noqa: F401
    correct_letterbox_boxes,
    decode_detections,
    decode_yolo_head,
)
from deep_insight_face_tpu.detector.runner import FaceDetector, select_face  # noqa: F401

__all__ = [
    "FaceDetector",
    "correct_letterbox_boxes",
    "decode_detections",
    "decode_yolo_head",
    "select_face",
]
