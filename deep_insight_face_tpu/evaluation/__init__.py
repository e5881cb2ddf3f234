from deep_insight_face_tpu.evaluation.verification import (  # noqa: F401
    VerificationReport,
    calculate_accuracy,
    calculate_roc,
    calculate_val,
    calculate_val_far,
    evaluate,
    kfold_indices,
    pair_distances,
)

__all__ = [
    "VerificationReport",
    "calculate_accuracy",
    "calculate_roc",
    "calculate_val",
    "calculate_val_far",
    "evaluate",
    "kfold_indices",
    "pair_distances",
]
