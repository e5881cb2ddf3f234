"""deep_insight_face_tpu — a TPU-native JAX face recognition framework.

A ground-up rebuild of the capabilities of ``sandyz1000/deep-insight-face``
(reference mounted at /root/reference) designed TPU-first:

- compute path: JAX / XLA / Pallas kernels (NMS, fused align-warp,
  margin-softmax, blocked cosine gallery matmul), jit everywhere,
  static shapes, bf16 matmuls on the MXU;
- scale-out: ``jax.sharding.Mesh`` + ``shard_map`` data parallelism with
  global batch-hard mining over all-gathered embeddings, and
  model-parallel (partial-FC style) ArcFace classifiers;
- runtime: host-side decode pipeline overlapped with device compute via
  double-buffered prefetch (native C++ decode pool in ``native/``).

Public API surface mirrors the reference's ``api.py``
(reference: deep_insight_face/api.py:94-256):
``face_distance``, ``face_encodings``, ``compare_faces``,
``detect_and_alignment``, ``face_landmarks`` — plus training, evaluation,
detection and one-shot gallery matching subpackages.
"""

__version__ = "0.1.0"

from deep_insight_face_tpu.config import (  # noqa: F401
    Config,
    DataConfig,
    DetectorConfig,
    EvalConfig,
    MeshConfig,
    ModelConfig,
    TrainConfig,
    default_config,
)

__all__ = [
    "Config",
    "DataConfig",
    "DetectorConfig",
    "EvalConfig",
    "MeshConfig",
    "ModelConfig",
    "TrainConfig",
    "default_config",
    "__version__",
]
