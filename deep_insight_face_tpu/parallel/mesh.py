"""Device mesh construction.

The reference has no distribution whatsoever (SURVEY §2 #26); this is the
TPU-native scale-out layer: a (data, model) mesh where

- the batch axis is sharded over ``data`` (pure DP for the backbone;
  global batch-hard mining all-gathers embeddings over this axis);
- the ArcFace classifier's identity axis is sharded over ``model``
  (partial-FC / vocab-parallel margin softmax — identity counts in face
  recognition reach 10⁵–10⁷, so the classifier is the one tensor that
  outgrows a chip).

Collectives ride ICI within a slice; XLA inserts them from sharding
annotations (GSPMD) — no hand-written NCCL-style calls.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deep_insight_face_tpu.config import MeshConfig


def create_mesh(
    cfg: Optional[MeshConfig] = None, devices: Optional[Sequence] = None
) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    mp = max(1, cfg.model_parallel)
    if n % mp:
        raise ValueError(f"{n} devices not divisible by model_parallel={mp}")
    dp = cfg.data_parallel if cfg.data_parallel > 0 else n // mp
    if dp * mp != n:
        raise ValueError(f"mesh {dp}×{mp} != {n} devices")
    arr = np.array(devices).reshape(dp, mp)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the data axis."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def classifier_sharding(mesh: Mesh) -> NamedSharding:
    """(D, num_classes) classifier sharded over the model axis."""
    return NamedSharding(mesh, P(None, mesh.axis_names[1]))
