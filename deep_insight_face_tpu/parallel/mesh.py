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


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Guarded ``jax.distributed.initialize`` for multi-host runs
    (SURVEY §7: "jax.distributed init; ICI intra-slice, DCN across
    slices").

    On TPU pods all three arguments auto-detect from the environment; on
    CPU/GPU clusters pass them (or set JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID). No-ops when distribution is
    already initialized or when nothing requests multiple processes —
    safe to call unconditionally from every entry point.

    Returns True when the distributed runtime is (now) active.
    """
    import os

    # NOTE: must not touch the backend (jax.process_count/jax.devices)
    # before jax.distributed.initialize — it would lock in a
    # single-process runtime
    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return False  # single-process run; nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def create_mesh(
    cfg: Optional[MeshConfig] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """Build the (data, model) mesh.

    Multi-host aware: ``jax.devices()`` orders devices by process, so the
    trailing ``model`` axis is constrained to lie WITHIN one process's
    local devices (ICI) while the leading ``data`` axis spans processes
    (DCN across slices/hosts). Pure-DP data traffic over DCN is only
    the gradient all-reduce; the chatty vocab-parallel ArcFace
    collectives (per-step psum/pmax over ``model``) stay on ICI.
    """
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    mp = max(1, cfg.model_parallel)
    if n % mp:
        raise ValueError(f"{n} devices not divisible by model_parallel={mp}")
    n_proc = len({getattr(d, "process_index", 0) for d in devices})
    if n_proc > 1:
        local = n // n_proc
        if mp > local or local % mp:
            raise ValueError(
                f"model_parallel={mp} must divide the {local} local devices "
                f"per process — the model axis must not cross hosts (DCN)"
            )
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
