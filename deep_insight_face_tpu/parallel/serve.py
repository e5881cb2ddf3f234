"""Data-parallel serving: the fused pipeline sharded over the mesh.

The reference serves one image at a time on one device
(reference: deep_insight_face/predictions.py:91-96 `predict_on_batch`);
the single-chip rebuild already fuses detect → NMS → align → embed into
one jitted program (pipeline.py). This module is the scale-out step:
frames shard over the mesh ``data`` axis, weights replicate, and each
device runs the complete per-shard pipeline locally — pure DP, zero
per-step collectives (embedding rows come back still sharded).

``shard_map`` rather than GSPMD sharding annotations: the pipeline calls
a Pallas kernel (ops/nms.non_max_suppression_batch) whose grid the
GSPMD partitioner cannot split — under shard_map every device traces the
kernel on its local (N/dp)-frame block, which is exactly the manual
partitioning the kernel wants. Throughput scales with the ``data`` axis;
devices along ``model`` hold replicas (that axis exists for the
vocab-parallel classifier at train time, parallel/train_step.py).
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from deep_insight_face_tpu.config import Config
from deep_insight_face_tpu.pipeline import build_multiface_pipeline, build_pipeline


def build_sharded_pipeline(
    cfg: Config,
    embed_model,
    mesh,
    detector_model=None,
    align: str = "box",
    landmark_model=None,
    landmark_size: int = 112,
    frame_dtype=None,
    interp_dtype=None,
    multiface: bool = False,
):
    """Mesh-parallel variant of pipeline.build_pipeline.

    Returns a jitted fn with the same signature as the single-device
    pipeline — fn(detector_vars[, landmark_vars], embed_vars, images) —
    whose frame batch must be divisible by the mesh's ``data`` axis size.
    Outputs come back sharded over ``data`` (keep them on-device for a
    sharded gallery match, ops/distances; fetching to host gathers).

    ``multiface=True`` shards build_multiface_pipeline instead (every
    detection embedded, not just the best face).
    """
    kwargs = {}
    if frame_dtype is not None:
        kwargs["frame_dtype"] = frame_dtype
    if interp_dtype is not None:
        kwargs["interp_dtype"] = interp_dtype
    if multiface:
        run = build_multiface_pipeline(
            cfg, embed_model, detector_model, jit=False, align=align,
            landmark_model=landmark_model, landmark_size=landmark_size,
            **kwargs
        )
        n_var_args = 3 if align == "landmark" else 2
    else:
        run = build_pipeline(
            cfg, embed_model, detector_model, jit=False, align=align,
            landmark_model=landmark_model, landmark_size=landmark_size,
            **kwargs
        )
        n_var_args = 3 if align == "landmark" else 2

    data_axis = mesh.axis_names[0]
    in_specs = (P(),) * n_var_args + (P(data_axis),)
    sharded = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=P(data_axis),
        # Pallas calls aren't replication-typed; outputs are genuinely
        # per-shard along data and constant along model (weights are
        # replicated), so skipping the check is sound
        check_vma=False,
    )
    jitted = jax.jit(sharded)
    dp = mesh.shape[data_axis]

    def call(*args):
        images = args[-1]
        if images.shape[0] % dp:
            raise ValueError(
                f"batch {images.shape[0]} not divisible by data-parallel "
                f"size {dp} (mesh {dict(mesh.shape)})"
            )
        return jitted(*args)

    call.jitted = jitted  # chained-bench harnesses wrap the raw program
    return call


def serve_stream(pipeline_fn, var_args, batches, mesh=None, depth: int = 2):
    """Stream frame batches through a serving pipeline, overlapping host
    staging with device compute.

    A background thread device_puts each uint8 frame batch (sharded over
    ``mesh``'s data axis when given) while the device still runs the
    previous one; JAX's async dispatch then keeps the chip busy across
    batch boundaries — the serving analog of the training
    ``DevicePrefetcher`` (data/loader.py), replacing the reference's
    fully synchronous one-image-at-a-time loop
    (reference: deep_insight_face/predictions.py:91-96).

    ``pipeline_fn``: a (single-device or sharded) pipeline callable;
    ``var_args``: its leading weight arguments;
    ``batches``: an iterator of uint8 (N, H, W, C) host arrays.
    Yields pipeline outputs in order (device arrays — don't fetch until
    you need them, or you serialize the overlap away).
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    sentinel = object()
    err: list = []
    stop = threading.Event()

    def put(item) -> bool:
        # bounded put that aborts when the consumer abandons the stream
        # (generator closed / pipeline_fn raised) — otherwise the thread
        # would block forever holding device-resident frame batches
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def stage():
        try:
            for b in batches:
                if not put(shard_frames(b, mesh) if mesh is not None
                           else jax.device_put(b)):
                    return
            put(sentinel)
        except BaseException as e:  # surfaced on the consumer side
            err.append(e)
            put(sentinel)

    t = threading.Thread(target=stage, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise RuntimeError(
                        f"serve_stream staging failed: {err[0]!r}"
                    ) from err[0]
                return
            yield pipeline_fn(*var_args, item)
    finally:
        stop.set()
        try:  # unblock a put in flight so the thread exits promptly
            while True:
                q.get_nowait()
        except queue.Empty:
            pass


def shard_frames(images, mesh) -> jax.Array:
    """Place a host frame batch sharded over the mesh's data axis (the
    device_put is what lets each chip DMA only its own shard)."""
    data_axis = mesh.axis_names[0]
    dp = mesh.shape[data_axis]
    if images.shape[0] % dp:
        raise ValueError(
            f"batch {images.shape[0]} not divisible by data-parallel "
            f"size {dp} (mesh {dict(mesh.shape)})"
        )
    return jax.device_put(images, NamedSharding(mesh, P(data_axis)))
