"""Shipped-weights registry.

The reference presumes externally downloaded weight files and hard-exits
without them (reference: api.py:17-25 external landmark package,
config.py:18-20 YOLO .h5 paths). Here the repo ships small weight files
trained in-repo on the procedural face world (data/synthetic.py,
scripts/train_*_weights.py); api.FaceRecognition picks them up by
default and everything still degrades gracefully when a file is absent
(template-projection landmarks, randomly initialized detector).
"""

from __future__ import annotations

import os
from typing import Any, Optional

WEIGHTS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "weights"
)


def weights_path(name: str) -> Optional[str]:
    """Absolute path of a shipped weight file, or None if not shipped."""
    p = os.path.join(WEIGHTS_DIR, name)
    return p if os.path.exists(p) else None


def load_landmark_variables() -> Optional[Any]:
    """Shipped LandmarkNet (68-pt) variables, or None."""
    from deep_insight_face_tpu.utils.weights import load_npz

    p = weights_path("landmark_68.npz")
    return load_npz(p) if p else None


def load_detector_variables(
    variant: str = "tiny_mx", input_size: Optional[int] = None
) -> Optional[Any]:
    """Shipped YOLO face-detector variables for ``variant``, or None.

    Prefers weights trained at ``input_size``
    (``detector_<variant>_<size>.npz``); the YOLO net is fully
    convolutional so the unsuffixed 416-trained file is a usable
    fallback at other sizes (anchors are absolute px)."""
    from deep_insight_face_tpu.utils.weights import load_npz

    if input_size is not None:
        p = weights_path(f"detector_{variant}_{input_size}.npz")
        if p:
            return load_npz(p)
    p = weights_path(f"detector_{variant}.npz")
    return load_npz(p) if p else None


def load_embedder_variables(name: str = "embedder_synth") -> Optional[Any]:
    """Shipped embedding-model variables (trained on the synthetic
    identity world), or None."""
    from deep_insight_face_tpu.utils.weights import load_npz

    p = weights_path(f"{name}.npz")
    return load_npz(p) if p else None


def load_matching_embedder(model_cfg) -> Optional[Any]:
    """Shipped embedder variables whose sidecar ModelConfig matches
    ``model_cfg`` exactly (backbone/head/size/width/channels), or None.

    Shipped embedders are trained per backbone
    (scripts/train_embedder_weights.py writes
    ``embedder_synth_<backbone>.npz`` + a JSON sidecar with the exact
    ModelConfig); loading weights into a differently-shaped model would
    fail or silently misbehave, so a config mismatch returns None and
    the caller falls back to random initialization.
    """
    import dataclasses
    import json

    suffix = "_gn" if getattr(model_cfg, "norm", "batch") == "group" else ""
    p = weights_path(f"embedder_synth_{model_cfg.backbone}{suffix}.npz")
    if p is None:
        return None
    sidecar = p.replace(".npz", ".json")
    if not os.path.exists(sidecar):
        return None
    with open(sidecar) as f:
        shipped = json.load(f).get("model", {})
    want = dataclasses.asdict(model_cfg)
    checked = ("backbone", "head", "embedding_size", "image_size",
               "width_multiplier", "channels", "norm")
    # A key absent from the sidecar is a mismatch, not a pass: a stale or
    # hand-edited sidecar missing e.g. image_size must not silently load
    # shape-mismatched weights.
    if any(shipped.get(k) != want.get(k) for k in checked):
        return None
    from deep_insight_face_tpu.utils.weights import load_npz

    return load_npz(p)
