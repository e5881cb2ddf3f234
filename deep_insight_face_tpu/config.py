"""Typed configuration tree.

Replaces the reference's fragmented, import-time-side-effecting config
(reference: deep_insight_face/config.py:6-39 — a global EasyDict with an
undefined ``args`` and a ``WEIGHTS_DIR`` that is ``None``) with one frozen
dataclass tree and zero import-time side effects.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any, Mapping, Optional, Tuple


def _weights_dir() -> str:
    return os.path.join(os.path.expanduser("~"), ".deep_insight_face_tpu")


@dataclass(frozen=True)
class ModelConfig:
    """Embedding model configuration.

    Mirrors the reference's FACERECO_CFG block
    (reference: deep_insight_face/config.py:29-39) and the backbone menu of
    networks/{siamese,triplet}.py.
    """

    backbone: str = "resnet50v2"  # resnet50v2 | mobilenetv2 | vgg16 | inception_nn4
    head: str = "gdc"  # v1 (conv stack) | v2 (arcface-style) | gdc | none
    embedding_size: int = 128
    image_size: int = 112
    channels: int = 3
    # bf16 matmuls on the MXU; params stay fp32.
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    l2_normalize: bool = True
    dropout_rate: float = 0.3
    width_multiplier: float = 1.0
    # "batch" (Keras-port compatible) | "group" (batch-independent —
    # immune to the BN batch-statistics shortcut; mobilenetv2 + gdc only)
    norm: str = "batch"

    @property
    def input_shape(self) -> Tuple[int, int, int]:
        return (self.image_size, self.image_size, self.channels)


@dataclass(frozen=True)
class DetectorConfig:
    """YOLOv3-face detector configuration.

    Values mirror the reference defaults (reference:
    deep_insight_face/detector/run.py:129-136, detector/yolov3.py:27-33,127;
    detector/yolo_cfg/yolo_anchors.txt).
    """

    # Default = the shipped serving detector: trained tiny_mx weights
    # (MXU-shaped tiny YOLOv3, models/yolov3.YoloV3TinyMX — measured
    # 12.8k vs 10.6k faces/s end-to-end against tiny_s2d at equal-or-
    # better held-out quality; trained with faceless hard negatives)
    # auto-load in api.FaceRecognition / detector.runner.FaceDetector.
    # tiny_s2d also ships trained weights (416 and 320). "full"
    # (Darknet-53, the reference's default architecture) and "tiny"
    # remain available but ship no trained weights — select them
    # only with weights of your own (cli convert-weights / train-detector).
    variant: str = "tiny_mx"  # full (Darknet-53) | tiny | tiny_s2d (space-to-depth stem) | tiny_mx (MXU-shaped, models/yolov3.YoloV3TinyMX)
    input_size: int = 416
    max_boxes: int = 20
    # Multi-face ENUMERATION threshold (build_multiface_pipeline,
    # detector.runner.FaceDetector) — the reference's 0.4 constant
    # (detector/run.py:135). NOTE: the best-face pipelines' ``found``
    # output is NOT gated here — raise/lower ``decision_threshold`` to
    # tune frame-level face/no-face reporting.
    score_threshold: float = 0.4
    # Candidate floor for the best-face serving pipelines: NMS keeps
    # boxes down to this score so a hard-pose face still yields the best
    # possible crop+embedding, while ``found`` stays gated on
    # ``decision_threshold`` below so faceless frames keep reporting no
    # face. Measured on the held-out procedural world
    # (scripts/e2e_quality.py): the candidate floor lifts crop coverage
    # 0.956 → 0.997 with the faceless found-rate still 0 at the gate.
    candidate_threshold: float = 0.02
    # "Is there a face in this frame?" gate for the best-face pipelines'
    # ``found`` output. Measured operating point for the SHIPPED detector
    # (scripts + .scratch/thr_sweep pattern, 64 held-out face scenes + 64
    # faceless clutter frames): faceless frames score ≤ 5e-5 while
    # hard-pose faces score down to 0.03, so 0.1 lifts decision-gated
    # detection 0.969 → 0.984 at a measured faceless false-positive rate
    # of 0. ``score_threshold`` (0.4, the reference's constant) keeps
    # governing multi-face enumeration, where a lower gate DID admit
    # duplicate boxes (1/32 scenes at 0.1).
    decision_threshold: float = 0.1
    iou_threshold: float = 0.5
    num_classes: int = 1
    bbox_margin: int = 8  # crop margin in px (reference: detector/run.py:76-88)
    anchors: Tuple[Tuple[int, int], ...] = (
        (10, 13), (16, 30), (33, 23),
        (30, 61), (62, 45), (59, 119),
        (116, 90), (156, 198), (373, 326),
    )
    anchor_masks: Tuple[Tuple[int, int, int], ...] = ((6, 7, 8), (3, 4, 5), (0, 1, 2))
    compute_dtype: str = "bfloat16"


@dataclass(frozen=True)
class DataConfig:
    """Data pipeline configuration (reference: deep_insight_face/datagen/generator.py)."""

    batch_size: int = 128
    image_size: int = 112
    augmentation: str = "non_geometric"  # one of ops.image.AUGMENTATION_OPTIONS
    # (default|geometric|non_geometric|both|all|occlusion|none)
    preprocess_mode: str = "tf"  # tf: [-1,1] | caffe: BGR mean-subtract | torch: imagenet norm
    num_decode_threads: int = 8
    prefetch_depth: int = 2
    shuffle_seed: int = 0


@dataclass(frozen=True)
class TrainConfig:
    """Training configuration (reference: deep_insight_face/training/{siamese,triplet}.py)."""

    mode: str = "arcface"  # siamese|triplet|batch_hard|batch_all|semi_hard|arcface
    epochs: int = 20
    steps_per_epoch: int = 100
    learning_rate: float = 1e-4
    weight_decay: float = 5e-4
    margin: float = 0.4  # triplet margin alpha (reference: networks/triplet.py:16)
    contrastive_margin: float = 1.0  # (reference: networks/siamese.py:32-39)
    # batch_hard_auto: new_alpha = mean(dists) * this each step — a
    # RATIO, not a margin (reference: common/losses.py:93,112-113
    # alpha_factor 0.1); was previously conflated with `margin`
    auto_alpha_factor: float = 0.1
    # semi_hard mode margin (reference: tfa.losses.TripletSemiHardLoss
    # default 1.0 via networks/triplet.py:208-211); separate from the
    # naive-triplet `margin` so sweeps touch the mode they name
    semi_hard_margin: float = 1.0
    arcface_margin: float = 0.5
    arcface_scale: float = 64.0
    # Flash (Pallas) margin-softmax: streams the classifier in VMEM tiles
    # instead of materializing (B, C) logits in HBM — use for very large
    # identity counts (ops/margin_softmax.py).
    flash_ce: bool = False
    # Embedding distillation: when a classifier-mode batch carries
    # "distill_targets" (teacher embeddings, L2-normalized, same dim),
    # add distill_weight * mean(1 - cos(student, teacher)) to the loss.
    # Used to pull a small serving-tier student (MobileNetV2-GN) toward
    # the flagship ResNet teacher's embedding geometry
    # (scripts/train_embedder_weights.py --distill-from).
    distill_weight: float = 0.0
    # After this many steps, train with BatchNorm in running-average mode
    # (BN-denial: gradients can't exploit per-batch statistics; running
    # stats keep tracking via a stop-gradient side pass). 0 = never.
    # Guards against the BN shortcut MobileNetV2 ArcFace converges to on
    # small synthetic worlds (see parallel/train_step.make_train_step).
    bn_freeze_step: int = 0
    num_classes: int = 1000  # identities for the classification head
    warmup_steps: int = 100
    # "constant" (reference behavior — plain Adam, networks/triplet.py:178)
    # or "cosine": linear warmup then cosine decay to lr_floor_frac·lr over
    # decay_steps. ArcFace-family recipes depend on end-of-run LR decay for
    # the final margin-tightening phase; opt-in so existing runs don't shift.
    lr_schedule: str = "constant"
    decay_steps: int = 0  # total steps for the cosine horizon (0 = invalid with cosine)
    lr_floor_frac: float = 0.01
    grad_clip_norm: float = 0.0
    early_stop_patience: int = 5  # (reference: training/triplet.py:99-105)
    checkpoint_dir: str = field(default_factory=lambda: os.path.join(_weights_dir(), "ckpt"))
    checkpoint_every: int = 100
    keep_checkpoints: int = 3
    log_every: int = 10
    seed: int = 42
    remat: bool = False  # jax.checkpoint the backbone to trade FLOPs for HBM


@dataclass(frozen=True)
class EvalConfig:
    """LFW-protocol verification eval (reference: deep_insight_face/evaluation/utility.py:10-33)."""

    n_folds: int = 10
    distance_metric: int = 0  # 0: squared euclidean | 1: arccos-cosine / pi
    far_target: float = 1e-3
    threshold_max: float = 4.0
    roc_threshold_step: float = 0.01
    val_threshold_step: float = 0.001
    subtract_mean: bool = False
    use_flipped_images: bool = False
    batch_size: int = 128


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh for scale-out.

    The reference has no distribution at all (SURVEY §2 #26); this is new
    TPU-native design: a (data, model) mesh where the batch is sharded over
    ``data`` (DP, with global batch-hard mining via all-gather) and the
    ArcFace classifier is sharded over ``model`` (partial-FC style TP).
    """

    data_axis: str = "data"
    model_axis: str = "model"
    data_parallel: int = -1  # -1: infer from device count / model_parallel
    model_parallel: int = 1


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    detector: DetectorConfig = field(default_factory=DetectorConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    weights_dir: str = field(default_factory=_weights_dir)

    def replace(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, **kw)


def default_config() -> Config:
    return Config()


def _update_dataclass(obj: Any, updates: Mapping[str, Any]) -> Any:
    """Recursively apply a nested mapping of overrides to a dataclass tree."""
    kw = {}
    for k, v in updates.items():
        if not hasattr(obj, k):
            raise KeyError(f"unknown config key {k!r} for {type(obj).__name__}")
        cur = getattr(obj, k)
        if dataclasses.is_dataclass(cur) and isinstance(v, Mapping):
            kw[k] = _update_dataclass(cur, v)
        elif isinstance(cur, tuple) and isinstance(v, list):
            # JSON round-trip turns tuples into lists (anchors, masks)
            kw[k] = tuple(tuple(x) if isinstance(x, list) else x for x in v)
        else:
            kw[k] = v
    return dataclasses.replace(obj, **kw)


def config_from_overrides(overrides: Optional[Mapping[str, Any]] = None) -> Config:
    cfg = default_config()
    if overrides:
        cfg = _update_dataclass(cfg, overrides)
    return cfg


def config_to_json(cfg: Config) -> str:
    """Serialize the full config tree to JSON (tuples become lists)."""
    import json

    return json.dumps(dataclasses.asdict(cfg), indent=2, sort_keys=True)


def config_from_json(text: str) -> Config:
    """Inverse of config_to_json; unknown keys raise (schema drift guard)."""
    import json

    return _update_dataclass(default_config(), json.loads(text))
