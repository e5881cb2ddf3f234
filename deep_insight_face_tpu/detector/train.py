"""Detector training driver (new capability — the reference can only
convert pre-trained Darknet weights, scripts/yolo_convert_tf.py).

Jitted train step over (images, padded gt boxes + valid mask) batches
with the YOLOv3 loss from detector/loss.py, for any detector variant
(full / tiny / tiny_s2d / tiny_mx). Batch images are [0, 255] floats; the step
normalizes to [0, 1] internally, matching the serving paths.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from deep_insight_face_tpu.config import DetectorConfig
from deep_insight_face_tpu.detector.loss import yolo_loss


class DetectorTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)


def create_detector_state(
    model,
    cfg: DetectorConfig,
    rng: jax.Array,
    learning_rate: float = 1e-3,
    input_size: Optional[int] = None,
) -> DetectorTrainState:
    input_size = input_size or cfg.input_size
    k_model, k_state = jax.random.split(rng)
    variables = model.init(
        {"params": k_model},
        jnp.zeros((1, input_size, input_size, 3), jnp.float32),
    )
    tx = optax.adam(learning_rate)
    return DetectorTrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        rng=k_state,
        tx=tx,
        apply_fn=model.apply,
    )


def make_detector_train_step(cfg: DetectorConfig, anchor_masks, input_size=None):
    input_size = input_size or cfg.input_size
    anchors = jnp.asarray(np.array(cfg.anchors, np.float32))

    def loss_fn(params, state, batch):
        # Normalize here so train and serve see identical input scaling:
        # batches arrive [0, 255] (DetectorSampler / raw uint8), and every
        # serving path (FaceDetector._core, pipeline.build_pipeline) also
        # feeds the network image/255.
        heads, mut = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            batch["images"] / 255.0, train=True, mutable=["batch_stats"],
        )
        loss, metrics = yolo_loss(
            heads, batch["boxes"], batch["valid"], anchors, anchor_masks,
            input_size, cfg.num_classes,
        )
        return loss, (mut["batch_stats"], metrics)

    @jax.jit
    def step(state: DetectorTrainState, batch) -> Tuple[DetectorTrainState, Dict]:
        (loss, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state, batch)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            state.replace(
                step=state.step + 1, params=new_params,
                batch_stats=new_stats, opt_state=new_opt,
            ),
            metrics,
        )

    return step
