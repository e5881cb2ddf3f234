"""Landmark regressor training (models/landmark.LandmarkNet + wing loss).

The reference has NO landmark trainer — it depends on an external,
uninstalled landmark package (reference: deep_insight_face/api.py:17-25).
This closes the gap: a jitted train step over (image, 68×2-landmark)
batches with wing loss, NME eval, and the same Orbax checkpointing as
the embedding trainers.

Dataset format: any iterator of {"images": (B, S, S, 3) float [0, 255],
"landmarks": (B, 68, 2) normalized [0, 1]} batches (the step applies the
serving "tf" preprocessing internally);
``load_landmark_npz`` reads the simple packed form
(images uint8 + landmarks float32 arrays in one npz).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from deep_insight_face_tpu.models.landmark import LandmarkNet
from deep_insight_face_tpu.ops.landmark_loss import normalized_mean_error, wing_loss
from deep_insight_face_tpu.utils.metrics import MetricsLogger


class LandmarkTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)


def load_landmark_npz(path: str) -> Dict[str, np.ndarray]:
    data = np.load(path)
    return {"images": data["images"], "landmarks": data["landmarks"]}


def save_landmark_npz(path: str, images: np.ndarray, landmarks: np.ndarray) -> None:
    np.savez(path, images=np.asarray(images, np.uint8),
             landmarks=np.asarray(landmarks, np.float32))


def create_landmark_state(
    model: LandmarkNet,
    rng: jax.Array,
    image_size: int = 112,
    learning_rate: float = 1e-4,
    weight_decay: float = 1e-6,
) -> LandmarkTrainState:
    k_model, k_state = jax.random.split(rng)
    dummy = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    variables = model.init({"params": k_model}, dummy, train=False)
    tx = optax.adamw(learning_rate, weight_decay=weight_decay)
    return LandmarkTrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        rng=k_state,
        tx=tx,
        apply_fn=model.apply,
    )


def make_landmark_train_step(omega: float = 10.0, epsilon: float = 2.0):
    def loss_fn(params, state, batch, rng):
        # Normalize here so train and serve agree: batches arrive
        # [0, 255]; the serving paths (api.raw_landmarks, the fused
        # pipeline) feed the net preprocess(crop, "tf") = x/127.5 - 1.
        from deep_insight_face_tpu.ops.image import preprocess

        pred, mut = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            preprocess(batch["images"], "tf"), train=True,
            rngs={"dropout": rng}, mutable=["batch_stats"],
        )
        loss = wing_loss(pred, batch["landmarks"], omega=omega, epsilon=epsilon)
        return loss, (mut["batch_stats"], pred)

    @jax.jit
    def step(state: LandmarkTrainState, batch):
        rng, sub = jax.random.split(state.rng)
        (loss, (new_stats, pred)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state, batch, sub)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        nme = normalized_mean_error(pred, batch["landmarks"])
        return (
            state.replace(
                step=state.step + 1, params=new_params,
                batch_stats=new_stats, opt_state=new_opt, rng=rng,
            ),
            {"loss": loss, "nme": nme},
        )

    return step


def train_landmarks(
    data: Iterator[Dict[str, jnp.ndarray]],
    steps: int,
    state: Optional[LandmarkTrainState] = None,
    model: Optional[LandmarkNet] = None,
    image_size: int = 112,
    learning_rate: float = 1e-4,
    log_dir: Optional[str] = None,
    seed: int = 0,
) -> Tuple[LandmarkTrainState, list]:
    """Simple driver: iterate ``steps`` batches through the wing-loss step."""
    model = model or LandmarkNet()
    if state is None:
        state = create_landmark_state(
            model, jax.random.key(seed), image_size, learning_rate
        )
    step = make_landmark_train_step()
    logger = MetricsLogger(log_dir, name="landmark")
    data = iter(data)
    for _ in range(steps):
        batch = next(data)
        state, metrics = step(state, batch)
        logger.log(int(state.step), metrics)
    logger.close()
    return state, logger.history
