"""The training driver: data pipeline + sharded step + checkpoint/resume
+ metrics + early stopping.

Working equivalent of the reference's Train wrappers
(reference: deep_insight_face/training/siamese.py:12-75 and
training/triplet.py:17-120 — thin Keras model.fit calls with
ModelCheckpoint/TensorBoard/EarlyStopping callbacks), redesigned as an
explicit loop: every step is a jitted sharded train_step fed by the
double-buffered device prefetcher, with full-state Orbax checkpoints
(the reference cannot resume; SURVEY §5).
"""

from __future__ import annotations

import dataclasses
import math
import time
from typing import Any, Callable, Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from deep_insight_face_tpu.config import Config
from deep_insight_face_tpu.data.dataset import ImageLoader, get_dataset
from deep_insight_face_tpu.data.loader import DevicePrefetcher
from deep_insight_face_tpu.data.sampler import (
    ClassifierSampler,
    PairSampler,
    PKSampler,
    TripletSampler,
)
from deep_insight_face_tpu.models import build_embedding_model
from deep_insight_face_tpu.ops.image import augment_batch, preprocess
from deep_insight_face_tpu.parallel.mesh import create_mesh, data_sharding
from deep_insight_face_tpu.parallel.train_step import (
    TrainState,
    create_train_state,
    make_train_step,
)
from deep_insight_face_tpu.utils.checkpoint import CheckpointManager
from deep_insight_face_tpu.utils.metrics import MetricsLogger


@dataclasses.dataclass
class TrainResult:
    state: TrainState
    history: List[Dict[str, float]]
    steps: int
    stopped_early: bool
    wall_time_s: float


def make_sampler(cfg: Config, classes, seed: int):
    mode = cfg.train.mode
    b = cfg.data.batch_size
    if mode == "siamese":
        return PairSampler(classes, b, seed=seed)
    if mode == "triplet":
        return TripletSampler(classes, b, seed=seed)
    if mode in ("batch_hard", "batch_hard_euclidean", "batch_hard_auto",
                "batch_all", "semi_hard"):
        k = 4
        p = max(2, b // k)
        return PKSampler(classes, p=p, k=k, seed=seed)
    return ClassifierSampler(classes, b, seed=seed)


class Trainer:
    def __init__(
        self,
        cfg: Config,
        mesh=None,
        log_dir: Optional[str] = None,
    ):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else create_mesh(cfg.mesh)
        self.model = build_embedding_model(cfg.model)
        self.step_fn = make_train_step(cfg, self.mesh)
        self.logger = MetricsLogger(log_dir, name=cfg.train.mode)
        self.ckpt = CheckpointManager(
            cfg.train.checkpoint_dir,
            max_to_keep=cfg.train.keep_checkpoints,
            save_every=cfg.train.checkpoint_every,
        )
        self.ckpt.save_config(cfg)

    # -- state --------------------------------------------------------------

    def init_state(self, resume: bool = True) -> TrainState:
        state = create_train_state(
            self.model, self.cfg, jax.random.key(self.cfg.train.seed),
            mesh=self.mesh,
        )
        if resume and self.ckpt.latest_step() is not None:
            state = self.ckpt.restore(state)
        return state

    # -- data ---------------------------------------------------------------

    def _device_transform(self, host_batch: Dict[str, np.ndarray]) -> Dict[str, Any]:
        """uint8 host batch → augmented, preprocessed float batch (decode on
        host; augmentation runs jitted on device inside the prefetch
        transform). Aug randomness is a deterministic per-batch stream
        seeded from the config."""
        out = {}
        aug_opt = self.cfg.data.augmentation
        self._aug_counter = getattr(self, "_aug_counter", 0) + 1
        key = jax.random.fold_in(
            jax.random.key(self.cfg.data.shuffle_seed), self._aug_counter
        )
        for k, v in host_batch.items():
            if v.ndim == 4:  # image tensor
                x = jnp.asarray(v).astype(jnp.float32)
                if aug_opt != "none":
                    key, sub = jax.random.split(key)
                    x = augment_batch(sub, x, aug_opt)
                out[k] = preprocess(x, self.cfg.data.preprocess_mode)
            else:
                out[k] = jnp.asarray(v)
        return out

    def data_iterator(
        self, dataset_dir: str, num_batches: Optional[int] = None, seed: int = 0
    ) -> Iterator[Dict[str, Any]]:
        from deep_insight_face_tpu.data.native_loader import make_image_loader

        classes = get_dataset(dataset_dir)
        sampler = make_sampler(self.cfg, classes, seed)
        loader = make_image_loader(
            num_threads=self.cfg.data.num_decode_threads,
            image_size=self.cfg.model.image_size,
        )
        return DevicePrefetcher(
            iter(sampler),
            loader,
            depth=self.cfg.data.prefetch_depth,
            num_batches=num_batches,
            transform=self._device_transform,
            sharding=data_sharding(self.mesh),
        )

    # -- loop ---------------------------------------------------------------

    def fit(
        self,
        data: Iterator[Dict[str, Any]],
        state: Optional[TrainState] = None,
        epochs: Optional[int] = None,
        steps_per_epoch: Optional[int] = None,
        on_epoch_end: Optional[Callable[[int, TrainState], None]] = None,
    ) -> TrainResult:
        cfg = self.cfg.train
        epochs = epochs or cfg.epochs
        steps_per_epoch = steps_per_epoch or cfg.steps_per_epoch
        state = state if state is not None else self.init_state()

        best_loss = math.inf
        patience = 0
        stopped = False
        start = time.perf_counter()
        data = iter(data)
        done = 0

        for epoch in range(epochs):
            epoch_losses = []
            for _ in range(steps_per_epoch):
                try:
                    batch = next(data)
                except StopIteration:
                    stopped = True
                    break
                state, metrics = self.step_fn(state, batch)
                done += 1
                step = int(state.step)
                if cfg.log_every and done % cfg.log_every == 0:
                    self.logger.log(step, metrics)
                epoch_losses.append(float(metrics["loss"]))
                self.ckpt.save(state)
            if not epoch_losses:
                break
            mean_loss = float(np.mean(epoch_losses))
            self.logger.log(int(state.step), {"epoch": epoch, "epoch_loss": mean_loss})
            if on_epoch_end:
                on_epoch_end(epoch, state)
            # early stopping on train loss
            # (reference: training/triplet.py:99-105 EarlyStopping patience 5)
            if mean_loss < best_loss - 1e-6:
                best_loss = mean_loss
                patience = 0
            else:
                patience += 1
                if patience >= cfg.early_stop_patience:
                    stopped = True
            if stopped:
                break

        self.ckpt.save(state, force=True)
        self.ckpt.wait()
        return TrainResult(
            state=state,
            history=self.logger.history,
            steps=done,
            stopped_early=stopped,
            wall_time_s=time.perf_counter() - start,
        )

    def fit_directory(self, dataset_dir: str, **kw) -> TrainResult:
        data = self.data_iterator(dataset_dir)
        try:
            return self.fit(data, **kw)
        finally:
            if hasattr(data, "close"):
                data.close()
