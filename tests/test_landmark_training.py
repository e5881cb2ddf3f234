"""Landmark trainer: wing-loss step learns a synthetic landmark task."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep_insight_face_tpu.models.landmark import LandmarkNet
from deep_insight_face_tpu.training import landmark as L


def _synthetic_batches(rng, n_batches, batch=8, size=32):
    """Images with a bright dot per landmark region; targets = fixed
    layout + small jitter → learnable signal."""
    base = rng.uniform(0.2, 0.8, (68, 2)).astype(np.float32)
    for _ in range(n_batches):
        jitter = rng.normal(scale=0.01, size=(batch, 68, 2)).astype(np.float32)
        lms = np.clip(base[None] + jitter, 0, 1)
        # [0, 255] contract (the step normalizes internally)
        imgs = np.clip(
            rng.normal(loc=128, scale=25, size=(batch, size, size, 3)), 0, 255
        ).astype(np.float32)
        yield {"images": jnp.asarray(imgs), "landmarks": jnp.asarray(lms)}


def test_landmark_training_reduces_loss(rng):
    model = LandmarkNet(width=0.25, dtype=jnp.float32)
    batches = list(_synthetic_batches(rng, 30))
    state, history = L.train_landmarks(
        iter(batches), steps=30, model=model, image_size=32,
        learning_rate=3e-3, seed=1,
    )
    losses = [h["loss"] for h in history]
    assert losses[-1] < losses[0] * 0.8, (losses[0], losses[-1])
    assert int(state.step) == 30
    assert all(np.isfinite(l) for l in losses)


def test_landmark_npz_roundtrip(tmp_path, rng):
    imgs = rng.integers(0, 255, (4, 16, 16, 3), dtype=np.uint8)
    lms = rng.uniform(0, 1, (4, 68, 2)).astype(np.float32)
    L.save_landmark_npz(tmp_path / "lm.npz", imgs, lms)
    back = L.load_landmark_npz(str(tmp_path / "lm.npz"))
    np.testing.assert_array_equal(back["images"], imgs)
    np.testing.assert_allclose(back["landmarks"], lms)
