"""FaceRecognition.from_checkpoint round trip with a trained state."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep_insight_face_tpu.config import (
    Config,
    DataConfig,
    DetectorConfig,
    ModelConfig,
    TrainConfig,
)
from deep_insight_face_tpu.api import FaceRecognition
from deep_insight_face_tpu.models import build_embedding_model
from deep_insight_face_tpu.parallel.train_step import create_train_state
from deep_insight_face_tpu.utils.checkpoint import CheckpointManager


def _cfg(tmp_path):
    return Config(
        model=ModelConfig(backbone="mobilenetv2", head="gdc", embedding_size=16,
                          image_size=32, compute_dtype="float32",
                          width_multiplier=0.35),
        detector=DetectorConfig(variant="tiny", input_size=128),
        train=TrainConfig(mode="arcface", num_classes=4,
                          checkpoint_dir=str(tmp_path / "ckpt")),
    )


def test_from_checkpoint_roundtrip(tmp_path, rng):
    cfg = _cfg(tmp_path)
    model = build_embedding_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0))
    mgr = CheckpointManager(cfg.train.checkpoint_dir, save_every=0)
    mgr.save(state, force=True)
    mgr.wait()

    fr = FaceRecognition.from_checkpoint(cfg.train.checkpoint_dir, cfg=cfg)
    # restored embedder produces the same outputs as the saved params
    x = jnp.array(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    direct = model.apply(
        {"params": {k: v for k, v in state.params.items() if k != "classifier"},
         "batch_stats": state.batch_stats},
        x, train=False,
    )
    via_api = fr._jit_embed(fr.embed_variables, x)
    np.testing.assert_allclose(np.asarray(via_api), np.asarray(direct), atol=1e-5)


def test_from_checkpoint_uses_saved_config(tmp_path, rng):
    """cfg=None: the template comes from the persisted config.json, so a
    non-default num_classes / non-classifier mode restores cleanly
    (ADVICE r1: defaults-built templates broke strict StandardRestore)."""
    cfg = Config(
        model=ModelConfig(backbone="mobilenetv2", head="gdc", embedding_size=16,
                          image_size=32, compute_dtype="float32",
                          width_multiplier=0.35),
        train=TrainConfig(mode="batch_hard", num_classes=7,
                          checkpoint_dir=str(tmp_path / "ckpt")),
    )
    model = build_embedding_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0))
    mgr = CheckpointManager(cfg.train.checkpoint_dir, save_every=0)
    mgr.save_config(cfg)
    mgr.save(state, force=True)
    mgr.wait()

    fr = FaceRecognition.from_checkpoint(cfg.train.checkpoint_dir)
    assert fr.cfg.train.mode == "batch_hard"
    assert fr.cfg.train.num_classes == 7
    x = jnp.array(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    direct = model.apply(
        {"params": {k: v for k, v in state.params.items() if k != "classifier"},
         "batch_stats": state.batch_stats},
        x, train=False,
    )
    np.testing.assert_allclose(
        np.asarray(fr._jit_embed(fr.embed_variables, x)),
        np.asarray(direct), atol=1e-5,
    )


def test_config_json_roundtrip(tmp_path):
    from deep_insight_face_tpu.config import config_from_json, config_to_json

    cfg = _cfg(tmp_path)
    assert config_from_json(config_to_json(cfg)) == cfg


def test_from_checkpoint_missing(tmp_path):
    with pytest.raises(FileNotFoundError):
        FaceRecognition.from_checkpoint(str(tmp_path / "nope"), cfg=_cfg(tmp_path))


def test_face_encodings_batch(tmp_path, rng):
    cfg = _cfg(tmp_path)
    from deep_insight_face_tpu.api import FaceRecognition

    fr = FaceRecognition(cfg=cfg)
    imgs = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    emb, boxes, found = fr.face_encodings_batch(imgs)
    assert emb.shape == (2, cfg.model.embedding_size)
    assert boxes.shape == (2, 4)
    assert found.shape == (2,)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-4)
    # pipeline is cached per geometry
    emb2, _, _ = fr.face_encodings_batch(imgs)
    np.testing.assert_allclose(emb, emb2, atol=1e-6)
