"""Trainer loop end-to-end (tiny data), checkpoint resume, LFW eval run."""

import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from deep_insight_face_tpu.config import (
    Config,
    DataConfig,
    EvalConfig,
    MeshConfig,
    ModelConfig,
    TrainConfig,
)
from deep_insight_face_tpu.evaluation.evals import embed_paths, evaluate_lfw, report_to_csv
from deep_insight_face_tpu.training.trainer import Trainer


@pytest.fixture
def dataset_dir(tmp_path):
    rng = np.random.default_rng(7)
    root = tmp_path / "faces"
    for i in range(6):
        d = root / f"Person_{i}"
        d.mkdir(parents=True)
        base = rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)
        for j in range(1, 4):
            noisy = np.clip(
                base.astype(int) + rng.integers(-20, 20, base.shape), 0, 255
            ).astype(np.uint8)
            Image.fromarray(noisy).save(d / f"Person_{i}_{j:04d}.jpg")
    return root


def _cfg(tmp_path, mode="arcface"):
    return Config(
        model=ModelConfig(
            backbone="mobilenetv2", head="gdc", embedding_size=16,
            image_size=24, compute_dtype="float32", width_multiplier=0.35,
        ),
        data=DataConfig(batch_size=8, augmentation="none", num_decode_threads=2),
        train=TrainConfig(
            mode=mode, num_classes=6, epochs=2, steps_per_epoch=3,
            learning_rate=1e-3, warmup_steps=0, weight_decay=0.0,
            checkpoint_dir=str(tmp_path / "ckpt"), checkpoint_every=0,
            log_every=1, early_stop_patience=50,
        ),
        mesh=MeshConfig(),
    )


def test_trainer_fit_directory_and_resume(dataset_dir, tmp_path):
    cfg = _cfg(tmp_path)
    trainer = Trainer(cfg, log_dir=str(tmp_path / "logs"))
    result = trainer.fit_directory(str(dataset_dir))
    assert result.steps == 6
    assert int(result.state.step) == 6
    assert np.isfinite(result.history[-1].get("epoch_loss", np.nan))
    assert os.path.exists(tmp_path / "logs")

    # resume: a fresh trainer restores step 6 from the checkpoint
    trainer2 = Trainer(cfg)
    state2 = trainer2.init_state(resume=True)
    assert int(state2.step) == 6
    # and continues training
    result2 = trainer2.fit_directory(str(dataset_dir), state=state2, epochs=1)
    assert int(result2.state.step) == 9


def test_trainer_siamese_mode(dataset_dir, tmp_path):
    cfg = _cfg(tmp_path, mode="siamese")
    trainer = Trainer(cfg)
    result = trainer.fit_directory(str(dataset_dir), epochs=1, steps_per_epoch=2)
    assert result.steps == 2


def test_embed_paths_and_lfw_eval(dataset_dir, tmp_path):
    from deep_insight_face_tpu.data.pairs import generate_pairs

    generate_pairs(str(dataset_dir), num_folds=2, num_matches_mismatches=4,
                   write_to_file=True, seed=3, rename_to_lfw=False)

    d = 16
    rng = np.random.default_rng(0)
    proj = rng.normal(size=(24 * 24 * 3, d)).astype(np.float32)

    def embed_fn(imgs):
        flat = imgs.reshape(imgs.shape[0], -1) @ proj
        return flat / np.maximum(np.linalg.norm(flat, axis=1, keepdims=True), 1e-9)

    report = evaluate_lfw(
        embed_fn, str(dataset_dir), str(dataset_dir / "pairs.txt"),
        EvalConfig(n_folds=2, batch_size=4), image_size=24,
    )
    assert 0.0 <= report.accuracy_mean <= 1.0
    # images of the same person are near-duplicates → should separate well
    assert report.accuracy_mean > 0.6
    out = tmp_path / "report.csv"
    report_to_csv(report, str(out))
    text = out.read_text()
    assert "accuracy_mean" in text and "tpr" in text


def test_embed_paths_flip_fusion(dataset_dir):
    from deep_insight_face_tpu.data.dataset import get_dataset

    classes = get_dataset(str(dataset_dir))
    paths = [p for c in classes for p in c.image_paths][:5]
    calls = []

    def embed_fn(imgs):
        calls.append(imgs.shape)
        return imgs.reshape(imgs.shape[0], -1)[:, :8]

    out = embed_paths(embed_fn, paths, image_size=24, batch_size=4, use_flipped=True)
    assert out.shape == (5, 8)
    assert len(calls) == 4  # 2 batches × (orig + flipped)


def test_pair_details_csv(tmp_path, rng):
    from deep_insight_face_tpu.evaluation.evals import pair_details_to_csv

    n = 6
    emb = rng.normal(size=(2 * n, 8))
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    paths = [f"/x/img{i}.jpg" for i in range(2 * n)]
    issame = [True, False, True, False, True, False]
    out = tmp_path / "details.csv"
    rows = pair_details_to_csv(str(out), paths, emb, issame, threshold=1.0)
    assert rows == n
    lines = out.read_text().strip().splitlines()
    assert lines[0].startswith("path_a,path_b")
    assert len(lines) == n + 1
    outcomes = {l.split(",")[-1] for l in lines[1:]}
    assert outcomes <= {"TP", "FP", "TN", "FN"}


@pytest.mark.slow
def test_training_improves_verification(tmp_path):
    """The complete learn→verify loop: ArcFace training on a separable
    synthetic identity set must lift LFW-protocol accuracy well above
    chance (untrained baseline ≈ 0.5-0.7 on this data)."""
    from deep_insight_face_tpu.data.pairs import generate_pairs

    rng = np.random.default_rng(3)
    root = tmp_path / "sepfaces"
    # identities = distinct color patterns + noise (linearly separable)
    n_ids, imgs_per = 8, 6
    for i in range(n_ids):
        d = root / f"Id_{i}"
        d.mkdir(parents=True)
        base = np.zeros((24, 24, 3), np.float32)
        base[:, :, i % 3] = 200.0
        base[(i * 3) % 20 : (i * 3) % 20 + 4, :, :] = 255.0
        for j in range(1, imgs_per + 1):
            from PIL import Image

            noisy = np.clip(base + rng.normal(0, 15, base.shape), 0, 255)
            Image.fromarray(noisy.astype(np.uint8)).save(d / f"Id_{i}_{j:04d}.jpg")

    cfg = Config(
        model=ModelConfig(backbone="mobilenetv2", head="gdc", embedding_size=16,
                          image_size=24, compute_dtype="float32",
                          width_multiplier=0.35),
        data=DataConfig(batch_size=16, augmentation="none", num_decode_threads=2),
        train=TrainConfig(mode="arcface", num_classes=n_ids, epochs=14,
                          steps_per_epoch=16, learning_rate=5e-3,
                          warmup_steps=0, weight_decay=0.0,
                          checkpoint_dir=str(tmp_path / "ck2"),
                          checkpoint_every=0, log_every=0,
                          early_stop_patience=100),
    )
    trainer = Trainer(cfg)
    result = trainer.fit_directory(str(root))
    state = result.state

    jit_embed = jax.jit(lambda v, x: trainer.model.apply(v, x, train=False))
    variables = {
        "params": {k: v for k, v in state.params.items() if k != "classifier"},
        "batch_stats": state.batch_stats,
    }
    from deep_insight_face_tpu.ops.image import preprocess as pp

    def embed_fn(imgs):
        return np.asarray(jit_embed(variables, pp(jnp.asarray(imgs), "tf")))

    generate_pairs(str(root), num_folds=2, num_matches_mismatches=10,
                   write_to_file=True, seed=5, rename_to_lfw=False)
    report = evaluate_lfw(
        embed_fn, str(root), str(root / "pairs.txt"),
        EvalConfig(n_folds=2, batch_size=16, distance_metric=1,
                   roc_threshold_step=0.0005, threshold_max=1.0,
                   val_threshold_step=0.0005),
        image_size=24,
    )
    assert report.accuracy_mean > 0.85, report.summary()
