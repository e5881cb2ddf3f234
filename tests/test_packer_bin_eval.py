"""Pairs bin packer + bin-based eval."""

import numpy as np
import pytest
from PIL import Image

from deep_insight_face_tpu.config import EvalConfig
from deep_insight_face_tpu.data.packer import load_pairs_bin, pack_pairs_bin
from deep_insight_face_tpu.data.pairs import generate_pairs
from deep_insight_face_tpu.evaluation.evals import evaluate_bin


@pytest.fixture
def lfw_dir(tmp_path):
    rng = np.random.default_rng(11)
    root = tmp_path / "lfw"
    for i in range(5):
        d = root / f"Person_{i}"
        d.mkdir(parents=True)
        base = rng.integers(0, 255, (20, 20, 3), dtype=np.uint8)
        for j in range(1, 4):
            noisy = np.clip(base.astype(int) + rng.integers(-15, 15, base.shape),
                            0, 255).astype(np.uint8)
            Image.fromarray(noisy).save(d / f"Person_{i}_{j:04d}.jpg")
    generate_pairs(str(root), num_folds=2, num_matches_mismatches=4,
                   write_to_file=True, seed=2, rename_to_lfw=False)
    return root


def test_pack_and_load_roundtrip(lfw_dir, tmp_path):
    out = tmp_path / "pairs.npz"
    n, skipped = pack_pairs_bin(str(lfw_dir), str(lfw_dir / "pairs.txt"),
                                str(out), image_size=16)
    assert skipped == 0 and n > 0
    images, issame = load_pairs_bin(str(out))
    assert images.shape == (2 * n, 16, 16, 3)
    assert images.dtype == np.uint8
    assert issame.shape == (n,)


def test_evaluate_bin(lfw_dir, tmp_path):
    out = tmp_path / "pairs.npz"
    pack_pairs_bin(str(lfw_dir), str(lfw_dir / "pairs.txt"), str(out),
                   image_size=16)
    rng = np.random.default_rng(0)
    proj = rng.normal(size=(16 * 16 * 3, 8)).astype(np.float32)

    def embed(imgs):
        flat = imgs.reshape(imgs.shape[0], -1) @ proj
        return flat / np.maximum(np.linalg.norm(flat, axis=1, keepdims=True), 1e-9)

    report = evaluate_bin(embed, str(out), EvalConfig(n_folds=2, batch_size=4))
    assert 0.0 <= report.accuracy_mean <= 1.0
    assert report.accuracy_mean > 0.55  # near-duplicate same-person images
