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


def _reference_pickle_bin(tmp_path, rng, n_pairs=6, size=20, ragged=False):
    """Write a .bin exactly the way the reference does:
    pickle.dump([list_of_encoded_jpegs, issame_list]) (reference:
    scripts/raw_img_tf.py:72-86)."""
    import io
    import pickle

    encoded, issame = [], []
    for i in range(n_pairs):
        same = i % 2 == 0
        issame.append(same)
        base = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        for j in range(2):
            img = base if (same and j) else rng.integers(
                0, 255, (size + (4 if ragged and j else 0),) * 2 + (3,),
                dtype=np.uint8)
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="JPEG")
            encoded.append(buf.getvalue())
    out = tmp_path / "ref_pairs.bin"
    with open(out, "wb") as f:
        pickle.dump([encoded, issame], f)
    return out, n_pairs, size


def test_reference_pickle_bin_reader(tmp_path):
    rng = np.random.default_rng(3)
    out, n, size = _reference_pickle_bin(tmp_path, rng)
    images, issame = load_pairs_bin(str(out))
    assert images.shape == (2 * n, size, size, 3)
    assert images.dtype == np.uint8
    assert list(issame) == [i % 2 == 0 for i in range(n)]


class FakeEagerTensor:  # module-level so pickle round-trips it
    def __init__(self, b):
        self._b = b

    def numpy(self):
        return self._b


def test_reference_pickle_bin_tensor_entries(tmp_path):
    """Entries pickled as objects exposing .numpy() (tf EagerTensor shape)
    and ragged image sizes (the reference script never resizes) both
    load."""
    import io
    import pickle

    rng = np.random.default_rng(4)
    encoded = []
    for s in (20, 24):  # ragged
        buf = io.BytesIO()
        Image.fromarray(
            rng.integers(0, 255, (s, s, 3), dtype=np.uint8)
        ).save(buf, format="JPEG")
        encoded.append(FakeEagerTensor(buf.getvalue()))
    out = tmp_path / "ref_tensor.bin"
    with open(out, "wb") as f:
        pickle.dump([encoded, [True]], f)
    images, issame = load_pairs_bin(str(out))
    assert images.shape == (2, 20, 20, 3)  # resized to the first image


def test_evaluate_bin_reads_reference_pickle(tmp_path):
    rng = np.random.default_rng(5)
    out, _, size = _reference_pickle_bin(tmp_path, rng, n_pairs=8)
    proj = rng.normal(size=(size * size * 3, 8)).astype(np.float32)

    def embed(imgs):
        flat = imgs.reshape(imgs.shape[0], -1) @ proj
        return flat / np.maximum(np.linalg.norm(flat, axis=1, keepdims=True), 1e-9)

    report = evaluate_bin(embed, str(out), EvalConfig(n_folds=2, batch_size=4))
    assert 0.0 <= report.accuracy_mean <= 1.0


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
