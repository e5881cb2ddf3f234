"""CLI parser + lightweight subcommand tests."""

import os

import numpy as np
import pytest
from PIL import Image

from deep_insight_face_tpu.cli import build_parser, main


def test_parser_subcommands():
    p = build_parser()
    args = p.parse_args(["train", "--data-dir", "/x", "--mode", "batch_hard"])
    assert args.command == "train" and args.mode == "batch_hard"
    args = p.parse_args(
        ["evaluate", "--data-dir", "/x", "--pairs", "/p", "--flip",
         "--distance-metric", "1"]
    )
    assert args.flip and args.distance_metric == 1
    args = p.parse_args(
        ["generate-pairs", "--image-dir", "/x", "--num-folds", "3",
         "--num-matches-mismatches", "5"]
    )
    assert args.num_folds == 3
    with pytest.raises(SystemExit):
        p.parse_args(["train"])  # missing required --data-dir
    with pytest.raises(SystemExit):
        p.parse_args(["nope"])


@pytest.fixture
def dataset(tmp_path):
    rng = np.random.default_rng(0)
    for name in ["Ann_A", "Bob_B", "Cid_C"]:
        d = tmp_path / name
        d.mkdir()
        for i in range(1, 4):
            arr = rng.integers(0, 255, (10, 10, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{name}_{i:04d}.jpg")
    return tmp_path


def test_cli_generate_pairs_and_pack_bin(dataset, tmp_path, capsys):
    rc = main([
        "generate-pairs", "--image-dir", str(dataset),
        "--num-folds", "2", "--num-matches-mismatches", "3", "--seed", "1",
    ])
    assert rc == 0
    pairs = dataset / "pairs.txt"
    assert pairs.exists()

    out = tmp_path / "packed.npz"
    rc = main([
        "pack-bin", "--image-dir", str(dataset), "--pairs", str(pairs),
        "--output", str(out), "--image-size", "8",
    ])
    assert rc == 0
    assert out.exists()
    captured = capsys.readouterr().out
    assert "packed" in captured


class _FakeFR:
    """Stand-in for FaceRecognition: embedding is a deterministic
    function of the image's constant pixel value, so identity is
    recoverable without running the real pipeline."""

    def __init__(self, *a, **k):
        from types import SimpleNamespace

        # _encode_paths letterboxes to the detector input size by default
        self.cfg = SimpleNamespace(detector=SimpleNamespace(input_size=32))

    def face_encodings_batch(self, images):
        images = np.asarray(images, np.float32)
        n = images.shape[0]
        emb = np.zeros((n, 128), np.float32)
        for i, im in enumerate(images):
            rng = np.random.default_rng(int(im.flat[0]))
            e = rng.standard_normal(128).astype(np.float32)
            emb[i] = e / np.linalg.norm(e)
        # pixel value 0 simulates "no face found"
        found = images.reshape(n, -1)[:, 0] > 0
        return emb, np.zeros((n, 4), np.float32), found

    def face_encodings_batch_multi(self, images):
        emb1, _, found = self.face_encodings_batch(images)
        n = len(images)
        mb = 4
        emb = np.zeros((n, mb, 128), np.float32)
        emb[:, 0] = emb1
        valid = np.zeros((n, mb), bool)
        valid[:, 0] = found
        boxes = np.zeros((n, mb, 4), np.float32)
        return emb, boxes, valid.astype(np.float32), valid


def test_cli_enroll_identify(tmp_path, monkeypatch, capsys):
    monkeypatch.setattr(
        "deep_insight_face_tpu.api.FaceRecognition", _FakeFR
    )
    root = tmp_path / "ids"
    # constant-valued images per identity; mixed sizes exercise the
    # shape-grouped batch path
    for name, value, size in [("Ann", 10, 16), ("Bob", 20, 16),
                              ("Cid", 30, 12)]:
        d = root / name
        d.mkdir(parents=True)
        for i in range(2):
            arr = np.full((size, size, 3), value, np.uint8)
            Image.fromarray(arr).save(d / f"{name}_{i:04d}.png")
    # one identity whose images never pass the decision gate
    d = root / "Zed"
    d.mkdir()
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(d / "Zed_0001.png")

    gal = tmp_path / "gallery.npz"
    rc = main(["enroll", "--image-dir", str(root), "--output", str(gal)])
    assert rc == 0 and gal.exists()
    out = capsys.readouterr()
    assert "enrolled 3/4 identities" in out.out
    assert "Zed: no face detected" in out.err

    q_bob = tmp_path / "query_bob.png"
    Image.fromarray(np.full((16, 16, 3), 20, np.uint8)).save(q_bob)
    q_none = tmp_path / "query_none.png"
    Image.fromarray(np.zeros((12, 12, 3), np.uint8)).save(q_none)
    rc = main(["identify", "--gallery", str(gal), str(q_bob), str(q_none),
               "--top-k", "2", "--min-score", "0.5"])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert lines[0].startswith(f"{q_bob}: Bob (Bob=1.000")
    assert lines[1] == f"{q_none}: no face detected"

    rc = main(["identify", "--gallery", str(gal), str(q_bob), str(q_none),
               "--all-faces", "--min-score", "0.5"])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert lines[0].startswith(f"{q_bob}: face 0 @[0,0,0,0]: Bob (Bob=1.000")
    assert lines[1] == f"{q_none}: no face detected"


def test_cli_identify_min_score_unknown(tmp_path, monkeypatch, capsys):
    monkeypatch.setattr(
        "deep_insight_face_tpu.api.FaceRecognition", _FakeFR
    )
    root = tmp_path / "ids"
    d = root / "Ann"
    d.mkdir(parents=True)
    Image.fromarray(np.full((16, 16, 3), 10, np.uint8)).save(d / "a.png")
    gal = tmp_path / "gallery.npz"
    assert main(["enroll", "--image-dir", str(root),
                 "--output", str(gal)]) == 0
    capsys.readouterr()
    # an unrelated constant value → low cosine vs Ann → 'unknown'
    q = tmp_path / "q.png"
    Image.fromarray(np.full((16, 16, 3), 77, np.uint8)).save(q)
    assert main(["identify", "--gallery", str(gal), str(q),
                 "--min-score", "0.9"]) == 0
    out = capsys.readouterr().out
    assert f"{q}: unknown" in out


def test_cli_train_landmarks(tmp_path):
    from deep_insight_face_tpu.training.landmark import save_landmark_npz

    rng2 = np.random.default_rng(0)
    imgs = rng2.integers(0, 255, (8, 32, 32, 3), dtype=np.uint8)
    lms = rng2.uniform(0, 1, (8, 68, 2)).astype(np.float32)
    data = tmp_path / "lm.npz"
    save_landmark_npz(str(data), imgs, lms)
    out = tmp_path / "lmw.npz"
    rc = main([
        "train-landmarks", "--data", str(data), "--steps", "2",
        "--batch-size", "4", "--output", str(out),
    ])
    assert rc == 0 and out.exists()


def test_letterbox_image():
    from deep_insight_face_tpu.data.dataset import letterbox_image

    img = np.full((20, 40, 3), 200, np.uint8)
    out = letterbox_image(img, 32)
    assert out.shape == (32, 32, 3)
    assert (out[16] == 200).all()      # content band (rows 8..23)
    assert (out[0] == 128).all()       # gray pad, same value as device path
    same = letterbox_image(np.full((32, 32, 3), 7, np.uint8), 32)
    assert (same == 7).all()           # square passthrough
    g = letterbox_image(np.zeros((10, 10), np.uint8), 32)
    assert g.shape == (32, 32, 3)      # grayscale promoted


def test_cli_augmentation_choices_match_ops():
    """cli.py keeps a jax-free literal copy of the augmentation stack
    names; pin it to ops.image.AUGMENTATION_OPTIONS."""
    from deep_insight_face_tpu.cli import build_parser
    from deep_insight_face_tpu.ops.image import AUGMENTATION_OPTIONS

    parser = build_parser()
    train = next(
        a for a in parser._subparsers._group_actions[0].choices.values()
        if any(o.dest == "augmentation" for o in a._actions)
    )
    opt = next(o for o in train._actions if o.dest == "augmentation")
    assert tuple(opt.choices) == AUGMENTATION_OPTIONS
