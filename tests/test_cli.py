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
