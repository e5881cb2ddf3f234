"""Pairs.txt golden-file tests (format per reference:
evaluation/utility.py:222-262 and scripts/generate_pairs.py:60-76)."""

import os

import numpy as np
import pytest
from PIL import Image

from deep_insight_face_tpu.data import pairs as P


GOLDEN = """10\t300
Abel_Pacheco\t1\t4
Akhmed_Zakayev\t1\t3
Abdel_Madi_Shabneh\t1\tDean_Barker\t1
Abdel_Madi_Shabneh\t1\tGiancarlo_Fisichella\t1
"""


def test_read_pairs_golden(tmp_path):
    f = tmp_path / "pairs.txt"
    f.write_text(GOLDEN)
    pairs = P.read_pairs(f)
    assert pairs[0] == P.Match("Abel_Pacheco", 1, 4)
    assert pairs[1] == P.Match("Akhmed_Zakayev", 1, 3)
    assert pairs[2] == P.Mismatch("Abdel_Madi_Shabneh", 1, "Dean_Barker", 1)
    assert len(pairs) == 4


def test_read_pairs_malformed(tmp_path):
    f = tmp_path / "pairs.txt"
    f.write_text("1\t1\na\tb\tc\td\te\n")
    with pytest.raises(ValueError):
        P.read_pairs(f)


def _fake_dataset(root, people, images_per_person=4, size=8):
    rng = np.random.default_rng(0)
    for name in people:
        d = root / name
        d.mkdir(parents=True)
        for i in range(1, images_per_person + 1):
            arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{name}_{i:04d}.jpg")


def test_resolve_pair_paths(tmp_path):
    _fake_dataset(tmp_path, ["Alice_A", "Bob_B"])
    pairs = [
        P.Match("Alice_A", 1, 2),
        P.Mismatch("Alice_A", 1, "Bob_B", 3),
        P.Match("Missing_Person", 1, 2),
    ]
    paths, issame, skipped = P.resolve_pair_paths(tmp_path, pairs)
    assert skipped == 1
    assert issame == [True, False]
    assert len(paths) == 4
    assert all(os.path.exists(p) for p in paths)
    assert paths[0].endswith("Alice_A_0001.jpg")


def test_write_read_roundtrip(tmp_path):
    matches = [[P.Match("A_A", 1, 2)], [P.Match("B_B", 2, 3)]]
    mismatches = [[P.Mismatch("A_A", 1, "C_C", 1)], [P.Mismatch("B_B", 1, "D_D", 2)]]
    f = tmp_path / "pairs.txt"
    P.write_pairs(f, matches, mismatches, 2, 1)
    header = f.read_text().splitlines()[0]
    assert header == "2\t1"
    back = P.read_pairs(f)
    assert back == [matches[0][0], mismatches[0][0], matches[1][0], mismatches[1][0]]


def test_transform_to_lfw_format(tmp_path):
    d = tmp_path / "John Smith"
    d.mkdir()
    for name in ["zz.jpg", "aa.jpg"]:
        Image.new("RGB", (4, 4)).save(d / name)
    P.transform_to_lfw_format(tmp_path)
    renamed = tmp_path / "John_Smith"
    assert renamed.is_dir()
    files = sorted(os.listdir(renamed))
    assert files == ["John_Smith_0001.jpg", "John_Smith_0002.jpg"]


def test_generate_pairs_end_to_end(tmp_path):
    people = [f"Person_{c}" for c in "ABCDEFGH"]
    _fake_dataset(tmp_path, people, images_per_person=3)
    match_folds, mismatch_folds = P.generate_pairs(
        tmp_path, num_folds=2, num_matches_mismatches=3, write_to_file=True, seed=7
    )
    assert len(match_folds) == 2 and len(mismatch_folds) == 2
    for fold in match_folds:
        for m in fold:
            assert m.idx1 < m.idx2
    for fold in mismatch_folds:
        for mm in fold:
            assert mm.name1 != mm.name2
            assert mm.name1.lower() <= mm.name2.lower()
    # generated file must resolve against the dataset it came from
    pairs = P.read_pairs(tmp_path / "pairs.txt")
    paths, issame, skipped = P.resolve_pair_paths(tmp_path, pairs)
    assert skipped == 0
    assert len(paths) == 2 * len(issame)
    # determinism
    again = P.generate_pairs(
        tmp_path, num_folds=2, num_matches_mismatches=3, seed=7, rename_to_lfw=False
    )
    assert again == (match_folds, mismatch_folds)


def test_transform_to_lfw_rename_no_clobber(tmp_path):
    """Files whose names already collide with the LFW target sequence
    (e.g. Name_0000.jpg..Name_0005.jpg shifting by one) must survive a
    rename: a naive single-pass os.rename silently destroys all but the
    last (regression: two-phase staged rename)."""
    from deep_insight_face_tpu.data.pairs import transform_to_lfw_format

    d = tmp_path / "person_0"
    d.mkdir()
    contents = {}
    for i in range(6):
        p = d / f"person_0_{i:04d}.jpg"
        p.write_bytes(bytes([i]) * 16)
        contents[i] = p.read_bytes()
    transform_to_lfw_format(tmp_path)
    files = sorted(d.iterdir())
    assert [f.name for f in files] == [
        f"person_0_{i + 1:04d}.jpg" for i in range(6)
    ]
    # contents preserved in order
    for i, f in enumerate(files):
        assert f.read_bytes() == contents[i]
