"""LFW ``pairs.txt`` parsing, resolution and generation.

Byte-compatible with the reference's pair tooling:

- parse format: tab-separated, first line is a ``folds\\tcount`` header,
  3-field lines are same-identity pairs, 4-field lines are mismatches
  (reference: deep_insight_face/evaluation/utility.py:222-262).
- write format + fold/match/mismatch sampling protocol
  (reference: scripts/generate_pairs.py:60-173), but with an explicit
  seeded RNG (the reference uses the global ``random`` module) and a
  bounded rejection-sampling loop instead of a potentially-infinite
  ``while``.
"""

from __future__ import annotations

import os
import pathlib
import random
from glob import glob
from typing import List, NamedTuple, Optional, Sequence, Tuple, Union

import numpy as np

IMAGE_EXTENSIONS = (".jpg", ".jpeg", ".png")


class Match(NamedTuple):
    name: str
    idx1: int
    idx2: int


class Mismatch(NamedTuple):
    name1: str
    idx1: int
    name2: str
    idx2: int


Pair = Union[Match, Mismatch]


# ---------------------------------------------------------------------------
# parsing
# ---------------------------------------------------------------------------


def read_pairs(pairs_filename: Union[str, os.PathLike]) -> List[Pair]:
    """Parse a pairs.txt into typed Match/Mismatch records.

    Skips the header line, tolerates blank lines
    (reference: evaluation/utility.py:256-262).
    """
    pairs: List[Pair] = []
    with open(pairs_filename, "r", encoding="utf-8") as f:
        lines = f.readlines()
    for line in lines[1:]:
        fields = line.strip().split("\t")
        if len(fields) == 1 and not fields[0]:
            continue
        if len(fields) == 3:
            pairs.append(Match(fields[0], int(fields[1]), int(fields[2])))
        elif len(fields) == 4:
            pairs.append(Mismatch(fields[0], int(fields[1]), fields[2], int(fields[3])))
        else:
            raise ValueError(f"malformed pairs line: {line!r}")
    return pairs


def _lfw_image_path(root: str, name: str, idx: int) -> Optional[str]:
    base = os.path.join(root, name, f"{name}_{idx:04d}")
    for ext in (".jpg", ".png", ".jpeg"):
        if os.path.exists(base + ext):
            return base + ext
    return None


def resolve_pair_paths(
    lfw_dir: Union[str, os.PathLike], pairs: Sequence[Pair]
) -> Tuple[List[str], List[bool], int]:
    """Resolve pairs to on-disk file paths.

    Returns (interleaved path list of length 2*kept, issame flags, skipped
    count). Pairs with a missing file are skipped and counted
    (reference: evaluation/utility.py:222-244).
    """
    lfw_dir = str(lfw_dir)
    paths: List[str] = []
    issame: List[bool] = []
    skipped = 0
    for pair in pairs:
        if isinstance(pair, Match):
            p0 = _lfw_image_path(lfw_dir, pair.name, pair.idx1)
            p1 = _lfw_image_path(lfw_dir, pair.name, pair.idx2)
            same = True
        else:
            p0 = _lfw_image_path(lfw_dir, pair.name1, pair.idx1)
            p1 = _lfw_image_path(lfw_dir, pair.name2, pair.idx2)
            same = False
        if p0 and p1:
            paths.extend((p0, p1))
            issame.append(same)
        else:
            skipped += 1
    return paths, issame, skipped


# ---------------------------------------------------------------------------
# writing / generation
# ---------------------------------------------------------------------------


def write_pairs(
    fname: Union[str, os.PathLike],
    match_folds: Sequence[Sequence[Match]],
    mismatch_folds: Sequence[Sequence[Mismatch]],
    num_folds: int,
    num_matches_mismatches: int,
) -> None:
    """Write folds to a tab-separated pairs.txt with LFW header
    (reference: scripts/generate_pairs.py:60-76)."""
    out = [f"{num_folds}\t{num_matches_mismatches}"]
    for match_fold, mismatch_fold in zip(match_folds, mismatch_folds):
        out.extend(f"{m.name}\t{m.idx1}\t{m.idx2}" for m in match_fold)
        out.extend(
            f"{mm.name1}\t{mm.idx1}\t{mm.name2}\t{mm.idx2}" for mm in mismatch_fold
        )
    with open(fname, "w", encoding="utf-8") as f:
        f.write("\n".join(out) + "\n")


def transform_to_lfw_format(image_directory: Union[str, os.PathLike]) -> None:
    """Rename a folder-per-person dataset to LFW naming ``Name_0001.jpg``
    (reference: scripts/generate_pairs.py:44-57)."""
    image_directory = str(image_directory)
    for entry in sorted(os.listdir(image_directory)):
        person_folder = os.path.join(image_directory, entry)
        if not os.path.isdir(person_folder):
            continue
        images = sorted(
            p
            for p in glob(os.path.join(person_folder, "*.*"))
            if p.lower().endswith(IMAGE_EXTENSIONS)
        )
        concat_name = "_".join(entry.split())
        # Two-phase rename: a target name can collide with a NOT-YET-
        # renamed source (e.g. files already named Name_0000.jpg shift by
        # one) and os.rename silently replaces the destination — a direct
        # single-pass rename destroys every image but the last. Stage all
        # files to unique temp names first, then to their final names.
        staged = []
        for i, image_path in enumerate(images):
            ext = pathlib.Path(image_path).suffix
            new_path = os.path.join(person_folder, f"{concat_name}_{i + 1:04d}{ext}")
            if image_path == new_path:
                continue
            # non-image temp suffix: if a crash lands between the stage and
            # finalize phases, leftovers are invisible to the extension
            # filter above, so a rerun is self-healing instead of renaming
            # stale staging files into the identity sequence
            tmp_path = os.path.join(
                person_folder, f".lfw_stage_{i:04d}{ext}.tmp"
            )
            os.rename(image_path, tmp_path)
            staged.append((tmp_path, new_path))
        for tmp_path, new_path in staged:
            os.rename(tmp_path, new_path)
        if concat_name != entry:
            os.rename(person_folder, os.path.join(image_directory, concat_name))


def _person_image_count(image_dir: str, person: str) -> int:
    return len(
        [
            p
            for p in os.listdir(os.path.join(image_dir, person))
            if p.lower().endswith(IMAGE_EXTENSIONS)
        ]
    )


def _capped_total(requested: int, n_people: int, tolerance: float = 1.2) -> int:
    """Cap requested pairs at tolerance × class count
    (reference: scripts/generate_pairs.py:87-93)."""
    total = max(requested, n_people)
    if total > n_people and total / n_people > tolerance:
        return int(n_people * tolerance)
    return total


def _sample_matches(
    image_dir: str, people: Sequence[str], total: int, rng: random.Random
) -> List[Match]:
    counts = {p: _person_image_count(image_dir, p) for p in people}
    eligible = [p for p in people if counts[p] > 1]
    matches: set = set()
    attempts = 0
    max_attempts = max(total * 200, 10_000)
    while len(matches) < total and eligible and attempts < max_attempts:
        attempts += 1
        person = rng.choice(eligible)
        i1, i2 = rng.randrange(1, counts[person] + 1), rng.randrange(1, counts[person] + 1)
        if i1 == i2:
            continue
        matches.add(Match(person, min(i1, i2), max(i1, i2)))
    return sorted(matches, key=lambda m: (m.name.lower(), m.idx1, m.idx2))


def _sample_mismatches(
    image_dir: str, people: Sequence[str], total: int, rng: random.Random
) -> List[Mismatch]:
    counts = {p: _person_image_count(image_dir, p) for p in people}
    eligible = [p for p in people if counts[p] > 0]
    mismatches: set = set()
    attempts = 0
    max_attempts = max(total * 200, 10_000)
    while len(mismatches) < total and len(eligible) > 1 and attempts < max_attempts:
        attempts += 1
        p1, p2 = rng.sample(eligible, 2)
        i1 = rng.randrange(1, counts[p1] + 1)
        i2 = rng.randrange(1, counts[p2] + 1)
        # canonical ordering so the dedup set is order-insensitive
        # (reference: scripts/generate_pairs.py:133-134)
        if p1.lower() > p2.lower():
            p1, i1, p2, i2 = p2, i2, p1, i1
        mismatches.add(Mismatch(p1, i1, p2, i2))
    return sorted(mismatches, key=lambda m: (m.name1.lower(), m.idx1, m.name2.lower()))


def generate_pairs(
    image_dir: Union[str, os.PathLike],
    num_folds: int,
    num_matches_mismatches: int,
    write_to_file: bool = False,
    pairs_file_name: str = "pairs.txt",
    seed: int = 0,
    rename_to_lfw: bool = True,
) -> Tuple[List[List[Match]], List[List[Mismatch]]]:
    """Generate k folds of N matches + N mismatches from a folder-per-person
    dataset (reference: scripts/generate_pairs.py:149-173)."""
    image_dir = str(image_dir)
    rng = random.Random(seed)
    if rename_to_lfw:
        transform_to_lfw_format(image_dir)
    names = sorted(
        d for d in os.listdir(image_dir) if os.path.isdir(os.path.join(image_dir, d))
    )
    rng.shuffle(names)
    folds = [list(arr) for arr in np.array_split(names, num_folds)]
    match_folds, mismatch_folds = [], []
    for fold in folds:
        total = _capped_total(num_matches_mismatches, max(len(fold), 1))
        match_folds.append(_sample_matches(image_dir, fold, total, rng))
        mismatch_folds.append(_sample_mismatches(image_dir, fold, total, rng))
    if write_to_file:
        write_pairs(
            os.path.join(image_dir, pairs_file_name),
            match_folds,
            mismatch_folds,
            num_folds,
            num_matches_mismatches,
        )
    return match_folds, mismatch_folds
