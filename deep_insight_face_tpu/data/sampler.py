"""Batch samplers: pair / triplet / PK-identity, seeded and infinite.

Working equivalents of the reference's generators
(reference: deep_insight_face/datagen/generator.py:44-235 — whose triplet
generator wrongly builds 2-image pairs, generator.py:144 vs :170; here
the triplet sampler actually yields (anchor, positive, negative)).

Samplers yield PATH batches; decode + augmentation happen downstream
(host thread pool → device aug), keeping this layer trivially testable.
"""

from __future__ import annotations

import random
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from deep_insight_face_tpu.data.dataset import IdentityClass
from deep_insight_face_tpu.data.pairs import Match, Mismatch, Pair, resolve_pair_paths


class PairSampler:
    """Infinite 50/50 genuine/impostor pair batches from identity folders
    (reference facematch generator: datagen/generator.py:78-109,183-235)."""

    def __init__(
        self,
        classes: Sequence[IdentityClass],
        batch_size: int,
        seed: int = 0,
    ):
        self.classes = [c for c in classes if len(c) >= 1]
        self.multi = [c for c in self.classes if len(c) >= 2]
        if len(self.classes) < 2 or not self.multi:
            raise ValueError("need ≥2 identities and ≥1 identity with ≥2 images")
        self.batch_size = batch_size
        self.rng = random.Random(seed)

    def __iter__(self) -> Iterator[Dict[str, List]]:
        while True:
            a_paths, b_paths, labels = [], [], []
            for i in range(self.batch_size):
                if i % 2 == 0:  # genuine
                    c = self.rng.choice(self.multi)
                    p1, p2 = self.rng.sample(list(c.image_paths), 2)
                    a_paths.append(p1)
                    b_paths.append(p2)
                    labels.append(1)
                else:  # impostor
                    c1, c2 = self.rng.sample(self.classes, 2)
                    a_paths.append(self.rng.choice(c1.image_paths))
                    b_paths.append(self.rng.choice(c2.image_paths))
                    labels.append(0)
            yield {
                "paths_a": a_paths,
                "paths_b": b_paths,
                "labels": np.array(labels, np.int32),
            }


class TripletSampler:
    """Infinite (anchor, positive, negative) path batches
    (the *intended* behavior of datagen/generator.py:44-75,127-180)."""

    def __init__(
        self,
        classes: Sequence[IdentityClass],
        batch_size: int,
        seed: int = 0,
    ):
        self.multi = [c for c in classes if len(c) >= 2]
        self.classes = list(classes)
        if len(self.classes) < 2 or not self.multi:
            raise ValueError("need ≥2 identities and ≥1 identity with ≥2 images")
        self.batch_size = batch_size
        self.rng = random.Random(seed)

    def __iter__(self) -> Iterator[Dict[str, List]]:
        while True:
            anchors, positives, negatives = [], [], []
            for _ in range(self.batch_size):
                pos_class = self.rng.choice(self.multi)
                a, p = self.rng.sample(list(pos_class.image_paths), 2)
                neg_class = self.rng.choice(
                    [c for c in self.classes if c.name != pos_class.name]
                )
                n = self.rng.choice(neg_class.image_paths)
                anchors.append(a)
                positives.append(p)
                negatives.append(n)
            yield {"anchor": anchors, "positive": positives, "negative": negatives}


class PKSampler:
    """P identities × K images per batch — the batch construction required
    for batch-hard mining (arXiv 1703.07737 §2; nothing equivalent exists
    in the reference, whose mining loss receives pair-class labels)."""

    def __init__(
        self,
        classes: Sequence[IdentityClass],
        p: int,
        k: int,
        seed: int = 0,
    ):
        self.classes = [c for c in classes if len(c) >= 1]
        if len(self.classes) < p:
            raise ValueError(f"need ≥{p} identities, have {len(self.classes)}")
        self.p, self.k = p, k
        self.rng = random.Random(seed)

    @property
    def batch_size(self) -> int:
        return self.p * self.k

    def __iter__(self) -> Iterator[Dict[str, List]]:
        while True:
            paths, labels = [], []
            chosen = self.rng.sample(range(len(self.classes)), self.p)
            for label in chosen:
                c = self.classes[label]
                imgs = list(c.image_paths)
                picks = (
                    self.rng.sample(imgs, self.k)
                    if len(imgs) >= self.k
                    else [self.rng.choice(imgs) for _ in range(self.k)]
                )
                paths.extend(picks)
                labels.extend([label] * self.k)
            yield {"paths": paths, "labels": np.array(labels, np.int32)}


class ClassifierSampler:
    """Uniform (image, identity-label) batches for margin-softmax training
    (the reference's semihard path uses flow_from_directory sparse labels,
    training/triplet.py:60-73)."""

    def __init__(
        self,
        classes: Sequence[IdentityClass],
        batch_size: int,
        seed: int = 0,
    ):
        self.flat: List[Tuple[str, int]] = [
            (p, i) for i, c in enumerate(classes) for p in c.image_paths
        ]
        if not self.flat:
            raise ValueError("empty dataset")
        if len(self.flat) < batch_size:
            # the epoch loop below would yield nothing and spin forever
            raise ValueError(
                f"dataset has {len(self.flat)} images < batch_size "
                f"{batch_size}; shrink the batch or add data"
            )
        self.batch_size = batch_size
        self.rng = random.Random(seed)

    @property
    def num_classes(self) -> int:
        return max(l for _, l in self.flat) + 1

    def __iter__(self) -> Iterator[Dict[str, List]]:
        order = list(range(len(self.flat)))
        while True:
            self.rng.shuffle(order)
            for start in range(0, len(order) - self.batch_size + 1, self.batch_size):
                idx = order[start : start + self.batch_size]
                yield {
                    "paths": [self.flat[i][0] for i in idx],
                    "labels": np.array([self.flat[i][1] for i in idx], np.int32),
                }


class LFWPairBatcher:
    """Fixed-order eval batches from a parsed pairs.txt (for the LFW
    verification protocol; reference: evaluation/evals.py:40-59)."""

    def __init__(self, lfw_dir: str, pairs: Sequence[Pair], batch_size: int):
        self.paths, self.issame, self.skipped = resolve_pair_paths(lfw_dir, pairs)
        self.batch_size = batch_size

    def __iter__(self) -> Iterator[List[str]]:
        for start in range(0, len(self.paths), self.batch_size):
            yield self.paths[start : start + self.batch_size]
