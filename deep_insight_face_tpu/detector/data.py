"""Detector training data: CSV box annotations → padded train batches.

Annotation format (one row per box, header optional):
    path,x1,y1,x2,y2
Paths are relative to the CSV's directory (or absolute). Images are
square-resized to the detector input size with boxes scaled to match
(same convention as the pipeline's crop path; letterbox-style training
can be added by pre-letterboxing the dataset).
"""

from __future__ import annotations

import csv
import os
import random
from typing import Dict, Iterator, List, Sequence, Tuple

import numpy as np

from deep_insight_face_tpu.data.dataset import load_image


def read_box_annotations(csv_path: str) -> Dict[str, List[List[float]]]:
    """{image path: [[x1, y1, x2, y2], …]} from an annotation CSV."""
    root = os.path.dirname(os.path.abspath(csv_path))
    out: Dict[str, List[List[float]]] = {}
    with open(csv_path) as f:
        for row in csv.reader(f):
            if not row or row[0].strip().lower() in ("path", "filename"):
                continue
            if len(row) != 5:
                raise ValueError(f"annotation row needs 5 fields: {row}")
            path = row[0] if os.path.isabs(row[0]) else os.path.join(root, row[0])
            out.setdefault(path, []).append([float(v) for v in row[1:]])
    return out


class DetectorSampler:
    """Infinite shuffled batches of (decoded image, padded boxes, valid)."""

    def __init__(
        self,
        annotations: Dict[str, Sequence[Sequence[float]]],
        batch_size: int,
        input_size: int,
        max_boxes: int = 20,
        seed: int = 0,
    ):
        self.items = sorted(annotations.items())
        if not self.items:
            raise ValueError("no annotated images")
        self.batch_size = batch_size
        self.input_size = input_size
        self.max_boxes = max_boxes
        self.rng = random.Random(seed)

    def _load(self, path: str, boxes: Sequence[Sequence[float]]):
        from PIL import Image

        with Image.open(path) as im:
            w, h = im.size
        img = load_image(path, image_size=self.input_size)
        sx = self.input_size / w
        sy = self.input_size / h
        scaled = np.array(
            [[b[0] * sx, b[1] * sy, b[2] * sx, b[3] * sy] for b in boxes],
            np.float32,
        )[: self.max_boxes]
        padded = np.zeros((self.max_boxes, 4), np.float32)
        valid = np.zeros((self.max_boxes,), bool)
        padded[: len(scaled)] = scaled
        valid[: len(scaled)] = True
        return img, padded, valid

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = list(range(len(self.items)))
        while True:
            self.rng.shuffle(order)
            for start in range(0, len(order), self.batch_size):
                idx = order[start : start + self.batch_size]
                if len(idx) < self.batch_size:  # repeat to keep shapes static
                    # tile enough copies for datasets smaller than one
                    # batch — a single `idx + order` still undersizes
                    # when len(order) < batch_size, breaking the jitted
                    # step's static-shape contract
                    reps = -(-self.batch_size // max(len(order), 1)) + 1
                    idx = (idx + order * reps)[: self.batch_size]
                imgs, boxes, valids = zip(
                    *(self._load(*self.items[i]) for i in idx)
                )
                yield {
                    "images": np.stack(imgs).astype(np.float32),
                    "boxes": np.stack(boxes),
                    "valid": np.stack(valids),
                }
