"""Folder-per-identity dataset scanning and host-side image loading.

Working equivalent of the reference's dataset walkers
(reference: deep_insight_face/detector/utility.py:94-144 ImageClass /
get_dataset, utils/helpers.py:27-70 readers) with deterministic ordering
and a thread-pool JPEG decoder feeding the device pipeline.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageFile

ImageFile.LOAD_TRUNCATED_IMAGES = True  # tolerate truncated files
# (reference: utils/helpers.py:49)

IMAGE_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp")


@dataclass(frozen=True)
class IdentityClass:
    """One identity and its image paths (reference ImageClass,
    detector/utility.py:94-105)."""

    name: str
    image_paths: Tuple[str, ...]

    def __len__(self) -> int:
        return len(self.image_paths)


def get_dataset(root: str, min_images: int = 1) -> List[IdentityClass]:
    """Scan a folder-per-identity tree, sorted for determinism
    (reference: detector/utility.py:123-144)."""
    classes: List[IdentityClass] = []
    for name in sorted(os.listdir(root)):
        d = os.path.join(root, name)
        if not os.path.isdir(d):
            continue
        paths = tuple(
            os.path.join(d, f)
            for f in sorted(os.listdir(d))
            if f.lower().endswith(IMAGE_EXTENSIONS)
        )
        if len(paths) >= min_images:
            classes.append(IdentityClass(name, paths))
    return classes


def load_image(
    path: str, image_size: Optional[int] = None, to_rgb: bool = True
) -> np.ndarray:
    """Decode one image (uint8 HWC), optionally bilinear-resized square."""
    with Image.open(path) as im:
        if to_rgb and im.mode != "RGB":
            im = im.convert("RGB")
        if image_size is not None:
            im = im.resize((image_size, image_size), Image.BILINEAR)
        return np.asarray(im, dtype=np.uint8)


def letterbox_image(
    img: np.ndarray, size: int, pad_value: int = 128
) -> np.ndarray:
    """Host-side aspect-preserving resize + center pad to a (size, size)
    uint8 square — same convention as the device `ops.image.letterbox`
    (scale to fit, gray pad; reference: detector/yolov3.py:108-119).

    Used to stage arbitrarily-sized photo trees into ONE canonical shape
    so the fused pipeline compiles exactly once instead of once per
    distinct resolution."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w = img.shape[:2]
    if h == w == size:
        return np.asarray(img, np.uint8)
    scale = min(size / h, size / w)
    nh = max(int(round(h * scale)), 1)
    nw = max(int(round(w * scale)), 1)
    resized = np.asarray(
        Image.fromarray(np.asarray(img, np.uint8)).resize(
            (nw, nh), Image.BILINEAR
        ),
        np.uint8,
    )
    out = np.full((size, size, 3), pad_value, np.uint8)
    top, left = (size - nh) // 2, (size - nw) // 2
    out[top : top + nh, left : left + nw] = resized
    return out


class ImageLoader:
    """Thread-pool batch decoder (the host half of the input pipeline).

    The reference decodes synchronously inside its generator hot loop —
    its dominant bottleneck (SURVEY §3.1). Decoding here overlaps with
    device compute via data.loader.DevicePrefetcher.
    """

    def __init__(self, num_threads: int = 8, image_size: Optional[int] = None):
        self.image_size = image_size
        self._pool = ThreadPoolExecutor(max_workers=num_threads)

    def load_batch(self, paths: Sequence[str]) -> np.ndarray:
        arrays = list(
            self._pool.map(lambda p: load_image(p, self.image_size), paths)
        )
        return np.stack(arrays)

    def close(self) -> None:
        self._pool.shutdown(wait=False)
