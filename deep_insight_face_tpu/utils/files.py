"""File & image-path helpers.

Working equivalents of the reference's utility grab-bag
(reference: deep_insight_face/utils/filehelper.py:15-121 with its
mis-applied @wraps decorators, utils/helpers.py:10-111, and
common/utils.py:73-76 list_pictures) — typed, tested, and side-effect
free.
"""

from __future__ import annotations

import functools
import os
import re
import tempfile
import threading
from typing import Callable, Iterable, List, Optional, Sequence, TypeVar

import numpy as np

T = TypeVar("T")

IMAGE_EXT_RE = re.compile(r".*\.(jpg|jpeg|png|bmp|ppm|tif|tiff)$", re.IGNORECASE)


def list_pictures(directory: str, recursive: bool = True) -> List[str]:
    """All image files under a directory, sorted
    (reference: common/utils.py:73-76)."""
    out: List[str] = []
    if recursive:
        for root, _, files in os.walk(directory):
            out.extend(
                os.path.join(root, f) for f in files if IMAGE_EXT_RE.match(f)
            )
    else:
        out = [
            os.path.join(directory, f)
            for f in os.listdir(directory)
            if IMAGE_EXT_RE.match(f)
        ]
    return sorted(out)


def singleton(cls):
    """Thread-safe class singleton decorator
    (reference: utils/filehelper.py:15-42, detector/yolov3.py:15-24)."""
    instances = {}
    lock = threading.Lock()

    @functools.wraps(cls)
    def get_instance(*args, **kwargs):
        if cls not in instances:
            with lock:
                if cls not in instances:
                    instances[cls] = cls(*args, **kwargs)
        return instances[cls]

    return get_instance


def memoize(fn: Callable[..., T]) -> Callable[..., T]:
    """Hashable-args memoizer (reference: utils/filehelper.py:45-58)."""
    cache = {}
    lock = threading.Lock()

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        key = (args, tuple(sorted(kwargs.items())))
        if key not in cache:
            with lock:
                if key not in cache:
                    cache[key] = fn(*args, **kwargs)
        return cache[key]

    wrapper.cache_clear = cache.clear  # type: ignore[attr-defined]
    return wrapper


def get_weight_path(weights_dir: str, name: str, create: bool = True) -> str:
    """Resolve a weights file path under the weights dir
    (reference: utils/filehelper.py:45, config.py:10 — whose WEIGHTS_DIR
    is None because it stores the makedirs return value)."""
    if create:
        os.makedirs(weights_dir, exist_ok=True)
    return os.path.join(weights_dir, name)


def save_temp_image(image: np.ndarray, suffix: str = ".jpg") -> str:
    """Dump an array to a temp image file, returning its path
    (reference: utils/filehelper.py:114-121, api.py:224-239)."""
    from PIL import Image

    fd, path = tempfile.mkstemp(suffix=suffix)
    os.close(fd)
    arr = np.asarray(image)
    if arr.dtype != np.uint8:
        arr = np.clip(arr, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)
    return path


def concat_images(images: Sequence[np.ndarray], cols: int = 8,
                  pad_value: int = 0) -> np.ndarray:
    """Tile equal-size images into one grid array
    (reference: utils/helpers.py:10-24)."""
    if not len(images):
        raise ValueError("no images")
    h, w = images[0].shape[:2]
    c = images[0].shape[2] if images[0].ndim == 3 else 1
    n = len(images)
    rows = -(-n // cols)
    grid = np.full((rows * h, cols * w, c), pad_value, dtype=images[0].dtype)
    for i, img in enumerate(images):
        if img.shape[:2] != (h, w):
            raise ValueError("images must share a shape")
        r, col = divmod(i, cols)
        grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = (
            img if img.ndim == 3 else img[..., None]
        )
    return grid.squeeze()


def quarantine_failed_image(path: str, quarantine_dir: str) -> str:
    """Move an unreadable image aside instead of crashing the pipeline
    (reference: utils/helpers.py:93-103)."""
    os.makedirs(quarantine_dir, exist_ok=True)
    dest = os.path.join(quarantine_dir, os.path.basename(path))
    os.replace(path, dest)
    return dest
