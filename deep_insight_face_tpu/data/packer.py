"""Pack LFW-pair images into a single binary for fast eval IO.

Working equivalent of the reference's raw→bin converter
(reference: scripts/raw_img_tf.py:15-86 — a pickle of JPEG-encoded TF
tensors), but framework-neutral and mmap-friendly: one ``.npz`` holding
the encoded JPEG bytes (object-free: offsets + one concatenated byte
blob) plus the issame flags.
"""

from __future__ import annotations

import io
import os
from typing import List, Sequence, Tuple

import numpy as np
from PIL import Image

from deep_insight_face_tpu.data.pairs import read_pairs, resolve_pair_paths


def pack_pairs_bin(
    lfw_dir: str,
    pairs_path: str,
    out_path: str,
    image_size: int = 112,
    quality: int = 95,
) -> Tuple[int, int]:
    """Encode every resolved pair image to JPEG and pack. Returns
    (num_pairs, num_skipped)."""
    pairs = read_pairs(pairs_path)
    paths, issame, skipped = resolve_pair_paths(lfw_dir, pairs)
    blobs: List[bytes] = []
    for p in paths:
        with Image.open(p) as im:
            im = im.convert("RGB").resize((image_size, image_size), Image.BILINEAR)
            buf = io.BytesIO()
            im.save(buf, format="JPEG", quality=quality)
            blobs.append(buf.getvalue())
    offsets = np.zeros(len(blobs) + 1, np.int64)
    for i, b in enumerate(blobs):
        offsets[i + 1] = offsets[i] + len(b)
    blob = np.frombuffer(b"".join(blobs), np.uint8)
    # np.savez APPENDS '.npz' when the path lacks it — write through a
    # file object so the caller's path (conventionally '*.bin') is the
    # path that actually exists and load_pairs_bin(out_path) round-trips
    with open(out_path, "wb") as f:
        np.savez(
            f,
            blob=blob,
            offsets=offsets,
            issame=np.asarray(issame, np.bool_),
            image_size=np.int64(image_size),
        )
    return len(issame), skipped


def load_pairs_bin(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Decode a packed bin → (images (2N, S, S, 3) uint8, issame (N,))."""
    data = np.load(path)
    blob = data["blob"].tobytes()
    offsets = data["offsets"]
    imgs = []
    for i in range(len(offsets) - 1):
        raw = blob[offsets[i] : offsets[i + 1]]
        with Image.open(io.BytesIO(raw)) as im:
            imgs.append(np.asarray(im.convert("RGB"), np.uint8))
    return np.stack(imgs), data["issame"]
