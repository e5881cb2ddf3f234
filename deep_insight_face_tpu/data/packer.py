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
    """Decode a packed bin → (images (2N, S, S, 3) uint8, issame (N,)).

    Accepts both this package's ``.npz`` layout (pack_pairs_bin) and the
    reference's pickle format — ``pickle.dump([encoded_jpegs, issame])``
    (reference: scripts/raw_img_tf.py:85-86) — read-only, so users of
    ``deepface_raw_img_tfbinary`` can evaluate existing artifacts
    directly. Re-pack with ``deep-insight-face-tpu pack-bin`` for the
    faster offset-indexed layout.
    """
    with open(path, "rb") as f:
        magic = f.read(2)
    if magic != b"PK":  # np.savez writes a zip; anything else → pickle
        return _load_reference_pickle_bin(path)
    data = np.load(path)
    blob = data["blob"].tobytes()
    offsets = data["offsets"]
    imgs = []
    for i in range(len(offsets) - 1):
        raw = blob[offsets[i] : offsets[i + 1]]
        with Image.open(io.BytesIO(raw)) as im:
            imgs.append(np.asarray(im.convert("RGB"), np.uint8))
    return np.stack(imgs), data["issame"]


def _coerce_jpeg_bytes(item) -> bytes:
    """The reference pickles whatever tf.image.encode_jpeg returned —
    plain bytes in the common InsightFace-style dumps, EagerTensors when
    written by the reference script itself. Accept both plus numpy
    scalars/arrays of bytes."""
    if isinstance(item, (bytes, bytearray)):
        return bytes(item)
    if hasattr(item, "numpy"):  # tf EagerTensor without importing tf
        return _coerce_jpeg_bytes(item.numpy())
    if isinstance(item, np.ndarray):
        if item.dtype == np.uint8:
            return item.tobytes()
        return _coerce_jpeg_bytes(item.item())
    raise TypeError(
        f"unsupported encoded-image entry of type {type(item).__name__} in "
        "reference .bin — convert with 'deep-insight-face-tpu pack-bin'"
    )


def _load_reference_pickle_bin(path: str) -> Tuple[np.ndarray, np.ndarray]:
    import pickle

    print(
        f"{path}: reference pickle .bin detected — reading it directly; "
        "consider re-packing with 'deep-insight-face-tpu pack-bin' for the "
        "offset-indexed npz layout"
    )
    with open(path, "rb") as f:
        payload = pickle.load(f, encoding="bytes")
    try:
        encoded, issame = payload[0], payload[1]
    except (KeyError, IndexError, TypeError) as e:
        raise ValueError(
            f"{path} is not a [encoded_images, issame] pickle "
            "(reference scripts/raw_img_tf.py:85-86 format)"
        ) from e
    imgs = []
    for item in encoded:
        raw = _coerce_jpeg_bytes(item)
        with Image.open(io.BytesIO(raw)) as im:
            imgs.append(np.asarray(im.convert("RGB"), np.uint8))
    if not imgs:
        raise ValueError(f"{path} holds no images")
    # the reference script never resizes (its image_size arg is unused),
    # so guard against ragged shapes by resizing to the first image's
    if any(a.shape != imgs[0].shape for a in imgs):
        h, w = imgs[0].shape[:2]
        imgs = [
            a if a.shape == imgs[0].shape else np.asarray(
                Image.fromarray(a).resize((w, h), Image.BILINEAR), np.uint8
            )
            for a in imgs
        ]
    return np.stack(imgs), np.asarray(list(issame), np.bool_)
