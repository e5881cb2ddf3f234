"""utils/files helpers + exception hierarchy."""

import os

import numpy as np
import pytest
from PIL import Image

from deep_insight_face_tpu import exceptions as E
from deep_insight_face_tpu.utils import files as F


def test_list_pictures(tmp_path):
    (tmp_path / "sub").mkdir()
    for name in ["a.jpg", "b.PNG", "notes.txt", "sub/c.jpeg"]:
        p = tmp_path / name
        p.write_bytes(b"x")
    found = F.list_pictures(str(tmp_path))
    assert [os.path.basename(p) for p in found] == ["a.jpg", "b.PNG", "c.jpeg"]
    flat = F.list_pictures(str(tmp_path), recursive=False)
    assert [os.path.basename(p) for p in flat] == ["a.jpg", "b.PNG"]


def test_singleton():
    calls = []

    @F.singleton
    class Thing:
        def __init__(self):
            calls.append(1)

    a, b = Thing(), Thing()
    assert a is b and len(calls) == 1


def test_memoize():
    calls = []

    @F.memoize
    def f(x, y=1):
        calls.append((x, y))
        return x + y

    assert f(1) == 2 and f(1) == 2 and f(2, y=3) == 5
    assert len(calls) == 2
    f.cache_clear()
    f(1)
    assert len(calls) == 3


def test_get_weight_path(tmp_path):
    p = F.get_weight_path(str(tmp_path / "w"), "model.npz")
    assert p.endswith("model.npz") and os.path.isdir(os.path.dirname(p))


def test_save_temp_image():
    img = np.full((4, 4, 3), 120, np.uint8)
    path = F.save_temp_image(img)
    try:
        back = np.asarray(Image.open(path))
        assert back.shape == (4, 4, 3)
    finally:
        os.unlink(path)


def test_concat_images():
    imgs = [np.full((2, 3, 3), i, np.uint8) for i in range(5)]
    grid = F.concat_images(imgs, cols=2)
    assert grid.shape == (6, 6, 3)
    assert grid[0, 0, 0] == 0 and grid[0, 4, 0] == 1
    with pytest.raises(ValueError):
        F.concat_images([])
    with pytest.raises(ValueError):
        F.concat_images([imgs[0], np.zeros((3, 3, 3), np.uint8)])


def test_quarantine(tmp_path):
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"junk")
    dest = F.quarantine_failed_image(str(bad), str(tmp_path / "q"))
    assert os.path.exists(dest) and not os.path.exists(bad)


def test_exception_hierarchy():
    assert issubclass(E.NoFaceDetectedError, E.FaceRecognitionException)
    assert issubclass(E.FaceRecognitionException, Exception)
    # catchable as plain Exception (unlike the reference's BaseException)
    try:
        raise E.IdentityNotEnrolledError("bob")
    except Exception as e:
        assert "bob" in str(e)
    assert issubclass(E.InvalidPairsError, ValueError)
