"""Native C++ decode pool tests (skipped when the toolchain is absent)."""

import numpy as np
import pytest
from PIL import Image

from deep_insight_face_tpu.data import native_loader as NL

pytestmark = pytest.mark.skipif(
    not NL.native_available(), reason="native decoder unavailable"
)


@pytest.fixture
def jpegs(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for i, (h, w) in enumerate([(64, 80), (120, 90), (50, 50)]):
        arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        p = tmp_path / f"img{i}.jpg"
        Image.fromarray(arr).save(p, quality=95)
        paths.append(str(p))
    return paths


def test_native_batch_shape(jpegs):
    loader = NL.NativeImageLoader(num_threads=2, image_size=32)
    out = loader.load_batch(jpegs)
    assert out.shape == (3, 32, 32, 3)
    assert out.dtype == np.uint8
    assert out.mean() > 10  # actually decoded, not zeros


def test_native_matches_cv2(jpegs):
    cv2 = pytest.importorskip("cv2")
    loader = NL.NativeImageLoader(num_threads=2, image_size=48)
    out = loader.load_batch(jpegs)
    for i, p in enumerate(jpegs):
        ref = cv2.resize(
            cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB), (48, 48),
            interpolation=cv2.INTER_LINEAR,
        )
        diff = np.abs(out[i].astype(int) - ref.astype(int))
        assert diff.mean() < 1.0 and diff.max() <= 2


def test_native_png_fallback(tmp_path, jpegs):
    # PNG is not handled by the C++ path → PIL fallback fills the slot
    arr = np.full((20, 20, 3), 77, np.uint8)
    png = tmp_path / "x.png"
    Image.fromarray(arr).save(png)
    loader = NL.NativeImageLoader(num_threads=2, image_size=16)
    out = loader.load_batch([jpegs[0], str(png)])
    assert out.shape == (2, 16, 16, 3)
    np.testing.assert_allclose(out[1], 77, atol=3)


def test_make_image_loader_fallback_without_size():
    loader = NL.make_image_loader(2, image_size=None)
    from deep_insight_face_tpu.data.dataset import ImageLoader

    assert isinstance(loader, ImageLoader)
