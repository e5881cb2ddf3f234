"""Dataset scan, samplers, and the prefetching loader."""

import numpy as np
import pytest
from PIL import Image

from deep_insight_face_tpu.data import sampler as S
from deep_insight_face_tpu.data.dataset import ImageLoader, get_dataset, load_image
from deep_insight_face_tpu.data.loader import DevicePrefetcher, decode_batch


@pytest.fixture
def dataset_dir(tmp_path):
    rng = np.random.default_rng(0)
    for name, n in [("Alice", 4), ("Bob", 3), ("Carol", 2), ("Dave", 1)]:
        d = tmp_path / name
        d.mkdir()
        for i in range(n):
            arr = rng.integers(0, 255, (12, 12, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{name}_{i:04d}.jpg")
    return tmp_path


def test_get_dataset(dataset_dir):
    classes = get_dataset(dataset_dir)
    assert [c.name for c in classes] == ["Alice", "Bob", "Carol", "Dave"]
    assert [len(c) for c in classes] == [4, 3, 2, 1]
    assert get_dataset(dataset_dir, min_images=2)[-1].name == "Carol"


def test_load_image_resize(dataset_dir):
    classes = get_dataset(dataset_dir)
    img = load_image(classes[0].image_paths[0], image_size=8)
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8


def test_pair_sampler_balance(dataset_dir):
    classes = get_dataset(dataset_dir)
    batches = iter(S.PairSampler(classes, batch_size=8, seed=1))
    b = next(batches)
    assert len(b["paths_a"]) == 8
    assert b["labels"].sum() == 4  # 50/50
    # genuine pairs share the identity folder
    for pa, pb, y in zip(b["paths_a"], b["paths_b"], b["labels"]):
        same_dir = pa.rsplit("/", 2)[-2] == pb.rsplit("/", 2)[-2]
        assert same_dir == bool(y)
        if y:
            assert pa != pb


def test_triplet_sampler_semantics(dataset_dir):
    classes = get_dataset(dataset_dir)
    b = next(iter(S.TripletSampler(classes, batch_size=6, seed=2)))
    for a, p, n in zip(b["anchor"], b["positive"], b["negative"]):
        dir_of = lambda s: s.rsplit("/", 2)[-2]
        assert dir_of(a) == dir_of(p) and a != p
        assert dir_of(a) != dir_of(n)


def test_pk_sampler(dataset_dir):
    classes = get_dataset(dataset_dir)
    s = S.PKSampler(classes, p=3, k=2, seed=3)
    b = next(iter(s))
    assert len(b["paths"]) == 6
    labels = b["labels"]
    # exactly 3 identities × 2 samples
    vals, counts = np.unique(labels, return_counts=True)
    assert len(vals) == 3 and all(counts == 2)


def test_classifier_sampler_epochs(dataset_dir):
    classes = get_dataset(dataset_dir)
    s = S.ClassifierSampler(classes, batch_size=4, seed=4)
    assert s.num_classes == 4
    it = iter(s)
    seen = set()
    for _ in range(4):
        b = next(it)
        seen.update(b["paths"])
        assert len(b["paths"]) == 4
    assert len(seen) >= 8  # shuffling covers the dataset


def test_decode_batch_and_prefetcher(dataset_dir):
    classes = get_dataset(dataset_dir)
    sampler = S.PKSampler(classes, p=2, k=2, seed=5)
    loader = ImageLoader(num_threads=2, image_size=16)
    raw = next(iter(sampler))
    decoded = decode_batch(loader, raw)
    assert decoded["images"].shape == (4, 16, 16, 3)
    assert decoded["labels"].shape == (4,)

    pf = DevicePrefetcher(iter(sampler), loader, depth=2, num_batches=3)
    batches = list(pf)
    assert len(batches) == 3
    assert batches[0]["images"].shape == (4, 16, 16, 3)


def test_prefetcher_propagates_errors(dataset_dir):
    from deep_insight_face_tpu.data.loader import PipelineError

    def bad_sampler():
        yield {"paths": ["/nonexistent/file.jpg"]}

    loader = ImageLoader(num_threads=1)
    pf = DevicePrefetcher(bad_sampler(), loader, depth=1)
    with pytest.raises(PipelineError):
        list(pf)


def test_lfw_pair_batcher(dataset_dir):
    from deep_insight_face_tpu.data.pairs import Match, Mismatch

    pairs = [Match("Alice", 1, 2), Mismatch("Alice", 1, "Bob", 2)]
    b = S.LFWPairBatcher(str(dataset_dir), pairs, batch_size=2)
    assert b.skipped == 0
    assert b.issame == [True, False]
    chunks = list(b)
    assert [len(c) for c in chunks] == [2, 2]


def test_classifier_sampler_rejects_tiny_dataset():
    """batch_size > dataset size must raise, not busy-spin forever in the
    prefetcher worker (regression: CLI train hang on a 4-image dataset)."""
    from deep_insight_face_tpu.data.dataset import IdentityClass
    from deep_insight_face_tpu.data.sampler import ClassifierSampler

    classes = [IdentityClass("a", ("a/1.jpg",)), IdentityClass("b", ("b/1.jpg",))]
    with pytest.raises(ValueError, match="batch_size"):
        ClassifierSampler(classes, batch_size=8)
