"""utils.batching.batched_apply — the one pad-to-batch streaming loop.

Pins the contract the call sites rely on: one jit geometry regardless
of tail size, outputs trimmed to the input length, and the function's
own return shape mirrored exactly (bare array stays bare, tuples —
including 1-tuples — stay tuples so destructuring works).
"""

import numpy as np
import pytest

from deep_insight_face_tpu.utils.batching import batched_apply


def test_single_geometry_and_trim():
    seen = []

    def fn(chunk):
        seen.append(chunk.shape)
        return chunk * 2.0

    arr = np.arange(10, dtype=np.float32).reshape(10, 1)
    out = batched_apply(fn, arr, 4)
    assert all(s == (4, 1) for s in seen), seen  # tail padded, one geometry
    np.testing.assert_allclose(out, arr * 2.0)   # trimmed back to 10


def test_tuple_return_mirrored():
    arr = np.arange(6, dtype=np.float32)
    a, b = batched_apply(lambda c: (c + 1.0, c - 1.0), arr, 4)
    np.testing.assert_allclose(a, arr + 1.0)
    np.testing.assert_allclose(b, arr - 1.0)


def test_one_tuple_stays_one_tuple():
    # regression: a 1-tuple return was collapsed to a bare array, so
    # `(e,) = batched_apply(...)` iterated the array's first axis
    arr = np.arange(6, dtype=np.float32)
    res = batched_apply(lambda c: (c * 3.0,), arr, 4)
    assert isinstance(res, tuple) and len(res) == 1
    (e,) = res
    np.testing.assert_allclose(e, arr * 3.0)


def test_bare_array_stays_bare():
    arr = np.arange(6, dtype=np.float32)
    res = batched_apply(lambda c: c * 3.0, arr, 4)
    assert isinstance(res, np.ndarray)


def test_empty_input_raises():
    with pytest.raises(ValueError, match="empty"):
        batched_apply(lambda c: c, np.zeros((0, 3)), 4)
