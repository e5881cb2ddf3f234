"""Fixed-geometry batching helper.

Jitted programs compile per input geometry, so callers that stream a
dataset through a device function must pad the tail chunk to the batch
size (one compile) and trim the outputs. Four call sites grew their own
copies of that loop; this is the one implementation.
"""

from __future__ import annotations

from typing import Callable, Sequence, Union

import numpy as np


def batched_apply(
    fn: Callable,
    arr: np.ndarray,
    batch: int,
):
    """Apply ``fn(chunk)`` over ``arr`` in fixed-size batches.

    The tail chunk is padded with repeats of its last row so ``fn`` only
    ever sees one geometry (one jit compile); outputs are concatenated
    and trimmed back to ``len(arr)``. ``fn`` may return one array or a
    tuple of arrays (each with leading batch dim).
    """
    n = len(arr)
    outs = None
    was_tuple = False
    for s in range(0, n, batch):
        chunk = np.asarray(arr[s:s + batch])
        k = len(chunk)
        if k < batch:
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], batch - k, axis=0)]
            )
        res = fn(chunk)
        was_tuple = isinstance(res, tuple)
        tup = res if was_tuple else (res,)
        tup = tuple(np.asarray(r)[:k] for r in tup)
        if outs is None:
            outs = [[] for _ in tup]
        for o, r in zip(outs, tup):
            o.append(r)
    if outs is None:
        raise ValueError("batched_apply: empty input")
    cat = tuple(np.concatenate(o) for o in outs)
    # mirror fn's own return shape: a 1-tuple stays a 1-tuple so
    # `(e,) = batched_apply(...)` destructuring keeps working
    return cat if was_tuple else cat[0]
