"""The input pipeline: sampler → host decode pool → pinned staging →
device prefetch, overlapping host IO with device compute.

The reference's generator decodes synchronously inside the training hot
loop (SURVEY §3.1 — its dominant bottleneck). Here a background thread
drains the sampler, the decode pool turns path batches into uint8
arrays, and a bounded queue keeps ``prefetch_depth`` batches already on
device — the classic double-buffer that BASELINE.json's north star asks
for ("host decode … double-buffered HBM prefetch").
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import numpy as np

from deep_insight_face_tpu.data.dataset import ImageLoader


class PipelineError(RuntimeError):
    pass


def decode_batch(
    loader: ImageLoader, batch: Dict[str, Any]
) -> Dict[str, np.ndarray]:
    """Turn a sampler path-batch into decoded uint8 arrays.

    Path keys: 'paths' → 'images'; 'paths_a'/'paths_b' → 'images_a'/'_b';
    'anchor'/'positive'/'negative' decoded in place. Labels pass through.
    """
    out: Dict[str, np.ndarray] = {}
    for key, val in batch.items():
        if key == "paths":
            out["images"] = loader.load_batch(val)
        elif key.startswith("paths_"):
            out["images_" + key[len("paths_"):]] = loader.load_batch(val)
        elif key in ("anchor", "positive", "negative"):
            out[key] = loader.load_batch(val)
        else:
            out[key] = np.asarray(val)
    return out


class DevicePrefetcher:
    """Background-threaded decode + device transfer with bounded depth."""

    _SENTINEL = object()

    def __init__(
        self,
        sampler: Iterator[Dict[str, Any]],
        loader: ImageLoader,
        depth: int = 2,
        num_batches: Optional[int] = None,
        transform: Optional[Callable[[Dict[str, np.ndarray]], Dict]] = None,
        sharding: Optional[jax.sharding.Sharding] = None,
    ):
        self.sampler = iter(sampler)
        self.loader = loader
        self.depth = depth
        self.num_batches = num_batches
        self.transform = transform
        self.sharding = sharding
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._err: Optional[BaseException] = None
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _put_device(self, host_batch: Dict[str, np.ndarray]):
        if self.transform is not None:
            host_batch = self.transform(host_batch)
        if self.sharding is not None:
            return {
                k: jax.device_put(v, self.sharding) for k, v in host_batch.items()
            }
        return {k: jax.device_put(v) for k, v in host_batch.items()}

    def _worker(self):
        try:
            produced = 0
            for raw in self.sampler:
                if self._stop.is_set():
                    return
                batch = self._put_device(decode_batch(self.loader, raw))
                self._q.put(batch)
                produced += 1
                if self.num_batches is not None and produced >= self.num_batches:
                    break
            self._q.put(self._SENTINEL)
        except BaseException as e:  # surfaced on the consumer side
            self._err = e
            self._q.put(self._SENTINEL)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._SENTINEL:
            if self._err is not None:
                raise PipelineError(str(self._err)) from self._err
            raise StopIteration
        return item

    def close(self):
        self._stop.set()
        # drain so the worker can exit
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
