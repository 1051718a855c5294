"""Double-buffered host->HBM frame streaming.

The reference decodes the whole clip upfront in a 48-process pool
(`unscreen/utils/fileio.py:31-38`) and ships each tensor to the device
per stage call. TPU-native: a background thread decodes + `device_put`s
chunk t+1 while the device computes on chunk t, so the TPU never starves
on host I/O (the BASELINE.json north-star requirement).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class FrameStreamer:
    """Iterate device-resident frame chunks with prefetch depth 2.

    Args:
      paths_or_frames: file paths (decoded with cv2) or in-memory arrays.
      chunk_size: frames per chunk (the device-program batch).
      preprocess: optional host-side per-chunk transform (e.g. stacking
        to (N, H, W, 3) float32).
      device: target device or sharding for `jax.device_put`.
    """

    def __init__(self, paths_or_frames: Sequence, chunk_size: int = 8,
                 preprocess: Optional[Callable] = None, device=None,
                 prefetch: int = 2):
        self.items = list(paths_or_frames)
        self.chunk_size = int(chunk_size)
        self.preprocess = preprocess
        self.device = device
        self.prefetch = int(prefetch)

    def _load(self, item) -> np.ndarray:
        if isinstance(item, (str, bytes)):
            import cv2
            return cv2.imread(item)
        return item

    def _chunks(self) -> Iterator[List]:
        for i in range(0, len(self.items), self.chunk_size):
            yield self.items[i:i + self.chunk_size]

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def worker():
            try:
                for chunk in self._chunks():
                    # uint8 on the wire (4x less host->HBM traffic than
                    # f32); device programs upcast after transfer
                    arr = np.stack([self._load(it) for it in chunk])
                    if self.preprocess is not None:
                        arr = self.preprocess(arr)
                    buf = (jax.device_put(arr, self.device)
                           if self.device is not None
                           else jnp.asarray(arr))
                    q.put(buf)
            except Exception as e:  # surface worker errors to the consumer
                q.put(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            if isinstance(item, Exception):
                raise item
            yield item
        t.join()
