"""Host-side batching + threaded prefetch.

Replaces the reference's torch DataLoader workers (apis/train.py:25-36)
with a thread-pool prefetcher (IO-bound decode overlaps device compute) and
per-host index sharding (the TPU analogue of the rank/world_size dataset
split at inference.py:101-103).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, List, Optional

import numpy as np

__all__ = ["batch_iterator", "Prefetcher", "collate"]


def collate(samples: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack clip samples into batch arrays; model-facing key names."""
    out: Dict[str, Any] = {}
    keys = samples[0].keys()
    rename = {"imgs": "l_img", "r_imgs": "r_img"}
    for k in keys:
        if k == "meta":
            out["meta"] = [s["meta"] for s in samples]
            intr = samples[0]["meta"].get("intrinsics")
            if intr is not None:
                out["intrinsics"] = np.stack(
                    [np.asarray(s["meta"]["intrinsics"], np.float32)
                     for s in samples])
        else:
            out[rename.get(k, k)] = np.stack([s[k] for s in samples])
    return out


def batch_iterator(
    dataset,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    drop_last: bool = True,
    host_id: int = 0,
    num_hosts: int = 1,
    epochs: Optional[int] = None,
) -> Iterator[Dict[str, Any]]:
    """Yield collated batches; indices are host-sharded then batched."""
    epoch = 0
    rng = np.random.default_rng(seed)
    while epochs is None or epoch < epochs:
        idx = np.arange(len(dataset))
        if shuffle:
            idx = rng.permutation(idx)
        idx = idx[host_id::num_hosts]
        stop = len(idx) - (len(idx) % batch_size if drop_last else 0)
        for i in range(0, stop, batch_size):
            chunk = idx[i:i + batch_size]
            if drop_last and len(chunk) < batch_size:
                break
            yield collate([dataset[int(j)] for j in chunk])
        epoch += 1


class Prefetcher:
    """Background-thread prefetch queue around any iterator."""

    def __init__(self, it: Iterator, depth: int = 2, num_threads: int = 1):
        self._it = it
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._done = object()
        self._threads = []
        self._lock = threading.Lock()
        for _ in range(num_threads):
            t = threading.Thread(target=self._worker, daemon=True)
            t.start()
            self._threads.append(t)

    def _worker(self):
        while True:
            try:
                with self._lock:
                    item = next(self._it)
            except StopIteration:
                self._q.put(self._done)
                return
            except Exception as e:  # surface loader errors to the consumer
                self._q.put(e)
                return
            self._q.put(item)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._done:
            raise StopIteration
        if isinstance(item, Exception):
            raise item
        return item
