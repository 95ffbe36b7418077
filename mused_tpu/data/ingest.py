"""Double-buffered host -> device ingest.

The BASELINE north star calls for the reference's per-modality feature
streams to become a double-buffered jax ingest: host featurization (tokenize/
hash, data/features.py + native/) of window w+1 overlaps the device compute
of window w.  jax's async dispatch already overlaps device work with host
Python; this adds the other half — a background thread keeps the next
window's feature tensors ready (and already transferred via device_put) so
the engine never stalls on the host hot loop.
"""
from __future__ import annotations

import concurrent.futures as cf
from typing import Callable, Iterator, Sequence

import jax


class WindowPrefetcher:
    """Iterate featurized windows with ``depth`` windows prepared ahead.

    ``featurize(window_index) -> pytree of arrays`` runs in a worker thread;
    results are device_put eagerly so the transfer also overlaps compute.
    """

    def __init__(self, featurize: Callable[[int], object], n_windows: int,
                 depth: int = 2, device=None, workers: int = 1):
        self._featurize = featurize
        self._n = n_windows
        self._depth = max(1, depth)
        self._device = device
        # >1 worker parallelizes featurization across windows/groups: the
        # hashing hot loop runs in C (ctypes releases the GIL) and numpy
        # slicing releases it too, so threads genuinely overlap.  Results
        # stay ordered (futures are consumed in submission order).
        self._pool = cf.ThreadPoolExecutor(max_workers=max(1, workers))

    def _task(self, idx: int):
        feats = self._featurize(idx)
        if self._device is not None:
            feats = jax.device_put(feats, self._device)
        else:
            feats = jax.device_put(feats)
        return feats

    def __iter__(self) -> Iterator:
        pending: list[cf.Future] = []
        nxt = 0
        while nxt < min(self._depth, self._n):
            pending.append(self._pool.submit(self._task, nxt))
            nxt += 1
        for _ in range(self._n):
            fut = pending.pop(0)
            if nxt < self._n:
                pending.append(self._pool.submit(self._task, nxt))
                nxt += 1
            yield fut.result()

    def close(self):
        self._pool.shutdown(wait=False, cancel_futures=True)
