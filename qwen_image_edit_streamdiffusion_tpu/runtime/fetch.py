"""Device→host transfer helpers.

The axon tunnel streams a single `np.asarray` at ~25 MB/s (116 ms for a
1024² uint8 image — measured round 2); issuing the transfer as parallel
row-chunk fetches reaches ~35 MB/s (88 ms). On directly-attached TPU hosts
(PCIe) the chunking is a harmless few extra slice dispatches.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np

_EXECUTOR: ThreadPoolExecutor | None = None
_MIN_PARALLEL_BYTES = 1 << 20


def _executor() -> ThreadPoolExecutor:
    global _EXECUTOR
    if _EXECUTOR is None:
        _EXECUTOR = ThreadPoolExecutor(max_workers=8, thread_name_prefix="fetch")
    return _EXECUTOR


def fetch(arr, n_chunks: int = 8, axis: int = 1) -> np.ndarray:
    """Fetch a device array to host, chunk-parallel along ``axis``.

    Falls back to one transfer for small arrays or non-divisible extents.
    """
    nbytes = arr.size * arr.dtype.itemsize
    n = arr.shape[axis] if arr.ndim > axis else 0
    if nbytes < _MIN_PARALLEL_BYTES or n == 0 or n % n_chunks != 0:
        return np.asarray(arr)
    rows = n // n_chunks
    idx = [slice(None)] * arr.ndim
    parts = []
    for i in range(n_chunks):
        idx[axis] = slice(i * rows, (i + 1) * rows)
        parts.append(arr[tuple(idx)])
    return np.concatenate(list(_executor().map(np.asarray, parts)), axis=axis)
