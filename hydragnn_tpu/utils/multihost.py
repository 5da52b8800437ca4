"""Multi-host host-data exchange (ref: adiosdataset.py:49-88 bulk_bcast —
chunked MPI broadcast for >2GB payloads).

TPU-native: device-mediated broadcast via multihost_utils, chunked so
arbitrarily large host arrays move in bounded device-memory slices.
"""

from __future__ import annotations

from typing import Any

import numpy as np


def bulk_broadcast(arr: np.ndarray, chunk_bytes: int = 1 << 28) -> np.ndarray:
    """Broadcast a large numpy array from process 0 to all processes."""
    import jax

    if jax.process_count() == 1:
        return arr
    from jax.experimental import multihost_utils

    flat = np.ascontiguousarray(arr).reshape(-1).view(np.uint8)
    n = np.asarray(flat.shape[0], np.int64)
    n = int(multihost_utils.broadcast_one_to_all(n))
    out = np.empty(n, np.uint8)
    step = chunk_bytes
    for off in range(0, n, step):
        size = min(step, n - off)
        src = flat[off : off + size] if flat.shape[0] >= off + size else \
            np.zeros(size, np.uint8)
        out[off : off + size] = np.asarray(
            multihost_utils.broadcast_one_to_all(src)
        )
    return out.view(arr.dtype).reshape(arr.shape)


def process_allgather_small(x: Any):
    """Gather small host values from all processes (metrics aggregation,
    the reference's HYDRAGNN_AGGR_BACKEND=mpi path equivalent)."""
    import jax

    if jax.process_count() == 1:
        return [x]
    from jax.experimental import multihost_utils

    return list(multihost_utils.process_allgather(np.asarray(x)))
