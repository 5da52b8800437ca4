"""Multi-dataset / multi-branch (task-parallel) training.

Equivalent of the reference's MultiTaskModelMP + multibranch example
(ref: hydragnn/models/MultiTaskModelMP.py:172-260;
examples/multibranch/train.py:48-517): a shared encoder trained on all
datasets, per-dataset decoder branches.

TPU-native design: instead of two overlapping DDP process groups with manual
gradient averaging (ref: MultiTaskModelMP.average_gradients:12-19), the branch
dispatch is *dense* inside the model (HydraBase computes every branch and
selects by ``dataset_id`` — see models/base.py) and the whole step runs as
one SPMD program. Encoder gradients automatically average over the full mesh;
branch-decoder gradients are zero on graphs of other datasets, so their psum
equals the reference's per-branch-group average up to the deterministic
proportionality factor absorbed into the branch learning rate. Proportional
sampling mirrors the reference's proportional process allocation
(ref: examples/multibranch/train.py:166-276).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

import numpy as np

from hydragnn_tpu.graph import GraphBatch, GraphSample, collate, pad_sizes


def tag_dataset_ids(
    datasets: Sequence[Sequence[GraphSample]],
) -> List[GraphSample]:
    """Label each sample with its dataset/branch id
    (ref: AbstractBaseDataset dataset_name -> tensor ID map,
    utils/datasets/abstractbasedataset.py:44-56)."""
    out = []
    for ds_id, ds in enumerate(datasets):
        for s in ds:
            d = dict(s.__dict__)
            d["dataset_id"] = ds_id
            out.append(GraphSample(**d))
    return out


class MultiDatasetLoader:
    """Yields batches mixing datasets proportionally to their sizes (the
    reference allocates ranks proportionally, ref: multibranch/train.py
    process_list; here graphs-per-batch are allocated proportionally)."""

    def __init__(
        self,
        datasets: Sequence[Sequence[GraphSample]],
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        node_multiple: int = 64,
        edge_multiple: int = 128,
    ):
        self.datasets = [list(d) for d in datasets]
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self._epoch = 0
        sizes = np.array([len(d) for d in self.datasets], float)
        frac = sizes / sizes.sum()
        self.per_ds = np.maximum(
            np.round(frac * batch_size).astype(int), 1
        )
        # fix rounding to match batch_size
        while self.per_ds.sum() > batch_size:
            self.per_ds[np.argmax(self.per_ds)] -= 1
        while self.per_ds.sum() < batch_size:
            self.per_ds[np.argmax(sizes)] += 1

        all_samples = tag_dataset_ids(self.datasets)
        self.tagged = [
            [s for s in all_samples if s.dataset_id == i]
            for i in range(len(self.datasets))
        ]
        worst = sorted(
            ((s.num_nodes, s.num_edges) for s in all_samples), reverse=True
        )[:batch_size]
        self.n_node_pad, self.n_edge_pad, self.n_graph_pad = pad_sizes(
            sum(t[0] for t in worst),
            sum(max(t[1], 1) for t in worst),
            batch_size,
            node_multiple,
            edge_multiple,
        )

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def __len__(self) -> int:
        n_batches = [
            len(d) // k for d, k in zip(self.tagged, self.per_ds) if k > 0
        ]
        return max(min(n_batches), 1)

    def __iter__(self):
        rng = np.random.RandomState(self.seed + self._epoch)
        orders = []
        for d in self.tagged:
            idx = np.arange(len(d))
            if self.shuffle:
                rng.shuffle(idx)
            orders.append(idx)
        for b in range(len(self)):
            chunk = []
            for ds_i, (d, k) in enumerate(zip(self.tagged, self.per_ds)):
                sel = orders[ds_i][b * k : (b + 1) * k]
                chunk.extend(d[j] for j in sel)
            yield collate(
                chunk,
                n_node_pad=self.n_node_pad,
                n_edge_pad=self.n_edge_pad,
                n_graph_pad=self.n_graph_pad,
            )
