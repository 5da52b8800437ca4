"""Dataset splitting + padded batch loader.

Replaces the reference's DistributedSampler + torch DataLoader layer
(ref: hydragnn/preprocess/load_data.py:206-438). TPU-first: the loader emits
fixed-shape ``GraphBatch``es — batch size is fixed, node/edge capacities are
buckets computed from the dataset (one bucket by default → exactly one compile
per step function).
"""

from __future__ import annotations

import math
import os
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from hydragnn_tpu.graph import GraphBatch, GraphSample, collate, pad_sizes


def split_dataset(
    dataset: Sequence[GraphSample],
    perc_train: float,
    stratify_splitting: bool = False,
    seed: int = 0,
) -> Tuple[List[GraphSample], List[GraphSample], List[GraphSample]]:
    """train/val/test split, (1-perc)/2 each for val/test
    (ref: preprocess/load_data.py:329-377). ``stratify_splitting`` stratifies
    by elemental composition (ref: compositional_data_splitting.py:19-156),
    approximated by sorting on composition signature before round-robin."""
    if stratify_splitting:
        from hydragnn_tpu.data.compositional_splitting import (
            compositional_stratified_splitting,
        )

        return compositional_stratified_splitting(dataset, perc_train, seed)
    n = len(dataset)
    idx = np.arange(n)
    rng = np.random.RandomState(seed)
    rng.shuffle(idx)
    perc_val = (1.0 - perc_train) / 2.0
    n_train = int(round(n * perc_train))
    n_val = int(round(n * perc_val))
    train_idx = idx[:n_train]
    val_idx = idx[n_train : n_train + n_val]
    test_idx = idx[n_train + n_val :]
    ds = list(dataset)
    return (
        [ds[i] for i in train_idx],
        [ds[i] for i in val_idx],
        [ds[i] for i in test_idx],
    )


class GraphLoader:
    """Iterates padded ``GraphBatch``es of fixed ``batch_size``.

    Capacities (node/edge padding) are computed once over the dataset for the
    worst-case batch, so every batch has identical shapes: one XLA compile.
    The last partial batch is padded with empty graphs (masked out), unlike
    torch's drop_last/variable-size batches.
    """

    def __init__(
        self,
        dataset: Sequence[GraphSample],
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        node_multiple: int = 64,
        edge_multiple: int = 128,
        node_slot: Optional[int] = None,
        edge_slot: Optional[int] = None,
        dense_adjacency: bool = False,
        num_samples: Optional[int] = None,
    ):
        self.dataset = list(dataset)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self._epoch = 0
        # oversampling RandomSampler option (ref: load_data.py:256-274):
        # draw num_samples indices per epoch instead of one full pass —
        # > len(dataset) cycles fresh permutations (sampling smaller
        # datasets more often in multi-dataset mixes)
        self.num_samples = num_samples
        if (dense_adjacency or edge_slot == "auto") and node_slot is None:
            # smallest 8-multiple slot that fits the largest graph
            worst = max((s.num_nodes for s in self.dataset), default=1)
            node_slot = -(-worst // 8) * 8
        if edge_slot == "auto":
            # smallest 128-multiple slot fitting the largest graph's edges
            # (the fused per-graph-block edge-kernel layout,
            # ops/pallas_egnn.py)
            worst_e = max((s.num_edges for s in self.dataset), default=1)
            edge_slot = -(-worst_e // 128) * 128
        self.node_slot = node_slot
        self.edge_slot = edge_slot
        self.dense_adjacency = dense_adjacency

        sizes = sorted(
            ((s.num_nodes, s.num_edges) for s in self.dataset), reverse=True
        )
        top = sizes[:batch_size]
        worst_n = sum(t[0] for t in top)
        worst_e = sum(max(t[1], 1) for t in top)
        self.n_node_pad, self.n_edge_pad, self.n_graph_pad = pad_sizes(
            worst_n, worst_e, batch_size, node_multiple, edge_multiple
        )

    def set_epoch(self, epoch: int) -> None:
        """ref: DistributedSampler.set_epoch (train_validate_test.py:158-160)."""
        self._epoch = epoch

    def __len__(self) -> int:
        if self.num_samples is not None:
            return math.ceil(self.num_samples / self.batch_size)
        return math.ceil(len(self.dataset) / self.batch_size)

    def __iter__(self) -> Iterator[GraphBatch]:
        rng = np.random.RandomState(self.seed + self._epoch)
        if self.num_samples is not None:
            reps = -(-self.num_samples // max(len(self.dataset), 1))
            order = np.concatenate(
                [rng.permutation(len(self.dataset)) for _ in range(reps)]
            )[: self.num_samples]
        else:
            order = np.arange(len(self.dataset))
            if self.shuffle:
                rng.shuffle(order)
        for i in range(0, len(order), self.batch_size):
            chunk = [self.dataset[j] for j in order[i : i + self.batch_size]]
            yield collate(
                chunk,
                n_node_pad=(None if self.node_slot else self.n_node_pad),
                n_edge_pad=(None if self.edge_slot else self.n_edge_pad),
                n_graph_pad=self.n_graph_pad,
                node_slot=self.node_slot,
                edge_slot=self.edge_slot,
                dense_adjacency=self.dense_adjacency,
            )


class PrefetchLoader:
    """Background-thread batch prefetch (depth-2 queue) — the counterpart of
    the reference's threaded HydraDataLoader (ref: preprocess/load_data.py:
    93-203 thread pool + CPU-affinity pinning). Host-side collate (tens of ms
    per batch) overlaps with device compute; JAX device puts are thread-safe.
    """

    def __init__(self, loader, depth: int = 2):
        # HYDRAGNN_NUM_WORKERS sizes the prefetch queue (ref:
        # load_data.py:279-281 num_workers override)
        env_workers = os.getenv("HYDRAGNN_NUM_WORKERS")
        if env_workers is not None:
            depth = max(int(env_workers), 1)
        self.loader = loader
        self.depth = depth

    def __len__(self):
        return len(self.loader)

    def set_epoch(self, epoch: int):
        self.loader.set_epoch(epoch)

    @property
    def dataset(self):
        return self.loader.dataset

    def __iter__(self):
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        SENTINEL = object()

        def producer():
            # optional CPU pinning of the collate thread (ref:
            # load_data.py:117-139 HYDRAGNN_AFFINITY[_WIDTH/_OFFSET])
            if os.getenv("HYDRAGNN_AFFINITY") is not None and hasattr(
                os, "sched_setaffinity"
            ):
                width = int(os.getenv("HYDRAGNN_AFFINITY_WIDTH", "1"))
                offset = int(os.getenv("HYDRAGNN_AFFINITY_OFFSET", "0"))
                try:
                    os.sched_setaffinity(0, range(offset, offset + width))
                except OSError:
                    pass
            try:
                for batch in self.loader:
                    q.put(batch)
            finally:
                q.put(SENTINEL)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is SENTINEL:
                break
            yield item
        t.join()


def create_dataloaders(
    trainset: Sequence[GraphSample],
    valset: Sequence[GraphSample],
    testset: Sequence[GraphSample],
    batch_size: int,
    prefetch: bool = True,
    oversampling: bool = False,
    num_samples: Optional[Tuple[int, int, int]] = None,
    **kwargs,
) -> Tuple[GraphLoader, GraphLoader, GraphLoader]:
    """ref: preprocess/load_data.py:225-326 (train shuffles, val/test don't;
    ``oversampling`` + ``num_samples=(train, val, test)`` draws that many
    random samples per epoch instead of one full pass, ref :256-274).

    All three loaders share the worst-case capacities so train/eval steps
    compile once each.
    """
    if oversampling:
        assert num_samples is not None, "oversampling requires num_samples"
    ns = num_samples if oversampling else (None, None, None)
    all_samples = list(trainset) + list(valset) + list(testset)
    probe = GraphLoader(all_samples, batch_size)
    common = dict(
        node_multiple=kwargs.pop("node_multiple", 64),
        edge_multiple=kwargs.pop("edge_multiple", 128),
        dense_adjacency=kwargs.pop("dense_adjacency", False),
        node_slot=kwargs.pop("node_slot", None),
        edge_slot=kwargs.pop("edge_slot", None),
    )
    if common["edge_slot"] == "auto":
        # resolve auto slots ONCE from the union of splits: per-loader
        # resolution would give train/val/test different slot sizes (and so
        # different padded shapes), one recompile per loader — defeating the
        # shared worst-case-capacity probe below
        if common["node_slot"] is None:
            worst = max((s.num_nodes for s in all_samples), default=1)
            common["node_slot"] = -(-worst // 8) * 8
        worst_e = max((s.num_edges for s in all_samples), default=1)
        common["edge_slot"] = -(-worst_e // 128) * 128
    if common["dense_adjacency"] == "auto":
        # slotted dense-adjacency collate is the fastest aggregation form on
        # TPU for batches of small near-uniform graphs (one batched MXU bmm,
        # no gather/scatter — ops/segment.adjacency_spmm). Enable when the
        # [G, S, S] adjacency stays small (S <= 384) and slotting does not
        # waste too many padded rows (S <= 2.5x the mean graph size).
        worst = max((s.num_nodes for s in all_samples), default=1)
        mean = (
            sum(s.num_nodes for s in all_samples) / max(len(all_samples), 1)
            or 1.0
        )
        slot = -(-worst // 8) * 8
        common["dense_adjacency"] = worst <= 384 and slot <= 2.5 * mean
    if common["dense_adjacency"] and common["node_slot"] is None:
        worst = max((s.num_nodes for s in all_samples), default=1)
        common["node_slot"] = -(-worst // 8) * 8
    train_loader = GraphLoader(trainset, batch_size, shuffle=True,
                               num_samples=ns[0], **common, **kwargs)
    val_loader = GraphLoader(valset, batch_size, num_samples=ns[1],
                             **common, **kwargs)
    test_loader = GraphLoader(testset, batch_size, num_samples=ns[2],
                              **common, **kwargs)
    for ld in (train_loader, val_loader, test_loader):
        ld.n_node_pad = probe.n_node_pad
        ld.n_edge_pad = probe.n_edge_pad
        ld.n_graph_pad = probe.n_graph_pad
    # HYDRAGNN_CUSTOM_DATALOADER=0 disables the threaded prefetch loader
    # (ref: load_data.py:283-284 custom-dataloader toggle)
    if os.getenv("HYDRAGNN_CUSTOM_DATALOADER") is not None:
        prefetch = bool(int(os.environ["HYDRAGNN_CUSTOM_DATALOADER"]))
    if prefetch:
        return (
            PrefetchLoader(train_loader),
            PrefetchLoader(val_loader),
            PrefetchLoader(test_loader),
        )
    return train_loader, val_loader, test_loader


def total_to_train_val_test_pickles(
    dataset: Sequence[GraphSample],
    basedir: str,
    perc_train: float,
    stratify_splitting: bool = False,
    attrs=None,
) -> None:
    """Split and persist as pickle datasets (ref: preprocess/load_data.py:
    397-438 total_to_train_val_test_pkls)."""
    from hydragnn_tpu.data.pickledataset import SimplePickleWriter

    train, val, test = split_dataset(dataset, perc_train, stratify_splitting)
    for label, split in (("trainset", train), ("valset", val),
                         ("testset", test)):
        SimplePickleWriter(split, basedir, label=label, attrs=attrs)
