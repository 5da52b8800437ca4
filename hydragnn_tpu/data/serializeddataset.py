"""Serialized split datasets — one pickle per (dataset, split)
(ref: hydragnn/utils/datasets/serializeddataset.py:10-87).

File layout matches the reference: ``<basedir>/<datasetname>-<label>.pkl``
(with ``-<rank>`` suffix in distributed mode) holding three pickled objects:
minmax_node_feature, minmax_graph_feature, then the sample list. The samples
here are ``GraphSample``s (host numpy) instead of PyG Data objects.
"""

from __future__ import annotations

import os
import pickle
from typing import Optional, Sequence

from hydragnn_tpu.data.abstractbasedataset import AbstractBaseDataset
from hydragnn_tpu.graph import GraphSample


def _basename(datasetname: str, label: str, rank: Optional[int]) -> str:
    if rank is not None:
        return f"{datasetname}-{label}-{rank}.pkl"
    return f"{datasetname}-{label}.pkl"


class SerializedWriter:
    """ref: serializeddataset.py SerializedWriter — rank-0 (or per-rank)
    pickle of a dataset split plus its minmax normalization metadata."""

    def __init__(
        self,
        dataset: Sequence[GraphSample],
        basedir: str,
        datasetname: str,
        label: str = "total",
        minmax_node_feature=None,
        minmax_graph_feature=None,
        rank: Optional[int] = None,
    ):
        os.makedirs(basedir, exist_ok=True)
        fname = os.path.join(basedir, _basename(datasetname, label, rank))
        with open(fname, "wb") as f:
            pickle.dump(minmax_node_feature, f)
            pickle.dump(minmax_graph_feature, f)
            pickle.dump(list(dataset), f)


class SerializedDataset(AbstractBaseDataset):
    """ref: serializeddataset.py SerializedDataset."""

    def __init__(
        self,
        basedir: str,
        datasetname: str,
        label: str,
        rank: Optional[int] = None,
    ):
        super().__init__()
        self.basedir = basedir
        self.datasetname = datasetname
        self.label = label
        fname = os.path.join(basedir, _basename(datasetname, label, rank))
        with open(fname, "rb") as f:
            self.minmax_node_feature = pickle.load(f)
            self.minmax_graph_feature = pickle.load(f)
            self.dataset = pickle.load(f)

    def len(self) -> int:
        return len(self.dataset)

    def get(self, i: int) -> GraphSample:
        return self.dataset[i]
