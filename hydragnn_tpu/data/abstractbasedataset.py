"""Dataset ABC (ref: hydragnn/utils/datasets/abstractbasedataset.py:6-61)."""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Dict, List

from hydragnn_tpu.graph import GraphSample


class AbstractBaseDataset(ABC):
    """Sequence-of-GraphSample contract used by loaders and stores."""

    def __init__(self):
        self.dataset: List[GraphSample] = []
        # dataset_name -> integer branch id for multi-dataset training
        # (ref: abstractbasedataset.py:44-56)
        self.dataset_name_dict: Dict[str, int] = {}

    def register_dataset_name(self, name: str) -> int:
        if name not in self.dataset_name_dict:
            self.dataset_name_dict[name] = len(self.dataset_name_dict)
        return self.dataset_name_dict[name]

    @abstractmethod
    def get(self, idx: int) -> GraphSample:
        ...

    @abstractmethod
    def len(self) -> int:
        ...

    def __getitem__(self, idx: int) -> GraphSample:
        return self.get(idx)

    def __len__(self) -> int:
        return self.len()
