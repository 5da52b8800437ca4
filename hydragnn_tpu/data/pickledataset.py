"""Pickle-per-sample dataset (ref: hydragnn/utils/datasets/pickledataset.py:14-182).

One pickle file per sample in hashed subdirectories + a ``-meta.pkl`` with
minmax stats / total count / user attrs — same layout contract as the
reference's SimplePickleWriter/SimplePickleDataset.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, List, Optional, Sequence

from hydragnn_tpu.graph import GraphSample


class SimplePickleWriter:
    def __init__(
        self,
        samples: Sequence[GraphSample],
        basedir: str,
        label: str = "total",
        nmax_persubdir: int = 10_000,
        attrs: Optional[Dict[str, Any]] = None,
        use_subdir: bool = True,
    ):
        self.basedir = basedir
        self.label = label
        os.makedirs(basedir, exist_ok=True)
        ntotal = len(samples)
        with open(os.path.join(basedir, f"{label}-meta.pkl"), "wb") as f:
            pickle.dump({"ntotal": ntotal, "use_subdir": use_subdir,
                         "nmax_persubdir": nmax_persubdir,
                         "attrs": attrs or {}}, f)
        for i, s in enumerate(samples):
            d = basedir
            if use_subdir:
                d = os.path.join(basedir, str(i // nmax_persubdir))
                os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, f"{label}-{i}.pkl"), "wb") as f:
                pickle.dump(s, f)


class SimplePickleDataset:
    def __init__(self, basedir: str, label: str = "total"):
        self.basedir = basedir
        self.label = label
        with open(os.path.join(basedir, f"{label}-meta.pkl"), "rb") as f:
            meta = pickle.load(f)
        self.ntotal = meta["ntotal"]
        self.use_subdir = meta["use_subdir"]
        self.nmax = meta["nmax_persubdir"]
        self.attrs = meta.get("attrs", {})

    def __len__(self) -> int:
        return self.ntotal

    def __getitem__(self, i: int) -> GraphSample:
        if not 0 <= i < self.ntotal:
            raise IndexError(i)  # sequence protocol (list()/iteration)
        d = self.basedir
        if self.use_subdir:
            d = os.path.join(self.basedir, str(i // self.nmax))
        with open(os.path.join(d, f"{self.label}-{i}.pkl"), "rb") as f:
            return pickle.load(f)
