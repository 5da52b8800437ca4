"""Sharded on-disk graph array store — the ADIOS2 (.bp) equivalent.

Same schema as the reference's AdiosWriter/AdiosDataset (ref:
hydragnn/utils/datasets/adiosdataset.py:201-306): per-key global array
concatenated along one variable dimension plus per-sample
``variable_count``/``variable_offset`` index. TPU-native storage: raw
little-endian binaries + a JSON header, read back with ``np.memmap`` —
zero-copy node-local sharing via the OS page cache (replacing the reference's
explicit multiprocessing SharedMemory mode, ref: adiosdataset.py:594-644).

Modes (ref: adiosdataset.py read modes):
  preload  — load whole arrays to RAM (ref :574-593 bcast-preload)
  mmap     — lazy memory-mapped per-sample gets (default; ref direct :890-893)
Multi-rank writing: each process writes ``<path>/shard_<rank>/``; readers see
the union (ref: ADIOS parallel write aggregation).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from hydragnn_tpu.graph import GraphSample

# fields of GraphSample stored as variables; (attr, concat_axis)
_FIELDS = [
    ("x", 0),
    ("pos", 0),
    ("edge_index", 1),
    ("edge_shifts", 0),
    ("edge_attr", 0),
    ("y_graph", 0),
    ("y_node", 0),
    ("energy", 0),
    ("forces", 0),
    ("pe", 0),
    ("rel_pe", 0),
]


class GraphStoreWriter:
    """ref: AdiosWriter (adiosdataset.py:90-306)."""

    def __init__(self, path: str, rank: int = 0, attrs: Optional[Dict] = None):
        self.path = os.path.join(path, f"shard_{rank}")
        os.makedirs(self.path, exist_ok=True)
        self.samples: List[GraphSample] = []
        self.attrs = attrs or {}

    def add(self, sample: GraphSample) -> None:
        self.samples.append(sample)

    def extend(self, samples: Sequence[GraphSample]) -> None:
        self.samples.extend(samples)

    def save(self) -> None:
        meta: Dict[str, Any] = {
            "n_samples": len(self.samples),
            "attrs": self.attrs,
            "dataset_id": [int(s.dataset_id) for s in self.samples],
            "variables": {},
        }
        for name, axis in _FIELDS:
            arrays = [getattr(s, name) for s in self.samples]
            # empty split shards are legal (tiny datasets): write a header
            # with no variables; readers yield zero samples
            if not arrays or any(a is None for a in arrays):
                continue
            arrays = [np.asarray(a) for a in arrays]
            arrays = [
                a.reshape(1) if a.ndim == 0 else a for a in arrays
            ]
            counts = [int(a.shape[axis]) for a in arrays]
            cat = np.concatenate(arrays, axis=axis)
            fname = os.path.join(self.path, f"{name}.bin")
            cat.astype(cat.dtype.newbyteorder("<")).tofile(fname)
            meta["variables"][name] = {
                "dtype": cat.dtype.str,
                "shape": list(cat.shape),
                "axis": axis,
                "count": counts,
                "offset": np.concatenate(
                    [[0], np.cumsum(counts)[:-1]]
                ).astype(int).tolist(),
            }
        with open(os.path.join(self.path, "meta.json"), "w") as f:
            json.dump(meta, f)


class GraphArrayStore:
    """ref: AdiosDataset (adiosdataset.py:482-976). Sequence of GraphSample."""

    def __init__(self, path: str, preload: bool = False):
        self.shards = sorted(glob.glob(os.path.join(path, "shard_*")))
        if not self.shards:
            raise FileNotFoundError(f"No shards under {path!r}")
        self._metas = []
        self._arrays: List[Dict[str, np.ndarray]] = []
        self.attrs: Dict[str, Any] = {}
        for sh in self.shards:
            with open(os.path.join(sh, "meta.json")) as f:
                meta = json.load(f)
            self._metas.append(meta)
            self.attrs.update(meta.get("attrs", {}))
            arrs = {}
            for name, var in meta["variables"].items():
                fname = os.path.join(sh, f"{name}.bin")
                a = np.memmap(
                    fname, dtype=np.dtype(var["dtype"]), mode="r"
                ).reshape(var["shape"])
                if preload:
                    a = np.array(a)
                arrs[name] = a
            self._arrays.append(arrs)
        self._index = []  # (shard, local_idx)
        for si, meta in enumerate(self._metas):
            for i in range(meta["n_samples"]):
                self._index.append((si, i))

    def __len__(self) -> int:
        return len(self._index)

    def _slice(self, si: int, name: str, i: int):
        var = self._metas[si]["variables"].get(name)
        if var is None:
            return None
        a = self._arrays[si][name]
        off, cnt, axis = var["offset"][i], var["count"][i], var["axis"]
        sl = [slice(None)] * a.ndim
        sl[axis] = slice(off, off + cnt)
        return np.array(a[tuple(sl)])

    def __getitem__(self, idx: int) -> GraphSample:
        si, i = self._index[idx]
        get = lambda name: self._slice(si, name, i)
        energy = get("energy")
        return GraphSample(
            x=get("x"),
            pos=get("pos"),
            edge_index=get("edge_index"),
            edge_shifts=get("edge_shifts"),
            edge_attr=get("edge_attr"),
            y_graph=get("y_graph"),
            y_node=get("y_node"),
            energy=None if energy is None else energy[0],
            forces=get("forces"),
            pe=get("pe"),
            rel_pe=get("rel_pe"),
            dataset_id=self._metas[si]["dataset_id"][i],
        )
