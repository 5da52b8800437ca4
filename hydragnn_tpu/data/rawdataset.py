"""Config-driven raw structure datasets: CFG and XYZ formats.

TPU-native equivalent of the reference's OO raw pipeline
(ref: hydragnn/utils/datasets/abstractrawdataset.py:29-405 — file walk,
per-file transform to a graph object, ``*_scaled_num_nodes`` feature
scaling, min-max normalization; cfgdataset.py:40-84 — CFG node features
[protons, masses, c_peratom, fx, fy, fz] + ``.bulk`` sidecar graph
features; xyzdataset.py:41-70 — XYZ node features [protons] +
``*_energy.txt`` sidecar). Here the pipeline is plain-numpy host code
producing static ``GraphSample``s: parse -> scale-by-num-nodes ->
minmax normalize -> (PBC) radius graph -> target extraction ->
structure transforms — the same stages, functional instead of an ABC
hierarchy, because the device side only ever sees collated static
arrays.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from hydragnn_tpu.graph import GraphSample
from hydragnn_tpu.data.lsms import extract_targets_sample, minmax_normalize
from hydragnn_tpu.data.neighbors import radius_graph, radius_graph_pbc
from hydragnn_tpu.data.raw_loaders import read_cfg, read_xyz


def collect_raw_files(path: str, exts: Tuple[str, ...]) -> List[str]:
    """Sorted file walk, one directory level deep
    (ref: abstractrawdataset.py:176-196)."""
    if not os.path.isdir(path):
        raise ValueError(f"Folder not found: {path!r}")
    out: List[str] = []
    for name in sorted(os.listdir(path)):
        fp = os.path.join(path, name)
        if os.path.isfile(fp) and name.endswith(exts):
            out.append(fp)
        elif os.path.isdir(fp):
            for sub in sorted(os.listdir(fp)):
                sp = os.path.join(fp, sub)
                if os.path.isfile(sp) and sub.endswith(exts):
                    out.append(sp)
    return out


def _sidecar_graph_features(
    filepath: str,
    suffixes: Tuple[str, ...],
    graph_dims: List[int],
    graph_cols: List[int],
) -> Optional[np.ndarray]:
    """Graph targets from a sidecar file next to the structure file
    (ref: cfgdataset.py:68-82 ``.bulk``; xyzdataset.py:57-69
    ``*_energy.txt``)."""
    stem = os.path.splitext(filepath)[0]
    for suf in suffixes:
        sc = stem + suf
        if os.path.exists(sc):
            with open(sc, "r", encoding="utf-8") as f:
                toks = f.readline().split()
            vals = []
            for dim, col in zip(graph_dims, graph_cols):
                for icomp in range(dim):
                    vals.append(float(toks[col + icomp]))
            return np.asarray(vals, np.float32)
    return None


def cfg_to_arrays(
    filepath: str, graph_dims: List[int], graph_cols: List[int]
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray], np.ndarray]:
    """(x_full [n, 2+aux], pos, y_graph or None, cell). Node feature
    layout matches the reference: protons, masses, then the CFG auxiliary
    columns (c_peratom, fx, fy, fz for the NiNb EAM dumps)
    (ref: cfgdataset.py:55-65)."""
    zs, pos, cell, info = read_cfg(filepath)
    cols = [zs[:, None], info["masses"][:, None]]
    if info["aux"].shape[1]:
        cols.append(info["aux"])
    x = np.concatenate(cols, axis=1).astype(np.float32)
    y = _sidecar_graph_features(filepath, (".bulk",), graph_dims, graph_cols)
    return x, pos, y, cell


def xyz_to_arrays(
    filepath: str, graph_dims: List[int], graph_cols: List[int]
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray], Optional[np.ndarray]]:
    """(x_full [n, 1], pos, y_graph or None, cell or None)
    (ref: xyzdataset.py:41-70)."""
    zs, pos, cell, info = read_xyz(filepath)
    x = zs[:, None].astype(np.float32)
    y = _sidecar_graph_features(
        filepath, ("_energy.txt",), graph_dims, graph_cols
    )
    if y is None and graph_dims and "energy" in info:
        y = np.asarray([info["energy"]], np.float32)
    return x, pos, y, cell


def scale_features_by_num_nodes(
    xs: List[np.ndarray],
    ys: List[Optional[np.ndarray]],
    node_names: List[str],
    graph_names: List[str],
    node_dims: List[int],
    graph_dims: List[int],
) -> None:
    """In-place division of ``*_scaled_num_nodes`` features by the node
    count (ref: abstractrawdataset.py:295-320)."""
    node_blocks = [
        i for i, nm in enumerate(node_names) if "_scaled_num_nodes" in nm
    ]
    graph_blocks = [
        i for i, nm in enumerate(graph_names) if "_scaled_num_nodes" in nm
    ]
    for x, y in zip(xs, ys):
        n = max(x.shape[0], 1)
        for i in node_blocks:
            s = sum(node_dims[:i])
            x[:, s : s + node_dims[i]] /= n
        if y is not None:
            for i in graph_blocks:
                s = sum(graph_dims[:i])
                y[s : s + graph_dims[i]] /= n


def load_raw_dataset(
    config: Dict[str, Any], path: str, limit: Optional[int] = None
) -> List[GraphSample]:
    """Full raw pipeline for ``"format": "CFG" | "XYZ"`` configs — the
    counterpart of the reference's ``transform_raw_data_to_serialized``
    + serialized load (ref: preprocess/load_data.py:380-392)."""
    ds_cfg = config["Dataset"]
    arch = config["NeuralNetwork"]["Architecture"]
    var = config["NeuralNetwork"]["Variables_of_interest"]
    fmt = ds_cfg["format"]

    node_names = ds_cfg["node_features"].get("name") or []
    node_dims = ds_cfg["node_features"]["dim"]
    graph_names = ds_cfg["graph_features"].get("name") or []
    graph_dims = ds_cfg["graph_features"]["dim"]
    graph_cols = ds_cfg["graph_features"]["column_index"]

    if fmt == "CFG":
        files = collect_raw_files(path, (".cfg",))
        parse = cfg_to_arrays
    elif fmt == "XYZ":
        files = collect_raw_files(path, (".xyz",))
        parse = xyz_to_arrays
    else:
        raise ValueError(f"Unknown raw format: {fmt}")
    if not files:
        raise FileNotFoundError(f"No {fmt} files under {path!r}")
    if limit is not None:
        files = files[:limit]

    xs, poss, ys, cells = [], [], [], []
    for fp in files:
        x, pos, y, cell = parse(fp, graph_dims, graph_cols)
        xs.append(x)
        poss.append(pos)
        ys.append(y)
        cells.append(cell)

    scale_features_by_num_nodes(
        xs, ys, node_names, graph_names, node_dims, graph_dims
    )

    have_y = all(y is not None for y in ys)
    if ds_cfg.get("normalize_features", True):
        node_minmax, graph_minmax = minmax_normalize(
            xs,
            [y for y in ys if y is not None],
            node_dims,
            graph_dims if have_y else [],
        )
        # per-head minmax for denormalize_output (ref: config_utils.py:289-311)
        y_minmax = []
        for t, idx in zip(
            var["type"], var.get("output_index", range(len(var["type"])))
        ):
            mm = graph_minmax if t == "graph" else node_minmax
            if mm.shape[1] > idx:
                y_minmax.append([float(mm[0, idx]), float(mm[1, idx])])
            else:
                y_minmax.append([0.0, 1.0])
        var["y_minmax"] = y_minmax

    radius = float(arch.get("radius", 2.0) or 2.0)
    max_nb = int(arch.get("max_neighbours", 100) or 100)
    pbc = bool(arch.get("periodic_boundary_conditions", False))
    samples = []
    for x, pos, y, cell in zip(xs, poss, ys, cells):
        shifts = None
        if pbc and cell is not None:
            ei, shifts = radius_graph_pbc(
                pos, cell, radius, max_num_neighbors=max_nb
            )
        else:
            ei = radius_graph(pos, radius, max_num_neighbors=max_nb)
        s = extract_targets_sample(
            x, pos, np.zeros(0, np.float32) if y is None else y,
            ei, var, graph_dims, node_dims,
        )
        if shifts is not None:
            s = GraphSample(**{**s.__dict__, "edge_shifts": shifts})
        samples.append(s)

    from hydragnn_tpu.data.transforms import apply_structure_transforms

    return apply_structure_transforms(samples, config)
