"""LSMS-format raw data loader + unit-test dataset path.

Host-side numpy equivalent of the reference's raw-loader pipeline:
  - text parse (ref: hydragnn/preprocess/lsms_raw_dataset_loader.py:39-110,
    incl. the charge-density update x[:,1] -= x[:,0]),
  - min-max normalization of all node/graph features to [0,1]
    (ref: raw_dataset_loader.py:193-277),
  - radius-graph construction + target extraction per Variables_of_interest
    (ref: serialized_dataset_loader.py:110-259;
     graph_samples_checks_and_updates.py:493-533 ``update_predicted_values``).

Produces ``GraphSample``s with ``x`` = selected input features, ``y_graph`` /
``y_node`` = per-head targets in declaration order.
"""

from __future__ import annotations

import glob
import os
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from hydragnn_tpu.graph import GraphSample
from hydragnn_tpu.data.neighbors import radius_graph


def parse_lsms_file(
    filepath: str,
    node_feature_dim: List[int],
    node_feature_col: List[int],
    graph_feature_dim: List[int],
    graph_feature_col: List[int],
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (node_features [n, sum(node_dims)], pos [n,3], graph_features)."""
    with open(filepath, "r", encoding="utf-8") as f:
        lines = f.readlines()
    graph_feat = lines[0].split(None, 2)
    g_feature = []
    for item in range(len(graph_feature_dim)):
        for icomp in range(graph_feature_dim[item]):
            g_feature.append(float(graph_feat[graph_feature_col[item] + icomp]))
    pos = []
    feats = []
    for line in lines[1:]:
        cols = line.split(None, 11)
        pos.append([float(cols[2]), float(cols[3]), float(cols[4])])
        row = []
        for item in range(len(node_feature_dim)):
            for icomp in range(node_feature_dim[item]):
                row.append(float(cols[node_feature_col[item] + icomp]))
        feats.append(row)
    x = np.asarray(feats, np.float32)
    # charge-density update (ref: lsms_raw_dataset_loader.py:90-110)
    if x.shape[1] >= 2:
        x[:, 1] = x[:, 1] - x[:, 0]
    return x, np.asarray(pos, np.float32), np.asarray(g_feature, np.float32)


def minmax_normalize(
    xs: List[np.ndarray],
    ys: List[np.ndarray],
    node_feature_dim: List[int],
    graph_feature_dim: List[int],
) -> Tuple[np.ndarray, np.ndarray]:
    """In-place [0,1] scaling per feature block; returns (node_minmax, graph_minmax)."""

    def _div(num, den):
        return np.where(np.abs(den) > 1e-12, num / np.where(den == 0, 1, den), num * 0)

    nf, gf = len(node_feature_dim), len(graph_feature_dim)
    node_minmax = np.zeros((2, nf))
    graph_minmax = np.zeros((2, gf))
    for i in range(nf):
        s = sum(node_feature_dim[:i])
        e = s + node_feature_dim[i]
        block = np.concatenate([x[:, s:e].ravel() for x in xs])
        node_minmax[0, i], node_minmax[1, i] = block.min(), block.max()
    for i in range(gf):
        s = sum(graph_feature_dim[:i])
        e = s + graph_feature_dim[i]
        block = np.concatenate([y[s:e].ravel() for y in ys])
        graph_minmax[0, i], graph_minmax[1, i] = block.min(), block.max()
    for x in xs:
        for i in range(nf):
            s = sum(node_feature_dim[:i])
            e = s + node_feature_dim[i]
            x[:, s:e] = _div(x[:, s:e] - node_minmax[0, i],
                             node_minmax[1, i] - node_minmax[0, i])
    for y in ys:
        for i in range(gf):
            s = sum(graph_feature_dim[:i])
            e = s + graph_feature_dim[i]
            y[s:e] = _div(y[s:e] - graph_minmax[0, i],
                          graph_minmax[1, i] - graph_minmax[0, i])
    return node_minmax, graph_minmax


def load_lsms_dataset(config: Dict[str, Any], path: str) -> List[GraphSample]:
    """Full pipeline: parse dir of output*.txt -> normalize -> radius graph ->
    input selection + per-head target extraction."""
    ds_cfg = config["Dataset"]
    arch = config["NeuralNetwork"]["Architecture"]
    var = config["NeuralNetwork"]["Variables_of_interest"]

    node_dims = ds_cfg["node_features"]["dim"]
    node_cols = ds_cfg["node_features"]["column_index"]
    graph_dims = ds_cfg["graph_features"]["dim"]
    graph_cols = ds_cfg["graph_features"]["column_index"]

    files = sorted(glob.glob(os.path.join(path, "*.txt")))
    if not files:
        raise FileNotFoundError(
            f"No LSMS .txt files found in dataset path: {path!r}"
        )
    xs, poss, ys = [], [], []
    for fp in files:
        x, pos, y = parse_lsms_file(fp, node_dims, node_cols, graph_dims, graph_cols)
        xs.append(x)
        poss.append(pos)
        ys.append(y)
    node_minmax, graph_minmax = minmax_normalize(xs, ys, node_dims, graph_dims)
    # per-head minmax for denormalize_output (ref: update_config_minmax,
    # config_utils.py:289-311)
    y_minmax = []
    for t, idx in zip(var["type"], var.get("output_index",
                                           range(len(var["type"])))):
        mm = graph_minmax if t == "graph" else node_minmax
        y_minmax.append([float(mm[0, idx]), float(mm[1, idx])])
    var["y_minmax"] = y_minmax

    radius = float(arch.get("radius", 2.0) or 2.0)
    max_nb = int(arch.get("max_neighbours", 100) or 100)
    samples = []
    for x, pos, y in zip(xs, poss, ys):
        edge_index = radius_graph(pos, radius, max_num_neighbors=max_nb)
        samples.append(
            extract_targets_sample(x, pos, y, edge_index, var, graph_dims, node_dims)
        )

    # rotation normalization, edge-length features, LapPE
    # (ref: serialized_dataset_loader.py:90-189)
    from hydragnn_tpu.data.transforms import apply_structure_transforms

    return apply_structure_transforms(samples, config)


def extract_targets_sample(
    x: np.ndarray,
    pos: np.ndarray,
    y: np.ndarray,
    edge_index: np.ndarray,
    var: Dict[str, Any],
    graph_feature_dim: List[int],
    node_feature_dim: List[int],
) -> GraphSample:
    """Input selection + per-head target layout
    (ref: update_predicted_values, graph_samples_checks_and_updates.py:493-533)."""
    out_type = var["type"]
    out_index = var.get("output_index", list(range(len(out_type))))
    y_graph_parts, y_node_parts = [], []
    for t, idx in zip(out_type, out_index):
        if t == "graph":
            s = sum(graph_feature_dim[:idx])
            y_graph_parts.append(y[s : s + graph_feature_dim[idx]])
        else:
            s = sum(node_feature_dim[:idx])
            y_node_parts.append(x[:, s : s + node_feature_dim[idx]])
    y_graph = np.concatenate(y_graph_parts) if y_graph_parts else None
    y_node = np.concatenate(y_node_parts, axis=1) if y_node_parts else None
    # input node features: column selection over feature blocks
    in_cols = []
    for idx in var["input_node_features"]:
        s = sum(node_feature_dim[:idx])
        in_cols.extend(range(s, s + node_feature_dim[idx]))
    x_in = x[:, in_cols]
    return GraphSample(
        x=x_in.astype(np.float32),
        pos=pos.astype(np.float32),
        edge_index=edge_index,
        y_graph=None if y_graph is None else y_graph.astype(np.float32),
        y_node=None if y_node is None else y_node.astype(np.float32),
    )
