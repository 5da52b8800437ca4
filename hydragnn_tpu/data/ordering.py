"""Bandwidth-reducing node ordering for giant graphs (host-side).

The fused adjacency-block SpMM kernel (ops/pallas_spmm.py) streams a bounded
sender *window* of node features per edge tile; collate's receiver sort keeps
windows tight for batches of small graphs (each graph's ids are contiguous),
but a single giant graph (LSMS supercells, Ising lattices, OC-style slabs)
has whatever node order the dataset shipped — often one that scatters a
receiver-run's senders across the whole id range, forcing the kernel's
unfused fallback.

Reverse Cuthill-McKee reordering bounds the adjacency bandwidth (for
d-dimensional geometric graphs: ~O(N^((d-1)/d))), so after relabeling, the
senders of any receiver-sorted edge tile span a narrow window and the fused
kernel engages. Pure-NumPy BFS (no scipy dependency); reference framework has
no equivalent (its torch_scatter path is order-insensitive) — this is a
TPU-design addition.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from hydragnn_tpu.graph import GraphSample


def rcm_order(
    edge_index: np.ndarray, num_nodes: int
) -> np.ndarray:
    """Reverse Cuthill-McKee permutation: ``perm[new_id] = old_id``.

    BFS from a minimum-degree node per connected component, visiting each
    node's unvisited neighbors in ascending degree order, then reversing.
    """
    send, recv = np.asarray(edge_index[0]), np.asarray(edge_index[1])
    # undirected adjacency in CSR form (duplicates are harmless for BFS)
    u = np.concatenate([send, recv])
    v = np.concatenate([recv, send])
    order = np.argsort(u, kind="stable")
    u, v = u[order], v[order]
    indptr = np.zeros(num_nodes + 1, np.int64)
    np.add.at(indptr, u + 1, 1)
    indptr = np.cumsum(indptr)
    degree = np.diff(indptr)

    visited = np.zeros(num_nodes, bool)
    out = np.empty(num_nodes, np.int64)
    pos = 0
    # component seeds in ascending degree (isolated nodes included)
    seeds = np.argsort(degree, kind="stable")
    queue = np.empty(num_nodes, np.int64)
    for seed in seeds:
        if visited[seed]:
            continue
        head, tail = 0, 1
        queue[0] = seed
        visited[seed] = True
        while head < tail:
            n = queue[head]
            head += 1
            out[pos] = n
            pos += 1
            nbrs = v[indptr[n] : indptr[n + 1]]
            nbrs = nbrs[~visited[nbrs]]
            if nbrs.size:
                nbrs = np.unique(nbrs)  # sorted, deduped
                nbrs = nbrs[np.argsort(degree[nbrs], kind="stable")]
                visited[nbrs] = True
                queue[tail : tail + nbrs.size] = nbrs
                tail += nbrs.size
    return out[::-1].copy()


def band_order(
    edge_index: np.ndarray, num_nodes: int, block: int = 512
) -> np.ndarray:
    """Pick the ordering that minimizes the BCSR band kernel's dense-tile
    work: scores candidate permutations (identity, RCM) with the band +
    outlier cost model of ``ops.bcsr._choose_window`` and returns the
    cheapest, ``perm[new_id] = old_id``.

    RCM minimizes BANDWIDTH, which is the wrong objective for near-regular
    periodic graphs: on a torus its BFS level sets are ~3x wider than the
    natural raster band, whose only defects — the wrap edges — the BCSR
    outlier tiles absorb for free. Scoring both under the kernel's actual
    cost model picks raster there and RCM for shipped-shuffled node orders.
    """
    from hydragnn_tpu.ops.bcsr import _choose_window

    send = np.asarray(edge_index[0], np.int64)
    recv = np.asarray(edge_index[1], np.int64)

    def cost(perm: Optional[np.ndarray]) -> float:
        if perm is None:
            s, r = send, recv
        else:
            inv = np.empty(num_nodes, np.int64)
            inv[perm] = np.arange(num_nodes)
            s, r = inv[send], inv[recv]
        total = 0.0
        for rows, cols in ((r, s), (s, r)):
            sel = _choose_window(rows, cols, num_nodes, block)
            if sel is None:
                return np.inf
            total += sel[3]
        return total

    rcm = rcm_order(edge_index, num_nodes)
    if cost(None) <= cost(rcm):
        return np.arange(num_nodes, dtype=np.int64)
    return rcm


def reorder_sample(sample: GraphSample, perm: np.ndarray) -> GraphSample:
    """Relabel a sample's nodes by ``perm`` (perm[new_id] = old_id).

    Node arrays are permuted; edge endpoints are relabeled (edge order is
    irrelevant — collate re-sorts by receiver). Targets (y_node, forces)
    move with their nodes, so losses/metrics are unchanged; only the row
    order of per-node predictions differs.
    """
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.shape[0])
    take = lambda a: None if a is None else np.asarray(a)[perm]
    return dataclasses.replace(
        sample,
        x=np.asarray(sample.x)[perm],
        pos=np.asarray(sample.pos)[perm],
        edge_index=inv[np.asarray(sample.edge_index)],
        y_node=take(sample.y_node),
        forces=take(sample.forces),
        pe=take(sample.pe),
    )


def rcm_reorder_sample(
    sample: GraphSample, min_nodes: int = 512
) -> GraphSample:
    """Apply RCM relabeling to a sample when it is large enough to matter
    (small graphs are already window-local after collate)."""
    if sample.num_nodes < min_nodes or sample.num_edges == 0:
        return sample
    return reorder_sample(
        sample, rcm_order(np.asarray(sample.edge_index), sample.num_nodes)
    )
