"""Host-side per-sample transforms (preprocessing).

Laplacian-eigenvector positional encodings + relative edge encodings for GPS
(ref: hydragnn/preprocess/serialized_dataset_loader.py:90-94,183-189 using
torch_geometric AddLaplacianEigenvectorPE), rotational-invariance
normalization (ref: graph_samples_checks_and_updates.py NormalizeRotation
usage), and edge-length features.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from hydragnn_tpu.graph import GraphSample
from hydragnn_tpu.data.neighbors import edge_lengths


def add_laplacian_eigenvector_pe(
    sample: GraphSample, k: int, is_undirected: bool = True
) -> GraphSample:
    """pe[n, k]: eigenvectors of the symmetric-normalized Laplacian for the
    k smallest nonzero eigenvalues; rel_pe[e, k] = |pe[dst] - pe[src]|
    (ref: serialized_dataset_loader.py:183-189)."""
    n = sample.num_nodes
    src, dst = sample.edge_index
    A = np.zeros((n, n))
    A[src, dst] = 1.0
    if is_undirected:
        A = np.maximum(A, A.T)
    deg = A.sum(1)
    dinv = 1.0 / np.sqrt(np.maximum(deg, 1e-12))
    L = np.eye(n) - dinv[:, None] * A * dinv[None, :]
    vals, vecs = np.linalg.eigh(L)
    order = np.argsort(vals)
    # skip the first (trivial) eigenvector, take next k
    sel = order[1 : k + 1]
    pe = vecs[:, sel]
    if pe.shape[1] < k:
        pe = np.pad(pe, ((0, 0), (0, k - pe.shape[1])))
    # sign disambiguation: make the largest-|.| entry positive per vector
    for i in range(pe.shape[1]):
        j = np.argmax(np.abs(pe[:, i]))
        if pe[j, i] < 0:
            pe[:, i] = -pe[:, i]
    rel_pe = np.abs(pe[dst] - pe[src])
    return GraphSample(
        **{
            **sample.__dict__,
            "pe": pe.astype(np.float32),
            "rel_pe": rel_pe.astype(np.float32),
        }
    )


def normalize_rotation(sample: GraphSample) -> GraphSample:
    """Rotate positions into the PCA frame (PyG NormalizeRotation analogue,
    ref: tests/test_rotational_invariance.py usage)."""
    pos = sample.pos - sample.pos.mean(0, keepdims=True)
    _, _, vt = np.linalg.svd(pos, full_matrices=False)
    pos = pos @ vt.T
    shifts = sample.edge_shifts
    if shifts is not None:
        # PBC shift vectors are Cartesian displacements — rotate with pos
        shifts = (shifts @ vt.T).astype(np.float32)
    return GraphSample(**{
        **sample.__dict__, "pos": pos.astype(np.float32),
        "edge_shifts": shifts,
    })


def add_edge_lengths(
    sample: GraphSample, max_length: Optional[float] = None
) -> GraphSample:
    """edge_attr[:, 0] = (optionally max-normalized) edge length
    (ref: serialized_dataset_loader.py:157-169 Distance(norm=True) with
    distributed max reduction — the max is supplied by the loader)."""
    d = edge_lengths(sample.pos, sample.edge_index, sample.edge_shifts)
    if max_length:
        d = d / max_length
    ea = d[:, None].astype(np.float32)
    if sample.edge_attr is not None:
        ea = np.concatenate([sample.edge_attr, ea], axis=1)
    return GraphSample(**{**sample.__dict__, "edge_attr": ea})


def apply_structure_transforms(samples, config):
    """Shared post-graph-build transform tail for every raw-format loader
    (ref: serialized_dataset_loader.py:90-189 — rotation normalization,
    max-normalized edge-length features, Laplacian-eigvec PE for GPS).
    Mutates nothing; returns a new sample list."""
    ds_cfg = config["Dataset"]
    arch = config["NeuralNetwork"]["Architecture"]

    if ds_cfg.get("rotational_invariance"):
        samples = [normalize_rotation(s) for s in samples]

    if arch.get("edge_features"):
        max_len = max(
            (
                float(
                    edge_lengths(s.pos, s.edge_index, s.edge_shifts).max()
                )
                for s in samples
                if s.num_edges
            ),
            default=1.0,
        )
        samples = [add_edge_lengths(s, max_length=max_len) for s in samples]

    pe_dim = int(arch.get("pe_dim") or 0)
    if arch.get("global_attn_engine") and pe_dim > 0:
        samples = [add_laplacian_eigenvector_pe(s, pe_dim) for s in samples]
    return samples
