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

    # Descriptors: SphericalCoordinates / PointPairFeatures /
    # LocalCartesian edge transforms (ref: abstractrawdataset.py:115-140 —
    # mutually exclusive with each other; both-at-once raises upstream too)
    desc = ds_cfg.get("Descriptors", {})
    picked = [k for k in ("SphericalCoordinates", "PointPairFeatures",
                          "LocalCartesian") if desc.get(k)]
    if len(picked) > 1:
        raise ValueError(
            "Descriptors are mutually exclusive (each already encodes the "
            f"distance): {picked}"
        )
    if picked == ["SphericalCoordinates"]:
        samples = [add_spherical_edge_features(s) for s in samples]
    elif picked == ["PointPairFeatures"]:
        samples = [add_point_pair_features(s) for s in samples]
    elif picked == ["LocalCartesian"]:
        samples = [add_local_cartesian_edge_features(s) for s in samples]

    # a picked descriptor already encodes the edge length as its first
    # component, so the plain Distance feature is skipped (the reference's
    # FIXME about duplicate distances; abstractrawdataset.py:124-133)
    if arch.get("edge_features") and not picked:
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


def _edge_vectors(sample: GraphSample) -> np.ndarray:
    src, dst = sample.edge_index
    vec = sample.pos[dst] - sample.pos[src]
    if sample.edge_shifts is not None:
        vec = vec + sample.edge_shifts
    return vec


def add_spherical_edge_features(
    sample: GraphSample, norm: bool = False, cat: bool = False
) -> GraphSample:
    """Edge attrs [rho, theta, phi] — PyG ``Spherical`` equivalent
    (ref: abstractrawdataset.py:137 ``Spherical(norm=False, cat=False)``;
    torch_geometric.transforms.Spherical semantics: theta = azimuth in
    [0, 2pi), phi = polar in [0, pi]; norm=True scales rho by the max and
    the angles by 2pi/pi). PBC-corrected via edge_shifts."""
    vec = _edge_vectors(sample).astype(np.float64)
    rho = np.linalg.norm(vec, axis=1)
    theta = np.arctan2(vec[:, 1], vec[:, 0])
    theta = theta + (theta < 0) * (2 * np.pi)
    safe = np.where(rho > 0, rho, 1.0)
    phi = np.arccos(np.clip(vec[:, 2] / safe, -1.0, 1.0))
    if norm:
        rho = rho / max(float(rho.max()), 1e-12)
        theta = theta / (2 * np.pi)
        phi = phi / np.pi
    ea = np.stack([rho, theta, phi], axis=1).astype(np.float32)
    if cat and sample.edge_attr is not None:
        ea = np.concatenate([sample.edge_attr, ea], axis=1)
    return GraphSample(**{**sample.__dict__, "edge_attr": ea})


def add_local_cartesian_edge_features(
    sample: GraphSample, norm: bool = True, cat: bool = False
) -> GraphSample:
    """Edge attrs = displacement vectors, scaled per receiver into [0, 1]
    — PyG ``LocalCartesian`` equivalent (ref:
    examples/open_materials_2024/omat24.py:24 ``LocalCartesian(norm=False,
    cat=False)``; the transform divides by 2*max|component| per receiver
    and shifts by 0.5 when norm). PBC-corrected via edge_shifts."""
    vec = _edge_vectors(sample).astype(np.float64)
    if norm and vec.size:
        _, dst = sample.edge_index
        mx = np.zeros(sample.num_nodes)
        np.maximum.at(mx, dst, np.abs(vec).max(axis=1))
        scale = 1.0 / (2.0 * np.where(mx > 0, mx, 1.0))
        vec = vec * scale[dst][:, None] + 0.5
    ea = vec.astype(np.float32)
    if cat and sample.edge_attr is not None:
        ea = np.concatenate([sample.edge_attr, ea], axis=1)
    return GraphSample(**{**sample.__dict__, "edge_attr": ea})


def add_point_pair_features(
    sample: GraphSample, cat: bool = False
) -> GraphSample:
    """Edge attrs [dist, angle(n_s, d), angle(n_d, d), angle(n_s, n_d)] —
    PyG ``PointPairFeatures`` equivalent (ref: abstractrawdataset.py:140
    ``PointPairFeatures(cat=False)``). PyG requires per-node normals
    (``data.norm``); raw structure data has none, so the centered unit
    position vector stands in (the reference path would fail outright
    without normals)."""
    vec = _edge_vectors(sample).astype(np.float64)
    pos = sample.pos.astype(np.float64)
    ctr = pos - pos.mean(0, keepdims=True)
    nrm = ctr / np.maximum(np.linalg.norm(ctr, axis=1, keepdims=True), 1e-12)
    src, dst = sample.edge_index
    d = np.linalg.norm(vec, axis=1)
    u = vec / np.maximum(d[:, None], 1e-12)

    def ang(a, b):
        return np.arccos(np.clip(np.sum(a * b, axis=1), -1.0, 1.0))

    ea = np.stack(
        [d, ang(nrm[src], u), ang(nrm[dst], u), ang(nrm[src], nrm[dst])],
        axis=1,
    ).astype(np.float32)
    if cat and sample.edge_attr is not None:
        ea = np.concatenate([sample.edge_attr, ea], axis=1)
    return GraphSample(**{**sample.__dict__, "edge_attr": ea})
