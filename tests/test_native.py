"""Native C++ neighbor search: build + equality with the numpy path."""

import subprocess
import sys

import numpy as np
import pytest

from hydragnn_tpu.native.build import build
import hydragnn_tpu.native as native


@pytest.fixture(scope="module", autouse=True)
def built():
    build()
    native._TRIED = False
    native._LIB = None
    assert native.available()
    yield


def _numpy_radius_graph(pos, r, max_nb):
    import hydragnn_tpu.data.neighbors as nb

    L = native.lib
    native.lib = lambda: None  # force numpy path
    try:
        return nb.radius_graph(pos, r, max_num_neighbors=max_nb)
    finally:
        native.lib = L


def _edges_set(ei):
    return set(map(tuple, np.asarray(ei).T))


def test_radius_graph_native_matches_numpy():
    from hydragnn_tpu.data.neighbors import radius_graph

    rng = np.random.RandomState(0)
    pos = rng.rand(200, 3).astype(np.float32) * 4
    got = radius_graph(pos, 1.0, max_num_neighbors=1000)
    want = _numpy_radius_graph(pos, 1.0, 1000)
    assert _edges_set(got) == _edges_set(want)


def test_radius_graph_degree_cap():
    from hydragnn_tpu.data.neighbors import radius_graph

    rng = np.random.RandomState(1)
    pos = rng.rand(50, 3).astype(np.float32)  # dense cluster
    ei = radius_graph(pos, 2.0, max_num_neighbors=5)
    deg = np.bincount(ei[1], minlength=50)
    assert deg.max() <= 5
    # capped neighbors are the nearest ones
    d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    for i in range(50):
        nbrs = set(ei[0][ei[1] == i].tolist())
        order = np.argsort(d[i], kind="stable")
        nearest = [j for j in order if j != i][:5]
        assert nbrs == set(nearest)


def test_radius_graph_pbc_native_shifts():
    from hydragnn_tpu.data.neighbors import edge_lengths, radius_graph_pbc

    # H2-like: two atoms near opposite faces connect through the boundary
    pos = np.array([[0.2, 0.5, 0.5], [2.8, 0.5, 0.5]], np.float32)
    cell = np.eye(3, dtype=np.float32) * 3.0
    ei, shifts = radius_graph_pbc(pos, cell, 0.9, max_num_neighbors=10)
    assert ei.shape[1] >= 2
    d = edge_lengths(pos, ei, shifts)
    np.testing.assert_allclose(d, 0.4, atol=1e-5)
