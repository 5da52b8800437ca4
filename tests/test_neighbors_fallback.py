"""Sparse-structure robustness of the PBC radius graph: cutoff-growth
retry and artificial-edge fallback for isolated atoms (ref:
preprocess/graph_samples_checks_and_updates.py:162-208,284-307)."""

import numpy as np

from hydragnn_tpu.data.neighbors import radius_graph_pbc


def _in_degrees(edge_index, n):
    return np.bincount(edge_index[1], minlength=n)


def test_cutoff_growth_connects_sparse_pair():
    # two atoms 1.2*r apart: base cutoff finds nothing, one 1.25x growth
    # (r -> 1.25r > 1.2r) connects them
    cell = np.eye(3) * 50.0
    pos = np.array([[10.0, 10.0, 10.0], [13.6, 10.0, 10.0]])
    r = 3.0  # separation 3.6 = 1.2*r
    ei, shifts = radius_graph_pbc(pos, cell, r, max_num_neighbors=10)
    deg = _in_degrees(ei, 2)
    assert np.all(deg >= 1)
    # the connection is geometric (zero shift, found by the grown cutoff)
    vec = pos[ei[1]] - pos[ei[0]] + shifts
    d = np.linalg.norm(vec, axis=1)
    np.testing.assert_allclose(d, 3.6, rtol=1e-5)


def test_artificial_edges_for_truly_isolated_atom():
    # third atom ~20 apart in a huge cell: even 3 growth attempts
    # (r*1.25^2 = 4.7) cannot reach it -> artificial zero-shift edge
    cell = np.eye(3) * 100.0
    pos = np.array(
        [[10.0, 10.0, 10.0], [11.0, 10.0, 10.0], [40.0, 40.0, 40.0]]
    )
    ei, shifts = radius_graph_pbc(pos, cell, 3.0, max_num_neighbors=10)
    deg = _in_degrees(ei, 3)
    assert np.all(deg >= 1), deg
    # the artificial edge into node 2 has zero shift and a valid source
    art = ei[:, ei[1] == 2]
    assert art.shape[1] >= 1
    assert np.all(art[0] != 2)


def test_ensure_connected_off_keeps_raw_behavior():
    cell = np.eye(3) * 100.0
    pos = np.array([[10.0, 10.0, 10.0], [40.0, 40.0, 40.0]])
    ei, _ = radius_graph_pbc(
        pos, cell, 3.0, max_num_neighbors=10, ensure_connected=False
    )
    assert ei.shape[1] == 0


def test_dense_structure_unchanged():
    # a structure that is already fully connected takes the fast path:
    # identical output with and without ensure_connected
    rng = np.random.RandomState(0)
    cell = np.eye(3) * 6.0
    pos = rng.rand(20, 3) * 6.0
    a = radius_graph_pbc(pos, cell, 3.0, max_num_neighbors=16)
    b = radius_graph_pbc(
        pos, cell, 3.0, max_num_neighbors=16, ensure_connected=False
    )
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_allclose(a[1], b[1])
