"""PBC shift vectors reach the model geometry in static-geometry stacks.

Round-3 beyond-parity fix: the reference zeroes edge shifts for EGNN and
SchNet even when coordinates never move (EGCLStack.py:113-115,
SCFStack.py:166-168), making cross-boundary distances wrong on periodic
data. Our non-equivariant stacks apply the Cartesian shifts; these tests
pin the behavior with a two-atom cell where the through-boundary distance
differs from the naive one."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hydragnn_tpu.graph import GraphSample, collate
from hydragnn_tpu.data.neighbors import radius_graph_pbc
from hydragnn_tpu.models.create import create_model
from tests.test_models_forward import _extra, make_cfg


def _pbc_sample(L=4.0):
    # atoms at x=0.2 and x=3.8 in a length-4 box: naive distance 3.6,
    # true minimum-image distance 0.4 (through the boundary)
    pos = np.array([[0.2, 2.0, 2.0], [3.8, 2.0, 2.0]], np.float32)
    cell = np.eye(3) * L
    ei, shifts = radius_graph_pbc(pos, cell, 1.0, max_num_neighbors=4)
    assert ei.shape[1] >= 2  # boundary edge found in both directions
    d = np.linalg.norm(pos[ei[1]] - pos[ei[0]] + shifts, axis=1)
    np.testing.assert_allclose(d, 0.4, atol=1e-5)
    return GraphSample(
        x=np.ones((2, 1), np.float32), pos=pos, edge_index=ei,
        edge_shifts=shifts, y_graph=np.zeros(1, np.float32),
    )


@pytest.mark.parametrize("mpnn_type", ["EGNN", "SchNet"])
def test_static_stack_sees_minimum_image_distance(mpnn_type):
    """Model output must equal that of an equivalent NON-periodic pair at
    the minimum-image distance (0.4), and differ from the naive-distance
    (3.6) pair — only true if shifts flow into the geometry."""
    s_pbc = _pbc_sample()
    # same topology, no PBC: pair at the true distance
    pos_true = np.array([[0.0, 0.0, 0.0], [0.4, 0.0, 0.0]], np.float32)
    ei = np.array([[0, 1], [1, 0]])
    s_true = GraphSample(
        x=np.ones((2, 1), np.float32), pos=pos_true,
        edge_index=ei, y_graph=np.zeros(1, np.float32),
    )
    pos_naive = np.array([[0.0, 0.0, 0.0], [3.6, 0.0, 0.0]], np.float32)
    s_naive = GraphSample(
        x=np.ones((2, 1), np.float32), pos=pos_naive,
        edge_index=ei, y_graph=np.zeros(1, np.float32),
    )

    cfg = make_cfg(mpnn_type, **_extra(mpnn_type))
    model = create_model(cfg)
    b_pbc = collate([s_pbc], n_node_pad=8, n_edge_pad=8)
    b_true = collate([s_true], n_node_pad=8, n_edge_pad=8)
    b_naive = collate([s_naive], n_node_pad=8, n_edge_pad=8)
    params = model.init(jax.random.PRNGKey(0), b_pbc, train=False)["params"]

    def out(b):
        return np.asarray(
            model.apply({"params": params}, b, train=False)[0]
        )[0]

    o_pbc, o_true, o_naive = out(b_pbc), out(b_true), out(b_naive)
    # rotation invariance of both stacks makes the distance the only
    # geometric input, so PBC output == true-distance output
    np.testing.assert_allclose(o_pbc, o_true, rtol=1e-4, atol=1e-5)
    assert not np.allclose(o_pbc, o_naive, rtol=1e-3)
