import numpy as np
import jax.numpy as jnp

from hydragnn_tpu.graph import GraphSample, collate, pad_sizes


def make_sample(n, e, seed=0, with_targets=True):
    rng = np.random.RandomState(seed)
    ei = np.stack([rng.randint(0, n, e), rng.randint(0, n, e)])
    return GraphSample(
        x=rng.randn(n, 2).astype(np.float32),
        pos=rng.randn(n, 3).astype(np.float32),
        edge_index=ei,
        y_graph=rng.randn(1).astype(np.float32) if with_targets else None,
        y_node=rng.randn(n, 1).astype(np.float32) if with_targets else None,
    )


def test_pad_sizes_reserved_slots():
    n, e, g = pad_sizes(10, 20, 4)
    assert n >= 11 and e >= 20 and g == 5
    assert n % 64 == 0


def test_collate_contents():
    s1 = make_sample(3, 4, seed=1)
    s2 = make_sample(5, 6, seed=2)
    b = collate([s1, s2], sort_edges_by_receiver=False)
    assert int(b.node_mask.sum()) == 8
    assert int(b.edge_mask.sum()) == 10
    assert int(b.graph_mask.sum()) == 2
    np.testing.assert_allclose(np.asarray(b.x[:3]), s1.x)
    np.testing.assert_allclose(np.asarray(b.x[3:8]), s2.x)
    # second graph's edges offset by 3
    np.testing.assert_array_equal(np.asarray(b.senders[4:10]), s2.edge_index[0] + 3)
    np.testing.assert_array_equal(np.asarray(b.node_graph_idx[:8]),
                                  [0, 0, 0, 1, 1, 1, 1, 1])
    # padding nodes point at reserved padding graph
    assert int(b.node_graph_idx[-1]) == b.num_graphs - 1
    assert not bool(b.graph_mask[-1])
    np.testing.assert_allclose(np.asarray(b.graph_y[0]), s1.y_graph)
    np.testing.assert_allclose(np.asarray(b.node_y[3:8]), s2.y_node)


def test_collate_sorted_receivers():
    s1 = make_sample(6, 12, seed=3)
    b = collate([s1])
    r = np.asarray(b.receivers)
    m = np.asarray(b.edge_mask)
    assert np.all(np.diff(r) >= 0)  # sorted overall (padding points at last node)
    # sorted edges preserve multiset of (sender, receiver) pairs
    orig = set(map(tuple, s1.edge_index.T))
    got = set(zip(np.asarray(b.senders)[m].tolist(), r[m].tolist()))
    assert orig == got
