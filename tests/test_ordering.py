"""RCM node reordering + fused-SpMM window hints (giant-graph path)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hydragnn_tpu.data.ordering import (
    rcm_order,
    rcm_reorder_sample,
    reorder_sample,
)
from hydragnn_tpu.graph import GraphSample, collate
from hydragnn_tpu.ops.pallas_spmm import required_window


def _ring_sample(n=600, k=2, seed=0, shuffle=True):
    """k-nearest ring graph with (optionally) shuffled node labels — a giant
    graph whose shipped order scatters senders across the id range."""
    rng = np.random.RandomState(seed)
    send, recv = [], []
    for i in range(n):
        for d in range(1, k + 1):
            for j in (i - d, i + d):
                send.append(j % n)
                recv.append(i)
    ei = np.array([send, recv], dtype=np.int64)
    if shuffle:
        relabel = rng.permutation(n)
        ei = relabel[ei]
    x = rng.randn(n, 4).astype(np.float32)
    pos = rng.randn(n, 3).astype(np.float32)
    y = rng.randn(n, 2).astype(np.float32)
    if shuffle:
        inv = np.empty(n, np.int64)
        inv[relabel] = np.arange(n)
        x, pos, y = x[relabel], pos[relabel], y[relabel]
    return GraphSample(x=x, pos=pos, edge_index=ei, y_node=y)


def _np_aggregate(sample):
    """sum_j x[j] over incoming edges, host reference."""
    out = np.zeros_like(sample.x)
    np.add.at(out, sample.edge_index[1], sample.x[sample.edge_index[0]])
    return out


def test_rcm_reduces_bandwidth():
    s = _ring_sample()
    ei = s.edge_index
    bw_before = np.abs(ei[0] - ei[1]).max()
    perm = rcm_order(ei, s.num_nodes)
    assert sorted(perm.tolist()) == list(range(s.num_nodes))
    s2 = reorder_sample(s, perm)
    bw_after = np.abs(s2.edge_index[0] - s2.edge_index[1]).max()
    assert bw_before > 100  # the shuffle really scattered it
    assert bw_after <= 8  # ring bandwidth ~2k under RCM


def test_reorder_preserves_semantics():
    s = _ring_sample(n=200, seed=3)
    perm = rcm_order(s.edge_index, s.num_nodes)
    s2 = reorder_sample(s, perm)
    # aggregation commutes with relabeling: agg(reordered)[new] =
    # agg(original)[old]
    np.testing.assert_allclose(
        _np_aggregate(s2), _np_aggregate(s)[perm], rtol=1e-6
    )
    np.testing.assert_allclose(s2.y_node, s.y_node[perm])
    np.testing.assert_allclose(s2.pos, s.pos[perm])


def test_rcm_handles_disconnected_and_isolated():
    # two components + an isolated node
    ei = np.array([[0, 1, 3, 4], [1, 0, 4, 3]])
    perm = rcm_order(ei, 6)
    assert sorted(perm.tolist()) == list(range(6))


def test_rcm_reorder_sample_thresholds():
    s = _ring_sample(n=100)
    assert rcm_reorder_sample(s, min_nodes=512) is s  # too small: untouched
    s2 = rcm_reorder_sample(s, min_nodes=50)
    assert s2 is not s


def test_required_window_batched_graphs():
    # bench-shaped batch (128-node graphs, degree 16): a 1024-edge tile sits
    # inside one graph, so the tightest width suffices
    rng = np.random.RandomState(0)
    G, NV, D = 16, 128, 16
    gbase = np.repeat(np.arange(G) * NV, NV * D)
    recv = gbase + np.repeat(np.tile(np.arange(NV), G), D)
    send = gbase + rng.randint(0, NV, G * NV * D)
    order = np.argsort(recv)
    assert required_window(send[order], G * NV) == 160
    # smaller graphs: one tile spans several graphs, next rung up
    G2, NV2, D2 = 64, 32, 6
    gbase2 = np.repeat(np.arange(G2) * NV2, NV2 * D2)
    recv2 = gbase2 + np.repeat(np.tile(np.arange(NV2), G2), D2)
    send2 = gbase2 + rng.randint(0, NV2, G2 * NV2 * D2)
    order2 = np.argsort(recv2)
    assert required_window(send2[order2], G2 * NV2) == 256


def test_required_window_scattered_vs_rcm():
    s = _ring_sample(n=3000, k=4)
    ei = s.edge_index
    order = np.argsort(ei[1])
    # scattered labels: spans reach the whole 3k-node range, only a wide
    # window covers; no narrow rung fits
    assert required_window(ei[0][order], s.num_nodes) == 4096
    assert required_window(
        ei[0][order], s.num_nodes, widths=(160, 256, 512, 1024)
    ) == -1
    s2 = rcm_reorder_sample(s, min_nodes=1)
    ei2 = s2.edge_index
    order2 = np.argsort(ei2[1])
    w = required_window(ei2[0][order2], s2.num_nodes)
    # ring bandwidth is tiny after RCM, but a 1024-edge tile still covers
    # ~128 consecutive receivers: a narrow rung engages instead of -1
    assert w in (160, 256)


def test_collate_sets_spmm_window():
    samples = [_ring_sample(n=40, k=1, seed=i, shuffle=False) for i in range(4)]
    batch = collate(samples)
    # one tile spans all 4 graphs + the padding sentinel (node N-1)
    assert batch.spmm_window == 256
    giant = [rcm_reorder_sample(_ring_sample(n=3000, k=4), min_nodes=1)]
    gb = collate(giant)
    assert gb.spmm_window in (160, 256)  # covers both edge directions
    scattered = [_ring_sample(n=3000, k=4)]
    sb = collate(scattered)
    assert sb.spmm_window == 4096  # only a wide window covers pre-RCM


def test_fused_kernel_pinned_window_matches_reference():
    """Interpret-mode check: a pinned single window produces the same result
    as the cascade (giant RCM graph path)."""
    from jax.experimental.pallas import tpu as pltpu

    import hydragnn_tpu.ops.pallas_spmm as pspmm

    s = rcm_reorder_sample(_ring_sample(n=512, k=3), min_nodes=1)
    ei = s.edge_index
    order = np.argsort(ei[1])
    send = ei[0][order].astype(np.int32)
    recv = ei[1][order].astype(np.int32)
    n = s.num_nodes
    rng = np.random.RandomState(1)
    x = rng.randn(n, 128).astype(np.float32)
    w = np.ones(send.shape[0], np.float32)
    want = np.zeros_like(x)
    np.add.at(want, recv, x[send] * w[:, None])
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            pspmm._spmm_fused_impl(
                jnp.asarray(x), jnp.asarray(send), jnp.asarray(recv),
                jnp.asarray(w), n, row_block=256, edge_tile=256, window=64,
            )
        )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)
