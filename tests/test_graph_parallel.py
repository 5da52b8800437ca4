"""Edge/node-partitioned graph parallelism: numerical equality with the
single-device computation on an 8-virtual-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hydragnn_tpu.graph import GraphSample, collate
from hydragnn_tpu.models.arch import ArchConfig, BranchConfig
from hydragnn_tpu.models.create import create_model
from hydragnn_tpu.parallel.mesh import setup_mesh
from hydragnn_tpu.parallel.graph_parallel import (
    make_graph_parallel_train_step,
    make_partitioned_spmm,
    shard_graph_batch,
)
from hydragnn_tpu.train.optimizer import select_optimizer
from hydragnn_tpu.train.trainer import init_state, make_train_step


def big_batch(seed=0, n_graphs=8, n=32, deg=6):
    rng = np.random.RandomState(seed)
    samples = []
    for _ in range(n_graphs):
        senders, receivers = [], []
        for i in range(n):
            nb = rng.choice([j for j in range(n) if j != i], deg, replace=False)
            senders.extend(nb)
            receivers.extend([i] * deg)
        samples.append(
            GraphSample(
                x=rng.randn(n, 1).astype(np.float32),
                pos=rng.randn(n, 3).astype(np.float32),
                edge_index=np.stack([senders, receivers]),
                y_graph=rng.randn(1).astype(np.float32),
            )
        )
    return collate(samples, n_node_pad=512, n_edge_pad=4096)


def test_partitioned_spmm_matches_dense():
    mesh = setup_mesh("graph", jax.devices()[:8])
    batch = big_batch()
    N, E, D = batch.num_nodes, batch.num_edges, 8
    block = N // D
    x = jnp.asarray(np.random.RandomState(1).randn(N, 8).astype(np.float32))

    want = jax.ops.segment_sum(
        (x[batch.senders]
         * batch.edge_mask[:, None].astype(x.dtype)),
        batch.receivers, N, indices_are_sorted=True,
    )

    # local receiver ids + locality mask per partition
    part = np.asarray(batch.receivers) // block
    # receivers sorted ascending -> edges are already grouped by partition;
    # but partition boundaries may not align to E/D. Re-pad edges per shard.
    senders_g = np.full((D, E // D), N - 1, np.int64)
    recv_l = np.full((D, E // D), block - 1, np.int64)
    mask = np.zeros((D, E // D), bool)
    fill = np.zeros(D, int)
    for e in range(E):
        if not np.asarray(batch.edge_mask)[e]:
            continue  # inert padding slots are prefilled
        p = part[e]
        k = fill[p]
        assert k < E // D, "edge imbalance exceeds padding in this test"
        senders_g[p, k] = np.asarray(batch.senders)[e]
        recv_l[p, k] = np.asarray(batch.receivers)[e] - p * block
        mask[p, k] = bool(np.asarray(batch.edge_mask)[e])
        fill[p] += 1
    is_local = (senders_g // block) == np.arange(D)[:, None]
    # masked-out (padding) edges must contribute zero: route them through the
    # remote path with sender = last node (zero features)
    senders_flat = np.where(mask, senders_g, N - 1).reshape(-1)
    is_local_flat = (np.where(mask, is_local, False)).reshape(-1)
    recv_flat = recv_l.reshape(-1)

    spmm = make_partitioned_spmm(mesh, n_local=block)
    out = spmm(
        x,
        jnp.asarray(senders_flat),
        jnp.asarray(recv_flat),
        jnp.asarray(is_local_flat),
        jnp.asarray(mask.reshape(-1)),
    )
    # out rows are per-partition blocks stacked = global order
    got = np.asarray(out)
    # padding-edge receivers were pointed at each block's last row; real
    # receivers there are only in the final block's padding area
    want_np = np.asarray(want)
    m = np.asarray(batch.node_mask)
    np.testing.assert_allclose(got[m], want_np[m], rtol=1e-5, atol=1e-5)


def test_graph_parallel_step_matches_single_device():
    mesh = setup_mesh("graph", jax.devices()[:8])
    batch = big_batch()
    cfg = ArchConfig(
        mpnn_type="GIN",
        input_dim=1,
        hidden_dim=8,
        output_dim=(1,),
        output_type=("graph",),
        graph_branches=(BranchConfig("branch-0", 1, 8, 1, (8,)),),
        node_branches=(),
        num_conv_layers=2,
        num_nodes=32,
    )
    model = create_model(cfg)
    # SGD: parameter delta is linear in the gradient, so cross-scheme
    # reduction-order noise stays at fp32 scale (Adam would amplify noise on
    # near-zero gradients to O(lr))
    opt = select_optimizer({"Optimizer": {"type": "SGD",
                                          "learning_rate": 0.01}})
    state = init_state(model, batch, opt)
    state2 = jax.device_get(state)

    step_single = make_train_step(model, cfg, opt)
    s1, loss1, _ = step_single(state, batch, jax.random.PRNGKey(0))

    sharded = shard_graph_batch(batch, mesh)
    step_gp = make_graph_parallel_train_step(model, cfg, opt, mesh,
                                             donate=False)
    s2, loss2, _ = step_gp(state2, sharded, jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    p1 = jax.tree_util.tree_leaves(s1.params)
    p2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )

def test_ring_attention_matches_dense():
    """Ring-rotated K/V attention over 8 node shards == dense per-graph
    masked attention, with graphs straddling shard boundaries."""
    from functools import partial

    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    from hydragnn_tpu.parallel.ring_attention import ring_masked_attention

    rng = np.random.RandomState(0)
    N, H, Dh = 256, 2, 8  # 8 shards x 32 nodes; graphs of 48 straddle
    sizes = [48, 48, 48, 48, 40, 24]
    gi = np.concatenate([np.full(s, g) for g, s in enumerate(sizes)])
    valid = np.ones(N, bool)
    valid[gi.shape[0]:] = False
    gi = np.concatenate([gi, np.full(N - gi.shape[0], len(sizes))])
    q = rng.randn(N, H, Dh).astype(np.float32)
    k = rng.randn(N, H, Dh).astype(np.float32)
    v = rng.randn(N, H, Dh).astype(np.float32)
    scale = 1.0 / Dh**0.5

    mesh = Mesh(np.array(jax.devices()[:8]), ("graph",))
    ring = jax.jit(shard_map(
        partial(ring_masked_attention, axis="graph", scale=scale),
        mesh=mesh,
        in_specs=(P("graph"),) * 5,
        out_specs=P("graph"),
        check_vma=False,
    ))
    out_ring = np.asarray(ring(q, k, v, jnp.asarray(gi), jnp.asarray(valid)))

    # dense reference
    s = np.einsum("qhd,khd->hqk", q, k) * scale
    ok = (gi[:, None] == gi[None, :]) & valid[None, :]
    s = np.where(ok[None], s, np.finfo(np.float32).min)
    p = np.exp(s - s.max(-1, keepdims=True))
    a = p / p.sum(-1, keepdims=True)
    out_ref = np.einsum("hqk,khd->qhd", a, v)

    np.testing.assert_allclose(
        out_ring[valid], out_ref[valid], rtol=2e-5, atol=2e-6
    )


def test_gps_attention_ring_axis_matches_dense():
    """MaskedGraphAttention(ring_axis=...) inside shard_map == the same
    module's dense path on one device."""
    from functools import partial

    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    from hydragnn_tpu.models.gps import MaskedGraphAttention

    batch = big_batch(seed=3)  # 512-node pad = 8 x 64
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(batch.num_nodes, 16).astype(np.float32))

    dense = MaskedGraphAttention(16, 2)
    ringm = MaskedGraphAttention(16, 2, ring_axis="graph")
    var = dense.init(jax.random.PRNGKey(0), x, batch)
    o_dense = dense.apply(var, x, batch)

    mesh = Mesh(np.array(jax.devices()[:8]), ("graph",))

    def fwd(x_, gi_, valid_):
        b = batch.replace(node_graph_idx=gi_, node_mask=valid_)
        return ringm.apply(var, x_, b)

    sharded = jax.jit(shard_map(
        fwd, mesh=mesh, in_specs=(P("graph"),) * 3, out_specs=P("graph"),
        check_vma=False,
    ))
    o_ring = np.asarray(
        sharded(x, batch.node_graph_idx, batch.node_mask)
    )
    np.testing.assert_allclose(
        o_ring, np.asarray(o_dense), rtol=2e-5, atol=2e-6
    )

def _giant_batch(seed=0):
    """Two ~240-node graphs straddling the 8 shards of a 512-row node pad."""
    rng = np.random.RandomState(seed)
    samples = []
    for _ in range(2):
        n = 240
        senders, receivers = [], []
        for i in range(n):
            nb = rng.choice([j for j in range(n) if j != i], 8, replace=False)
            senders.extend(nb)
            receivers.extend([i] * 8)
        samples.append(
            GraphSample(
                x=rng.randn(n, 4).astype(np.float32),
                pos=rng.randn(n, 3).astype(np.float32),
                edge_index=np.stack([senders, receivers]),
                y_graph=rng.randn(1).astype(np.float32),
            )
        )
    return collate(samples, n_node_pad=512, n_edge_pad=4096)


def test_partition_batch_layout():
    from hydragnn_tpu.parallel.halo import partition_batch

    b = _giant_batch()
    pb = partition_batch(b, 8)
    D, B = 8, 64
    Es = pb.num_edges // D
    recv = np.asarray(pb.receivers)
    mask = np.asarray(pb.edge_mask)
    send = np.asarray(pb.senders)
    slot = np.asarray(pb.gp_sender_slot)
    H = pb.gp_halo
    assert np.all(np.diff(recv) >= 0)  # global receiver order preserved
    for d in range(D):
        sh = slice(d * Es, (d + 1) * Es)
        assert np.all(recv[sh] // B == d)  # every edge owned by its shard
        # local slots point at the true sender row
        loc = mask[sh] & (slot[sh] < B)
        np.testing.assert_array_equal(
            slot[sh][loc], send[sh][loc] - d * B
        )
        # remote slots decode through gp_send_idx
        rem = mask[sh] & (slot[sh] >= B)
        o = (slot[sh][rem] - B) // H
        pos = (slot[sh][rem] - B) % H
        rows = np.asarray(pb.gp_send_idx)[o, d, pos] + o * B
        np.testing.assert_array_equal(rows, send[sh][rem])
    # masked (padding) edges contribute weight 0 and stay in-shard
    assert not np.any(mask[np.asarray(pb.edge_mask) == False])  # noqa: E712


def test_halo_spmm_matches_global():
    from jax.sharding import Mesh

    from hydragnn_tpu.parallel.halo import make_halo_spmm, partition_batch

    b = _giant_batch(seed=1)
    pb = partition_batch(b, 8)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(pb.num_nodes, 8).astype(np.float32))

    mesh = Mesh(np.array(jax.devices()[:8]), ("graph",))
    halo = make_halo_spmm(mesh)
    got = np.asarray(halo(x, pb))
    want = np.asarray(jax.ops.segment_sum(
        x[pb.senders] * pb.edge_mask[:, None].astype(x.dtype),
        pb.receivers, pb.num_nodes, indices_are_sorted=True,
    ))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_halo_spmm_gradients_match():
    from jax.sharding import Mesh

    from hydragnn_tpu.parallel.halo import make_halo_spmm, partition_batch

    b = _giant_batch(seed=3)
    pb = partition_batch(b, 8)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(pb.num_nodes, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(pb.num_nodes, 8).astype(np.float32))

    mesh = Mesh(np.array(jax.devices()[:8]), ("graph",))
    halo = make_halo_spmm(mesh)

    g_halo = jax.grad(lambda v: jnp.sum(halo(v, pb) * w))(x)
    g_ref = jax.grad(lambda v: jnp.sum(jax.ops.segment_sum(
        v[pb.senders] * pb.edge_mask[:, None].astype(v.dtype),
        pb.receivers, pb.num_nodes, indices_are_sorted=True,
    ) * w))(x)
    np.testing.assert_allclose(
        np.asarray(g_halo), np.asarray(g_ref), rtol=1e-5, atol=1e-5
    )

def test_graph_parallel_halo_step_matches_single_device():
    """Full GIN train step with conv aggregations routed through the halo
    all_to_all island (enable_halo_exchange) == single-device step, on a
    halo-partitioned giant-graph batch."""
    from hydragnn_tpu.parallel import context
    from hydragnn_tpu.parallel.halo import partition_batch

    mesh = setup_mesh("graph", jax.devices()[:8])
    batch = partition_batch(_giant_batch(seed=7), 8)
    assert batch.gp is not None
    cfg = ArchConfig(
        mpnn_type="GIN",
        input_dim=4,
        hidden_dim=8,
        output_dim=(1,),
        output_type=("graph",),
        graph_branches=(BranchConfig("branch-0", 1, 8, 1, (8,)),),
        node_branches=(),
        num_conv_layers=2,
        num_nodes=240,
    )
    model = create_model(cfg)
    opt = select_optimizer({"Optimizer": {"type": "SGD",
                                          "learning_rate": 0.01}})
    state = init_state(model, batch, opt)
    state2 = jax.device_get(state)

    step_single = make_train_step(model, cfg, opt)
    s1, loss1, _ = step_single(state, batch, jax.random.PRNGKey(0))

    sharded = shard_graph_batch(batch, mesh)
    context.enable_halo_exchange(mesh, "graph")
    try:
        step_gp = make_graph_parallel_train_step(model, cfg, opt, mesh,
                                                 donate=False)
        s2, loss2, _ = step_gp(state2, sharded, jax.random.PRNGKey(0))
        np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    finally:
        context.disable_halo_exchange()
    p1 = jax.tree_util.tree_leaves(s1.params)
    p2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )
