"""Slotted collate + dense block-diagonal adjacency SpMM."""

import numpy as np
import jax
import jax.numpy as jnp

from hydragnn_tpu.graph import GraphSample, collate
from hydragnn_tpu.ops.segment import (
    adjacency_spmm, gather_scatter_sum, segment_sum,
)


def _samples(G=5, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for g in range(G):
        n = rng.randint(4, 11)
        e = rng.randint(3, 4 * n)
        ei = rng.randint(0, n, (2, e))
        out.append(GraphSample(
            x=rng.randn(n, 8).astype(np.float32),
            pos=rng.randn(n, 3).astype(np.float32),
            edge_index=ei,
            y_graph=rng.randn(2).astype(np.float32),
        ))
    return out


def test_slotted_collate_layout():
    samples = _samples()
    S = 16
    b = collate(samples, node_slot=S, dense_adjacency=True)
    Gp = b.num_graphs
    assert b.num_nodes == Gp * S
    assert b.adjacency.shape == (Gp, S, S)
    # nodes of graph g live at rows [g*S, g*S + n_g)
    for g, s in enumerate(samples):
        rows = np.asarray(b.x[g * S : g * S + s.num_nodes])
        np.testing.assert_array_equal(rows, s.x)
        assert bool(np.all(np.asarray(b.node_mask[g * S : g * S + s.num_nodes])))
        assert not np.any(
            np.asarray(b.node_mask[g * S + s.num_nodes : (g + 1) * S])
        )
    # node_graph_idx stays sorted (segment-op contract)
    gi = np.asarray(b.node_graph_idx)
    assert np.all(np.diff(gi) >= 0)
    # adjacency row sums = in-degree
    for g, s in enumerate(samples):
        deg = np.zeros(S)
        np.add.at(deg, s.edge_index[1], 1.0)
        np.testing.assert_array_equal(
            np.asarray(b.adjacency[g]).sum(axis=1), deg
        )


def test_adjacency_spmm_equals_segment_sum():
    samples = _samples(seed=1)
    b = collate(samples, node_slot=16, dense_adjacency=True)
    x = jnp.asarray(
        np.random.RandomState(2).randn(b.num_nodes, 8).astype(np.float32)
    )
    want = gather_scatter_sum(
        x, b.senders, b.receivers, b.num_nodes, edge_mask=b.edge_mask,
    )
    got = adjacency_spmm(b.adjacency, x)
    # padding-node rows of `got` may receive slot-local noise only if A has
    # entries there — it cannot (A built from real edges) — so compare all
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_adjacency_spmm_grad_matches():
    samples = _samples(seed=3)
    b = collate(samples, node_slot=16, dense_adjacency=True)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(b.num_nodes, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(b.num_nodes, 8).astype(np.float32))

    def loss_dense(v):
        return jnp.sum(adjacency_spmm(b.adjacency, v) * w)

    def loss_ref(v):
        msgs = v[b.senders] * b.edge_mask[:, None].astype(v.dtype)
        return jnp.sum(
            jax.ops.segment_sum(msgs, b.receivers, b.num_nodes) * w
        )

    np.testing.assert_allclose(
        float(loss_dense(x)), float(loss_ref(x)), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_dense)(x)),
        np.asarray(jax.grad(loss_ref)(x)),
        rtol=1e-4, atol=1e-4,
    )


def test_training_with_dense_adjacency():
    """End-to-end: GIN on slotted batches with adjacency routing."""
    from hydragnn_tpu.data.dataloader import create_dataloaders
    from hydragnn_tpu.models.arch import ArchConfig, BranchConfig
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.train.optimizer import select_optimizer
    from hydragnn_tpu.train.trainer import init_state, make_train_step

    rng = np.random.RandomState(5)
    ds = []
    for _ in range(24):
        n = rng.randint(5, 12)
        ei = np.stack([np.arange(n), np.roll(np.arange(n), 1)])
        x = rng.rand(n, 1).astype(np.float32)
        ds.append(GraphSample(
            x=x, pos=rng.randn(n, 3).astype(np.float32), edge_index=ei,
            y_graph=np.asarray([x.sum()], np.float32),
        ))
    loaders = create_dataloaders(ds[:16], ds[16:20], ds[20:], batch_size=8,
                                 dense_adjacency=True, prefetch=False)
    b0 = next(iter(loaders[0]))
    assert b0.adjacency is not None
    cfg = ArchConfig(
        mpnn_type="GIN", input_dim=1, hidden_dim=16, output_dim=(1,),
        output_type=("graph",),
        graph_branches=(BranchConfig("branch-0", 1, 16, 1, (16,)),),
        node_branches=(), num_conv_layers=2, num_nodes=12,
        max_neighbours=2, radius=2.0,
    )
    model = create_model(cfg)
    opt = select_optimizer({"Optimizer": {"type": "AdamW",
                                          "learning_rate": 1e-2}})
    state = init_state(model, b0, opt)
    step = make_train_step(model, cfg, opt)
    k = jax.random.PRNGKey(0)
    losses = []
    for ep in range(6):
        loaders[0].set_epoch(ep)
        for b in loaders[0]:
            state, loss, _ = step(state, b, k)
            losses.append(float(loss))
    assert losses[-1] < losses[0]

def test_gat_dense_attention_matches_edgewise():
    """Slotted dense GATv2 attention == edgewise path on the same params,
    including duplicate edges (multiplicity > 1) and real self-loops."""
    from hydragnn_tpu.models.gat import GATv2Conv

    rng = np.random.RandomState(7)
    samples = []
    for g in range(6):
        n = int(rng.randint(4, 12))
        e = 4 * n
        ei = rng.randint(0, n, (2, e))
        ei[:, 0] = ei[1, 0]  # force one self-loop
        ei[:, 1] = ei[:, 2]  # force one duplicate edge
        samples.append(GraphSample(
            x=rng.randn(n, 5).astype(np.float32),
            pos=rng.randn(n, 3).astype(np.float32),
            edge_index=ei,
            y_graph=rng.randn(1).astype(np.float32),
        ))
    b = collate(samples, node_slot=16, dense_adjacency=True)
    x = jnp.asarray(rng.randn(b.num_nodes, 5).astype(np.float32))
    equiv = jnp.zeros((b.num_nodes, 0), np.float32)

    conv = GATv2Conv(5, 8, heads=3, concat=True)
    v = conv.init(jax.random.PRNGKey(0), x, equiv, b, {}, train=False)
    o_dense, _ = conv.apply(v, x, equiv, b, {}, train=False)
    o_edge, _ = conv.apply(
        v, x, equiv, b.replace(adjacency=None), {}, train=False
    )
    m = np.asarray(b.node_mask)
    np.testing.assert_allclose(
        np.asarray(o_dense)[m], np.asarray(o_edge)[m], rtol=2e-5, atol=2e-5
    )


def test_pna_dense_aggregation_matches_edgewise():
    """PNA's message is pair-factored (h_ij = pre_d[i] + pre_s[j]), so the
    dense-adjacency route computes all four aggregators (mean/min/max/std)
    + degree scalers in closed form over [G, S, S] — must equal the
    edgewise masked segment ops, loss AND grads (models/pna.py)."""
    import numpy as np
    import jax

    from hydragnn_tpu.graph import GraphSample, collate
    from hydragnn_tpu.models.arch import ArchConfig, BranchConfig
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.train.optimizer import select_optimizer
    from hydragnn_tpu.train.trainer import init_state, make_loss_fn

    rng = np.random.RandomState(3)
    samples = []
    for i in range(4):
        n = 5 + i * 3
        e = 3 * n
        samples.append(GraphSample(
            x=rng.randn(n, 1).astype(np.float32),
            pos=rng.randn(n, 3).astype(np.float32),
            edge_index=np.stack([
                rng.randint(0, n, e), rng.randint(0, n, e)
            ]).astype(np.int64),
            y_graph=rng.randn(1).astype(np.float32),
        ))
    # duplicate one edge to exercise multiplicity > 1
    s0 = samples[0]
    s0.edge_index = np.concatenate(
        [s0.edge_index, s0.edge_index[:, :2]], axis=1
    )

    cfg = ArchConfig(
        mpnn_type="PNA", input_dim=1, hidden_dim=16, output_dim=(1,),
        output_type=("graph",),
        graph_branches=(BranchConfig("branch-0", 2, 16, 2, (16, 16)),),
        node_branches=(), num_conv_layers=2, num_nodes=14,
        max_neighbours=8, pna_deg=(0, 2, 3, 4, 3, 2, 1, 1),
    )
    model = create_model(cfg)
    plain = collate(samples)
    dense = collate(samples, node_slot=16, dense_adjacency=True)
    assert dense.adjacency is not None
    opt = select_optimizer(
        {"Optimizer": {"type": "AdamW", "learning_rate": 1e-3}}
    )
    state = init_state(model, plain, opt)
    loss_fn = make_loss_fn(model, cfg, compute_grad_energy=False)

    out = {}
    for name, b in (("edgewise", plain), ("dense", dense)):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, b, jax.random.PRNGKey(0), True
        )
        out[name] = (float(loss), jax.tree_util.tree_map(np.asarray, grads))

    np.testing.assert_allclose(
        out["dense"][0], out["edgewise"][0], rtol=1e-5
    )
    flat_e = jax.tree_util.tree_leaves_with_path(out["edgewise"][1])
    flat_d = jax.tree_util.tree_leaves(out["dense"][1])
    for (path, ge), gd in zip(flat_e, flat_d):
        np.testing.assert_allclose(
            gd, ge, rtol=3e-4, atol=1e-6,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )
