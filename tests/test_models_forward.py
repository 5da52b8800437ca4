import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hydragnn_tpu.graph import GraphSample, collate
from hydragnn_tpu.models.arch import ArchConfig, BranchConfig
from hydragnn_tpu.models.create import create_model


def make_batch(n_graphs=3, n=6, deg=3, in_dim=1, seed=0):
    rng = np.random.RandomState(seed)
    samples = []
    for g in range(n_graphs):
        senders, receivers = [], []
        for i in range(n):
            nb = rng.choice([j for j in range(n) if j != i], deg, replace=False)
            senders.extend(nb)
            receivers.extend([i] * deg)
        samples.append(
            GraphSample(
                x=rng.randn(n, in_dim).astype(np.float32),
                pos=rng.randn(n, 3).astype(np.float32),
                edge_index=np.stack([senders, receivers]),
                y_graph=rng.randn(1).astype(np.float32),
                y_node=rng.randn(n, 1).astype(np.float32),
            )
        )
    return collate(samples)


def make_cfg(mpnn_type, output_type=("graph",), output_dim=(1,), **kw):
    graph_b = (BranchConfig("branch-0", 2, 4, 2, (10, 10)),)
    node_b = (BranchConfig("branch-0", 0, 0, 2, (4, 4), head_nn_type="mlp"),)
    defaults = dict(
        mpnn_type=mpnn_type,
        input_dim=1,
        hidden_dim=8,
        output_dim=tuple(output_dim),
        output_type=tuple(output_type),
        graph_branches=graph_b,
        node_branches=node_b,
        num_conv_layers=2,
        num_nodes=6,
        max_neighbours=10,
    )
    defaults.update(kw)
    return ArchConfig(**defaults)


MODELS = ["GIN", "SAGE", "MFC", "PNA", "CGCNN", "GAT", "SchNet", "EGNN",
          "PNAPlus", "PAINN", "PNAEq", "DimeNet", "MACE"]


def _extra(mpnn_type):
    kw = {}
    if mpnn_type in ("PNA", "PNAPlus", "PNAEq"):
        kw["pna_deg"] = (0, 0, 0, 10)
    if mpnn_type == "CGCNN":
        kw["hidden_dim"] = 1  # dimension-preserving conv
        kw["edge_dim"] = 0
    if mpnn_type in ("SchNet", "PNAPlus", "PNAEq", "PAINN", "DimeNet", "MACE"):
        kw["radius"] = 5.0
        kw["num_radial"] = 5
        kw["envelope_exponent"] = 5
    if mpnn_type == "SchNet":
        kw["num_gaussians"] = 10
        kw["num_filters"] = 8
    if mpnn_type == "DimeNet":
        kw.update(dict(basis_emb_size=8, int_emb_size=16, out_emb_size=16,
                       num_after_skip=2, num_before_skip=1, num_spherical=5,
                       max_neighbours=8))
    if mpnn_type == "MACE":
        kw.update(dict(max_ell=2, node_max_ell=1, avg_num_neighbors=3.0,
                       correlation=(2,)))
    return kw


@pytest.mark.parametrize("mpnn_type", ["SchNet", "EGNN"])
def test_forward_equivariant_coord_update(mpnn_type):
    cfg = make_cfg(mpnn_type, equivariance=True, num_conv_layers=3,
                   **_extra(mpnn_type))
    model = create_model(cfg)
    batch = make_batch()
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = model.apply(variables, batch, train=False)
    assert np.all(np.isfinite(np.asarray(out[0])))


@pytest.mark.parametrize("mpnn_type", MODELS)
def test_forward_graph_head(mpnn_type):
    cfg = make_cfg(mpnn_type, **_extra(mpnn_type))
    model = create_model(cfg)
    batch = make_batch()
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = model.apply(variables, batch, train=False)
    assert len(out) == 1
    assert out[0].shape == (batch.num_graphs, 1)
    assert np.all(np.isfinite(np.asarray(out[0])))


@pytest.mark.parametrize("mpnn_type", MODELS)
def test_forward_multihead(mpnn_type):
    cfg = make_cfg(
        mpnn_type,
        output_type=("graph", "node"),
        output_dim=(1, 1),
        task_weights=(1.0, 1.0),
        **_extra(mpnn_type),
    )
    model = create_model(cfg)
    batch = make_batch()
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = model.apply(variables, batch, train=False)
    assert out[0].shape == (batch.num_graphs, 1)
    assert out[1].shape == (batch.num_nodes, 1)


def test_forward_train_mode_updates_stats():
    cfg = make_cfg("GIN")
    model = create_model(cfg)
    batch = make_batch()
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out, mutated = model.apply(
        variables, batch, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    stats0 = jax.tree_util.tree_leaves(variables["batch_stats"])
    stats1 = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(stats0, stats1)
    )


def test_gps_forward():
    cfg = make_cfg(
        "GIN",
        global_attn_engine="GPS",
        global_attn_type="multihead",
        global_attn_heads=2,
        pe_dim=2,
    )
    model = create_model(cfg)
    rng = np.random.RandomState(0)
    batch = make_batch()
    batch = batch.replace(
        pe=jnp.asarray(rng.randn(batch.num_nodes, 2).astype(np.float32)),
        rel_pe=jnp.asarray(rng.randn(batch.num_edges, 2).astype(np.float32)),
    )
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = model.apply(variables, batch, train=False)
    assert out[0].shape == (batch.num_graphs, 1)
    assert np.all(np.isfinite(np.asarray(out[0])))


def test_gps_performer_forward():
    cfg = make_cfg(
        "GIN",
        global_attn_engine="GPS",
        global_attn_type="performer",
        global_attn_heads=2,
        pe_dim=2,
    )
    model = create_model(cfg)
    rng = np.random.RandomState(0)
    batch = make_batch()
    batch = batch.replace(
        pe=jnp.asarray(rng.randn(batch.num_nodes, 2).astype(np.float32)),
        rel_pe=jnp.asarray(rng.randn(batch.num_edges, 2).astype(np.float32)),
    )
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = model.apply(variables, batch, train=False)
    assert np.all(np.isfinite(np.asarray(out[0])))


def test_padding_invariance():
    """Outputs on real graphs must not depend on padding amount."""
    rng = np.random.RandomState(5)
    n = 6
    senders, receivers = [], []
    for i in range(n):
        nb = rng.choice([j for j in range(n) if j != i], 3, replace=False)
        senders.extend(nb)
        receivers.extend([i] * 3)
    s = GraphSample(
        x=rng.randn(n, 1).astype(np.float32),
        pos=rng.randn(n, 3).astype(np.float32),
        edge_index=np.stack([senders, receivers]),
        y_graph=np.ones(1, np.float32),
    )
    cfg = make_cfg("GIN")
    model = create_model(cfg)
    b1 = collate([s])
    b2 = collate([s], n_node_pad=128, n_edge_pad=256, n_graph_pad=4)
    v = model.init(jax.random.PRNGKey(0), b1, train=False)
    o1 = model.apply(v, b1, train=False)[0]
    o2 = model.apply(v, b2, train=False)[0]
    np.testing.assert_allclose(np.asarray(o1[0]), np.asarray(o2[0]), rtol=1e-5)


def test_flash_attention_matches_dense():
    """Streaming (flash) masked attention == dense masked attention."""
    from hydragnn_tpu.models.gps import MaskedGraphAttention

    rng = np.random.RandomState(0)
    samples = []
    for g in range(16):
        n = 64
        senders, receivers = [], []
        for i in range(n):
            nb = rng.choice([j for j in range(n) if j != i], 3, replace=False)
            senders.extend(nb)
            receivers.extend([i] * 3)
        samples.append(
            GraphSample(
                x=rng.randn(n, 1).astype(np.float32),
                pos=rng.randn(n, 3).astype(np.float32),
                edge_index=np.stack([senders, receivers]),
                y_graph=rng.randn(1).astype(np.float32),
            )
        )
    batch = collate(samples)  # 1088 nodes -> pad 1088? ensure %512
    batch2 = collate(samples, n_node_pad=2048)
    x = jnp.asarray(rng.randn(batch2.num_nodes, 16).astype(np.float32))

    dense = MaskedGraphAttention(16, 2, flash_threshold=10**9)
    flash = MaskedGraphAttention(16, 2, flash_threshold=1, key_block=512)
    v = dense.init(jax.random.PRNGKey(0), x, batch2)
    o_dense = dense.apply(v, x, batch2)
    o_flash = flash.apply(v, x, batch2)
    np.testing.assert_allclose(
        np.asarray(o_dense), np.asarray(o_flash), rtol=2e-4, atol=2e-5
    )


def test_slotted_attention_matches_dense():
    """Per-graph [G, S, S] block attention (node_slot batches) == whole-batch
    dense masked attention on the same parameters and inputs."""
    from hydragnn_tpu.models.gps import MaskedGraphAttention

    rng = np.random.RandomState(3)
    samples = []
    for g in range(8):
        n = int(rng.randint(5, 16))
        ei = np.stack([rng.randint(0, n, 40), rng.randint(0, n, 40)])
        samples.append(
            GraphSample(
                x=rng.randn(n, 1).astype(np.float32),
                pos=rng.randn(n, 3).astype(np.float32),
                edge_index=ei,
                y_graph=rng.randn(1).astype(np.float32),
            )
        )
    b_slot = collate(samples, node_slot=16)
    assert b_slot.node_slot == 16
    x = jnp.asarray(rng.randn(b_slot.num_nodes, 16).astype(np.float32))

    attn = MaskedGraphAttention(16, 2)
    v = attn.init(jax.random.PRNGKey(0), x, b_slot)
    o_slot = attn.apply(v, x, b_slot)
    o_dense = attn.apply(v, x, b_slot.replace(node_slot=None))
    np.testing.assert_allclose(
        np.asarray(o_slot), np.asarray(o_dense), rtol=2e-5, atol=2e-6
    )


def test_performer_approximates_exact_attention():
    """FAVOR+ parity: with many random features and moderate logits the
    Performer output must track exact masked softmax attention closely
    (ROADMAP capability item; ref: torch_geometric PerformerAttention)."""
    from hydragnn_tpu.models.gps import MaskedGraphAttention, PerformerAttention

    rng = np.random.RandomState(1)
    samples = []
    for g in range(4):
        n = 24
        ei = np.stack([rng.randint(0, n, 60), rng.randint(0, n, 60)])
        samples.append(
            GraphSample(
                x=rng.randn(n, 1).astype(np.float32),
                pos=rng.randn(n, 3).astype(np.float32),
                edge_index=ei,
                y_graph=rng.randn(1).astype(np.float32),
            )
        )
    batch = collate(samples)
    # small feature scale keeps softmax logits O(1), where FAVOR+ is accurate
    x = jnp.asarray(0.3 * rng.randn(batch.num_nodes, 16).astype(np.float32))

    exact = MaskedGraphAttention(16, 2)
    perf = PerformerAttention(16, 2, num_features=512)
    v_e = exact.init(jax.random.PRNGKey(0), x, batch)
    v_p = perf.init(jax.random.PRNGKey(7), x, batch)
    # share qkv/out_proj so only the attention operator differs
    v_p = jax.tree_util.tree_map(lambda a: a, v_p)
    from flax.core import unfreeze, freeze

    vp = unfreeze(v_p)
    vp["params"]["qkv"] = v_e["params"]["qkv"]
    vp["params"]["out_proj"] = v_e["params"]["out_proj"]
    v_p = freeze(vp)

    o_e = np.asarray(exact.apply(v_e, x, batch))
    o_p = np.asarray(perf.apply(v_p, x, batch))
    m = np.asarray(batch.node_mask)
    # relative Frobenius error over valid nodes
    err = np.linalg.norm(o_p[m] - o_e[m]) / np.linalg.norm(o_e[m])
    assert err < 0.15, err
    # and elementwise correlation is strong
    c = np.corrcoef(o_p[m].ravel(), o_e[m].ravel())[0, 1]
    assert c > 0.98, c
