"""Fused slotted PAINN message kernel vs XLA reference (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hydragnn_tpu.ops.pallas_painn import (
    painn_message_fused,
    painn_message_reference,
)


@pytest.fixture(autouse=True)
def _interpret():
    from jax.experimental.pallas import tpu as pltpu

    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def _workload(G=4, S=16, Eg=128, F=72, NR=20, frac_pad=0.2, seed=0):
    rng = np.random.RandomState(seed)
    N, E = G * S, G * Eg
    senders = np.full(E, N - 1, np.int32)
    receivers = np.full(E, N - 1, np.int32)
    real_edge = np.zeros(E, bool)
    for g in range(G - 1):
        lo = g * Eg
        n_real = Eg - int(frac_pad * Eg)
        senders[lo : lo + n_real] = g * S + rng.randint(0, S, n_real)
        receivers[lo : lo + n_real] = g * S + rng.randint(0, S, n_real)
        real_edge[lo : lo + n_real] = True

    h = rng.randn(N, 3 * F).astype(np.float32)
    v = rng.randn(N, 3, F).astype(np.float32)
    rbf = rng.rand(E, NR).astype(np.float32)
    cut = rng.rand(E).astype(np.float32)
    cut[~real_edge] = 0.0
    diffn = rng.randn(E, 3).astype(np.float32)
    diffn[~real_edge] = 0.0
    wf = (rng.randn(NR, 3 * F) / np.sqrt(NR)).astype(np.float32)
    bf = (0.1 * rng.randn(3 * F)).astype(np.float32)
    node_real = np.zeros(N, bool)
    node_real[: (G - 1) * S] = True
    return (h, v, rbf, cut, diffn, wf, bf, senders, receivers,
            real_edge, node_real)


@pytest.mark.parametrize("F", [64, 72])
def test_forward_matches_reference(F):
    (h, v, rbf, cut, diffn, wf, bf, s, r, real, node_real) = _workload(F=F)
    N = h.shape[0]
    res_s, res_v = painn_message_fused(
        jnp.asarray(h), jnp.asarray(v), jnp.asarray(rbf), jnp.asarray(cut),
        jnp.asarray(diffn), jnp.asarray(wf), jnp.asarray(bf),
        jnp.asarray(s), jnp.asarray(r), node_slot=16, edge_slot=128,
    )
    ref_s, ref_v = painn_message_reference(
        h, v, rbf, cut, diffn, wf, bf, s, r, N
    )
    np.testing.assert_allclose(
        np.asarray(res_s)[node_real], np.asarray(ref_s)[node_real],
        rtol=2e-5, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(res_v)[node_real], np.asarray(ref_v)[node_real],
        rtol=2e-5, atol=2e-5,
    )


def test_gradients_match_reference():
    """Full custom-VJP: grads w.r.t. every differentiable input match XLA."""
    (h, v, rbf, cut, diffn, wf, bf, s, r, real, node_real) = _workload(
        G=3, S=16, Eg=128, F=64, frac_pad=0.3, seed=5
    )
    N = h.shape[0]
    rng = np.random.RandomState(9)
    ws = rng.randn(N, 64).astype(np.float32) * node_real[:, None]
    wv = rng.randn(N, 3, 64).astype(np.float32) * node_real[:, None, None]

    def loss(args, use_fused):
        h_, v_, rbf_, cut_, diffn_, wf_, bf_ = args
        if use_fused:
            rs, rv = painn_message_fused(
                h_, v_, rbf_, cut_, diffn_, wf_, bf_,
                jnp.asarray(s), jnp.asarray(r), 16, 128,
            )
        else:
            rs, rv = painn_message_reference(
                h_, v_, rbf_, cut_, diffn_, wf_, bf_,
                jnp.asarray(s), jnp.asarray(r), N,
            )
        return jnp.sum(rs * ws) + jnp.sum(rv * wv)

    args = tuple(jnp.asarray(a) for a in (h, v, rbf, cut, diffn, wf, bf))
    names = ["h", "v", "rbf", "cut", "diffn", "wf", "bf"]
    val_f, g_f = jax.value_and_grad(loss)(args, True)
    val_r, g_r = jax.value_and_grad(loss)(args, False)
    np.testing.assert_allclose(float(val_f), float(val_r), rtol=2e-5)
    for nm, gf, gr in zip(names, g_f, g_r):
        gf, gr = np.asarray(gf), np.asarray(gr)
        if nm in ("rbf", "cut", "diffn"):
            # padding-edge cotangents may differ (excluded by one-hot in
            # the fused kernel, present-but-multiplied-by-zero in the ref)
            gf, gr = gf[real], gr[real]
        np.testing.assert_allclose(
            gf, gr, rtol=5e-5, atol=5e-5, err_msg=f"grad mismatch for {nm}"
        )


def test_painn_model_fused_matches_unfused(monkeypatch):
    """Model-level: PainnConv forward + grads identical between the fused
    (slotted, HYDRAGNN_FUSED_EGNN=1) and unfused paths."""
    from hydragnn_tpu.graph import GraphSample, collate
    from hydragnn_tpu.models.arch import ArchConfig, BranchConfig
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.train.optimizer import select_optimizer
    from hydragnn_tpu.train.trainer import init_state, make_loss_fn

    rng = np.random.RandomState(0)
    samples = []
    for _ in range(3):
        n, e = 8, 24
        samples.append(GraphSample(
            x=rng.randn(n, 1).astype(np.float32),
            pos=rng.randn(n, 3).astype(np.float32),
            edge_index=np.stack([
                rng.randint(0, n, e), rng.randint(0, n, e)
            ]).astype(np.int64),
            y_graph=rng.randn(1).astype(np.float32),
        ))
    batch = collate(samples, node_slot=16, edge_slot=128)
    cfg = ArchConfig(
        mpnn_type="PAINN", input_dim=1, hidden_dim=16, output_dim=(1,),
        output_type=("graph",),
        graph_branches=(BranchConfig("branch-0", 2, 16, 2, (16, 16)),),
        node_branches=(), num_conv_layers=2, num_nodes=8,
        max_neighbours=4, radius=4.0, num_radial=6,
    )
    model = create_model(cfg)
    opt = select_optimizer(
        {"Optimizer": {"type": "AdamW", "learning_rate": 1e-3}}
    )
    state = init_state(model, batch, opt)
    loss_fn = make_loss_fn(model, cfg, compute_grad_energy=False)

    out = {}
    for name, flag in (("unfused", "0"), ("fused", "1")):
        monkeypatch.setenv("HYDRAGNN_FUSED_EGNN", flag)
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, jax.random.PRNGKey(0),
            True,
        )
        out[name] = (float(loss), jax.tree_util.tree_map(np.asarray, grads))

    np.testing.assert_allclose(out["fused"][0], out["unfused"][0], rtol=1e-5)
    flat_u = jax.tree_util.tree_leaves_with_path(out["unfused"][1])
    flat_f = jax.tree_util.tree_leaves(out["fused"][1])
    for (path, gu), gf in zip(flat_u, flat_f):
        np.testing.assert_allclose(
            gf, gu, rtol=2e-4, atol=1e-6,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_second_order_grad_of_grad_matches_reference():
    """Force-training structure for the PaiNN message: inner grad w.r.t.
    (rbf, cut, diffn) — the pos-dependent inputs — outer grad of a
    force-MSE w.r.t. (h, v, wf, bf). Pure bilinear gating: the fused
    second-order kernel must match XLA's reverse-over-reverse."""
    (h, v, rbf, cut, diffn, wf, bf, s, r, real, node_real) = _workload(
        G=3, S=16, Eg=128, F=64, frac_pad=0.3, seed=7
    )
    N = h.shape[0]
    rng = np.random.RandomState(2)
    ws = rng.randn(N, 64).astype(np.float32) * node_real[:, None]
    wv = rng.randn(N, 3, 64).astype(np.float32) * node_real[:, None, None]
    tg = [rng.randn(*a.shape).astype(np.float32) for a in (rbf, cut, diffn)]
    em = jnp.asarray(real)

    def energy(rbf_, cut_, diffn_, h_, v_, wf_, bf_, fused):
        if fused:
            rs, rv = painn_message_fused(
                h_, v_, rbf_, cut_, diffn_, wf_, bf_,
                jnp.asarray(s), jnp.asarray(r), 16, 128,
            )
        else:
            rs, rv = painn_message_reference(
                h_, v_, rbf_, cut_, diffn_, wf_, bf_,
                jnp.asarray(s), jnp.asarray(r), N,
            )
        rs = rs * jnp.asarray(node_real)[:, None]
        rv = rv * jnp.asarray(node_real)[:, None, None]
        return jnp.sum(rs * ws) + jnp.sum(rv * wv)

    def loss(h_, v_, wf_, bf_, fused):
        g1, g2, g3 = jax.grad(energy, argnums=(0, 1, 2))(
            jnp.asarray(rbf), jnp.asarray(cut), jnp.asarray(diffn),
            h_, v_, wf_, bf_, fused,
        )
        # padding-edge cotangents differ by construction; mask them out
        return (
            jnp.sum(jnp.where(em[:, None], (g1 - tg[0]) ** 2, 0.0))
            + jnp.sum(jnp.where(em, (g2 - tg[1]) ** 2, 0.0))
            + jnp.sum(jnp.where(em[:, None], (g3 - tg[2]) ** 2, 0.0))
            + energy(jnp.asarray(rbf), jnp.asarray(cut),
                     jnp.asarray(diffn), h_, v_, wf_, bf_, fused)
        )

    args = tuple(jnp.asarray(a) for a in (h, v, wf, bf))
    outs = {}
    for name, fused in (("ref", False), ("fused", True)):
        val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
            *args, fused
        )
        outs[name] = (float(val), [np.asarray(g) for g in grads])
    np.testing.assert_allclose(outs["fused"][0], outs["ref"][0], rtol=5e-5)
    for i, nm in enumerate(["h", "v", "wf", "bf"]):
        np.testing.assert_allclose(
            outs["fused"][1][i], outs["ref"][1][i], rtol=2e-4, atol=2e-4,
            err_msg=f"outer grad mismatch for {nm}",
        )
