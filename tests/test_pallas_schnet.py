"""Fused slotted SchNet CFConv kernel vs XLA reference (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hydragnn_tpu.ops.pallas_schnet import (
    schnet_edge_fused,
    schnet_edge_reference,
)


@pytest.fixture(autouse=True)
def _interpret():
    from jax.experimental.pallas import tpu as pltpu

    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def _workload(G=4, S=16, Eg=128, F=72, NG=16, frac_pad=0.2, seed=0):
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

    x = rng.randn(N, F).astype(np.float32)
    rbf = rng.rand(E, NG).astype(np.float32)
    rbf[~real_edge] = 0.0
    cut = rng.rand(E).astype(np.float32)
    cut[~real_edge] = 0.0
    wg0 = (rng.randn(NG, F) / np.sqrt(NG)).astype(np.float32)
    bg0 = (0.1 * rng.randn(F)).astype(np.float32)
    wg1 = (rng.randn(F, F) / np.sqrt(F)).astype(np.float32)
    bg1 = (0.1 * rng.randn(F)).astype(np.float32)
    node_real = np.zeros(N, bool)
    node_real[: (G - 1) * S] = True
    return (x, rbf, cut, wg0, bg0, wg1, bg1, senders, receivers,
            real_edge, node_real)


def test_forward_matches_reference():
    (x, rbf, cut, wg0, bg0, wg1, bg1, s, r, real, node_real) = _workload()
    N = x.shape[0]
    out = schnet_edge_fused(
        jnp.asarray(x), jnp.asarray(rbf), jnp.asarray(cut),
        jnp.asarray(wg0), jnp.asarray(bg0), jnp.asarray(wg1),
        jnp.asarray(bg1), jnp.asarray(s), jnp.asarray(r),
        node_slot=16, edge_slot=128,
    )
    sel = np.nonzero(real)[0]
    ref = schnet_edge_reference(
        x, rbf[sel], cut[sel], wg0, bg0, wg1, bg1, s[sel], r[sel], N
    )
    np.testing.assert_allclose(
        np.asarray(out)[node_real], np.asarray(ref)[node_real],
        rtol=1e-5, atol=1e-5,
    )


def test_gradients_match_reference():
    (x, rbf, cut, wg0, bg0, wg1, bg1, s, r, real, node_real) = _workload(
        G=4, S=16, Eg=256, F=64, NG=24, seed=3
    )
    N = x.shape[0]
    sel = np.nonzero(real)[0]
    ct = np.random.RandomState(5).randn(N, 64).astype(np.float32)
    ct[~node_real] = 0.0
    ctj = jnp.asarray(ct)
    sj, rj = jnp.asarray(s), jnp.asarray(r)

    def loss_fused(x, rbf, cut, wg0, bg0, wg1, bg1):
        out = schnet_edge_fused(
            x, rbf, cut, wg0, bg0, wg1, bg1, sj, rj,
            node_slot=16, edge_slot=256, edge_tile=128,
        )
        return jnp.sum(out * ctj)

    def loss_ref(x, rbf, cut, wg0, bg0, wg1, bg1):
        out = schnet_edge_reference(
            x, rbf[sel], cut[sel], wg0, bg0, wg1, bg1,
            jnp.asarray(s[sel]), jnp.asarray(r[sel]), N,
        )
        return jnp.sum(out * ctj)

    args = tuple(
        jnp.asarray(a) for a in (x, rbf, cut, wg0, bg0, wg1, bg1)
    )
    gf = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    names = ["dx", "drbf", "dcut", "dwg0", "dbg0", "dwg1", "dbg1"]
    for nm, a, b in zip(names, gf, gr):
        a, b = np.asarray(a), np.asarray(b)
        if nm in ("drbf", "dcut"):
            a, b = a[sel], b[sel]
        elif nm == "dx":
            a, b = a[node_real], b[node_real]
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-4, err_msg=nm)


def test_bf16_path():
    (x, rbf, cut, wg0, bg0, wg1, bg1, s, r, real, node_real) = _workload(
        G=3, S=16, Eg=128, F=64, seed=7
    )
    N = x.shape[0]
    c = lambda a: jnp.asarray(a, jnp.bfloat16)
    out = schnet_edge_fused(
        c(x), c(rbf), c(cut), c(wg0), c(bg0), c(wg1), c(bg1),
        jnp.asarray(s), jnp.asarray(r), node_slot=16, edge_slot=128,
    )
    assert out.dtype == jnp.bfloat16
    sel = np.nonzero(real)[0]
    ref = schnet_edge_reference(
        x, rbf[sel], cut[sel], wg0, bg0, wg1, bg1, s[sel], r[sel], N
    )
    err = np.abs(
        np.asarray(out, np.float32)[node_real] - np.asarray(ref)[node_real]
    )
    assert err.max() / np.abs(np.asarray(ref)[node_real]).max() < 0.04


def test_cfconv_fused_matches_unfused_end_to_end(monkeypatch):
    """Full SchNet model on a slotted batch: fused kernel path equals the
    unfused XLA path — loss and all parameter gradients."""
    from hydragnn_tpu.graph import GraphSample, collate
    from tests.test_models_forward import _extra, make_cfg
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.models.losses import compute_loss

    rng = np.random.RandomState(0)
    samples = []
    for _ in range(5):
        n = rng.randint(8, 17)
        e = n * 4
        samples.append(GraphSample(
            x=rng.randn(n, 1).astype(np.float32),
            pos=rng.randn(n, 3).astype(np.float32),
            edge_index=np.stack([
                rng.randint(0, n, e), rng.randint(0, n, e)
            ]).astype(np.int64),
            y_graph=rng.randn(1).astype(np.float32),
        ))
    batch = collate(samples, node_slot=24, edge_slot=128)

    cfg = make_cfg("SchNet", **_extra("SchNet"))
    model = create_model(cfg)
    params = model.init(jax.random.PRNGKey(0), batch, train=False)["params"]

    def loss_of(p):
        out = model.apply({"params": p}, batch, train=False)
        loss, _ = compute_loss(cfg, out, batch)
        return loss

    monkeypatch.setenv("HYDRAGNN_FUSED_EGNN", "0")
    l_ref, g_ref = jax.value_and_grad(loss_of)(params)
    monkeypatch.setenv("HYDRAGNN_FUSED_EGNN", "1")
    l_fused, g_fused = jax.value_and_grad(loss_of)(params)

    np.testing.assert_allclose(float(l_fused), float(l_ref), rtol=1e-5)
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves(g_fused),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.parametrize("F", [64, 72])
def test_second_order_grad_of_grad_matches_reference(F):
    """Force-training structure for CFConv: rbf/cut are the pos-dependent
    inputs — inner grad w.r.t. them, outer grad of a force-MSE w.r.t. the
    node features and all filter-MLP params. Unlike the EGNN chain the
    nonlinearity (shifted softplus) is smooth, so bg0/bg1 carry genuine
    second-order terms — the fused path must match XLA exactly."""
    (x, rbf, cut, wg0, bg0, wg1, bg1, s, r, real, node_real) = _workload(
        G=3, S=16, Eg=128, F=F, NG=16, frac_pad=0.25, seed=3
    )
    N = x.shape[0]
    rng = np.random.RandomState(11)
    w_down = rng.randn(N, F).astype(np.float32) * node_real[:, None]
    rbf_tgt = rng.randn(*rbf.shape).astype(np.float32)
    cut_tgt = rng.randn(*cut.shape).astype(np.float32)

    def make_fns(use_fused):
        def energy(rbf_, cut_, x_, wg0_, bg0_, wg1_, bg1_):
            if use_fused:
                out = schnet_edge_fused(
                    x_, rbf_, cut_, wg0_, bg0_, wg1_, bg1_,
                    jnp.asarray(s), jnp.asarray(r),
                    node_slot=16, edge_slot=128,
                )
            else:
                out = schnet_edge_reference(
                    x_, rbf_, cut_, wg0_, bg0_, wg1_, bg1_,
                    jnp.asarray(s), jnp.asarray(r), N,
                )
            return jnp.sum(out * w_down)

        def loss(x_, wg0_, bg0_, wg1_, bg1_):
            drbf, dcut = jax.grad(energy, argnums=(0, 1))(
                jnp.asarray(rbf), jnp.asarray(cut), x_, wg0_, bg0_,
                wg1_, bg1_,
            )
            return (
                jnp.sum((drbf - rbf_tgt) ** 2)
                + jnp.sum((dcut - cut_tgt) ** 2)
                + energy(jnp.asarray(rbf), jnp.asarray(cut), x_, wg0_,
                         bg0_, wg1_, bg1_)
            )

        return energy, loss

    outs = {}
    for name, use_fused in (("ref", False), ("fused", True)):
        energy, loss = make_fns(use_fused)
        inner = jax.grad(energy, argnums=(0, 1))(
            jnp.asarray(rbf), jnp.asarray(cut), jnp.asarray(x),
            jnp.asarray(wg0), jnp.asarray(bg0), jnp.asarray(wg1),
            jnp.asarray(bg1),
        )
        val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))(
            jnp.asarray(x), jnp.asarray(wg0), jnp.asarray(bg0),
            jnp.asarray(wg1), jnp.asarray(bg1),
        )
        outs[name] = (
            [np.asarray(g) for g in inner], float(val),
            [np.asarray(g) for g in grads],
        )

    for i, nm in enumerate(["drbf", "dcut"]):
        np.testing.assert_allclose(
            outs["fused"][0][i], outs["ref"][0][i], rtol=2e-5, atol=2e-5,
            err_msg=f"inner grad mismatch for {nm}",
        )
    np.testing.assert_allclose(outs["fused"][1], outs["ref"][1], rtol=2e-5)
    for i, nm in enumerate(["x", "wg0", "bg0", "wg1", "bg1"]):
        np.testing.assert_allclose(
            outs["fused"][2][i], outs["ref"][2][i], rtol=1e-4, atol=1e-4,
            err_msg=f"outer grad mismatch for {nm}",
        )
