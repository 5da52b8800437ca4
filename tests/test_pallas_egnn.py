"""Fused slotted EGNN edge-chain kernel vs XLA reference (interpret mode).

Covers forward equality, full custom-VJP gradients (data + weights), the
padded-hidden path (H not a multiple of 128), bf16, and padding-edge
exclusion semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hydragnn_tpu.ops.pallas_egnn import (
    egnn_edge_fused,
    egnn_edge_reference,
)


@pytest.fixture(autouse=True)
def _interpret():
    from jax.experimental.pallas import tpu as pltpu

    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def _workload(G=4, S=16, Eg=128, H=64, GD=1, frac_pad=0.0, seed=0):
    """Slotted layout: graph g owns nodes [g*S, (g+1)*S) and edges
    [g*Eg, (g+1)*Eg); the last graph slot is the padding graph; padding
    edges point at node N-1."""
    rng = np.random.RandomState(seed)
    N, E = G * S, G * Eg
    senders = np.empty(E, np.int32)
    receivers = np.empty(E, np.int32)
    real_edge = np.ones(E, bool)
    for g in range(G - 1):  # last slot = padding graph
        lo = g * Eg
        n_pad = int(frac_pad * Eg)
        n_real = Eg - n_pad
        senders[lo : lo + n_real] = g * S + rng.randint(0, S, n_real)
        receivers[lo : lo + n_real] = g * S + rng.randint(0, S, n_real)
        senders[lo + n_real : lo + Eg] = N - 1
        receivers[lo + n_real : lo + Eg] = N - 1
        real_edge[lo + n_real : lo + Eg] = False
    senders[(G - 1) * Eg :] = N - 1
    receivers[(G - 1) * Eg :] = N - 1
    real_edge[(G - 1) * Eg :] = False

    pre_s = rng.randn(N, H).astype(np.float32)
    pre_d = rng.randn(N, H).astype(np.float32)
    geom = rng.randn(E, GD).astype(np.float32)
    geom[~real_edge] = 0.0
    w1 = (rng.randn(H, H) / np.sqrt(H)).astype(np.float32)
    b1 = (0.1 * rng.randn(H)).astype(np.float32)
    wg = rng.randn(GD, H).astype(np.float32)
    node_real = np.zeros(N, bool)
    node_real[: (G - 1) * S] = True
    return (pre_s, pre_d, geom, w1, b1, wg, senders, receivers,
            real_edge, node_real)


def _reference_masked(pre_s, pre_d, geom, w1, b1, wg, senders, receivers,
                      real_edge, N):
    """Reference over REAL edges only (the kernel excludes padding edges
    from real blocks by one-hot construction)."""
    sel = np.nonzero(real_edge)[0]
    return egnn_edge_reference(
        pre_s, pre_d, geom[sel], w1, b1, wg, senders[sel], receivers[sel], N
    )


def test_forward_matches_reference_no_padding():
    (pre_s, pre_d, geom, w1, b1, wg, s, r, real_edge, node_real) = _workload()
    N = pre_s.shape[0]
    out = egnn_edge_fused(
        jnp.asarray(pre_s), jnp.asarray(pre_d), jnp.asarray(geom),
        jnp.asarray(w1), jnp.asarray(b1), jnp.asarray(wg),
        jnp.asarray(s), jnp.asarray(r), node_slot=16, edge_slot=128,
    )
    ref = _reference_masked(pre_s, pre_d, geom, w1, b1, wg, s, r,
                            real_edge, N)
    np.testing.assert_allclose(
        np.asarray(out)[node_real], np.asarray(ref)[node_real],
        rtol=1e-5, atol=1e-5,
    )


def test_forward_with_padding_edges_and_unaligned_hidden():
    (pre_s, pre_d, geom, w1, b1, wg, s, r, real_edge, node_real) = _workload(
        G=5, S=16, Eg=128, H=72, frac_pad=0.3, seed=3
    )
    N = pre_s.shape[0]
    out = egnn_edge_fused(
        jnp.asarray(pre_s), jnp.asarray(pre_d), jnp.asarray(geom),
        jnp.asarray(w1), jnp.asarray(b1), jnp.asarray(wg),
        jnp.asarray(s), jnp.asarray(r), node_slot=16, edge_slot=128,
    )
    ref = _reference_masked(pre_s, pre_d, geom, w1, b1, wg, s, r,
                            real_edge, N)
    np.testing.assert_allclose(
        np.asarray(out)[node_real], np.asarray(ref)[node_real],
        rtol=1e-5, atol=1e-5,
    )


def test_edge_tile_subdivision():
    (pre_s, pre_d, geom, w1, b1, wg, s, r, real_edge, node_real) = _workload(
        G=3, S=16, Eg=256, H=64, frac_pad=0.1, seed=5
    )
    N = pre_s.shape[0]
    out = egnn_edge_fused(
        jnp.asarray(pre_s), jnp.asarray(pre_d), jnp.asarray(geom),
        jnp.asarray(w1), jnp.asarray(b1), jnp.asarray(wg),
        jnp.asarray(s), jnp.asarray(r), node_slot=16, edge_slot=256,
        edge_tile=128,
    )
    ref = _reference_masked(pre_s, pre_d, geom, w1, b1, wg, s, r,
                            real_edge, N)
    np.testing.assert_allclose(
        np.asarray(out)[node_real], np.asarray(ref)[node_real],
        rtol=1e-5, atol=1e-5,
    )


def test_gradients_match_reference():
    (pre_s, pre_d, geom, w1, b1, wg, s, r, real_edge, node_real) = _workload(
        G=4, S=16, Eg=128, H=72, GD=2, frac_pad=0.25, seed=7
    )
    N = pre_s.shape[0]
    sj, rj = jnp.asarray(s), jnp.asarray(r)
    # cotangent restricted to real node rows (training always masks)
    ct = np.random.RandomState(11).randn(N, 72).astype(np.float32)
    ct[~node_real] = 0.0
    ctj = jnp.asarray(ct)
    sel = np.nonzero(real_edge)[0]

    def loss_fused(pre_s, pre_d, geom, w1, b1, wg):
        out = egnn_edge_fused(
            pre_s, pre_d, geom, w1, b1, wg, sj, rj,
            node_slot=16, edge_slot=128,
        )
        return jnp.sum(out * ctj)

    def loss_ref(pre_s, pre_d, geom, w1, b1, wg):
        out = egnn_edge_reference(
            pre_s, pre_d, geom[sel], w1, b1, wg,
            jnp.asarray(s[sel]), jnp.asarray(r[sel]), N,
        )
        return jnp.sum(out * ctj)

    args = tuple(jnp.asarray(a) for a in (pre_s, pre_d, geom, w1, b1, wg))
    g_fused = jax.grad(loss_fused, argnums=tuple(range(6)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    names = ["dpre_s", "dpre_d", "dgeom", "dw1", "db1", "dwg"]
    for name, a, b in zip(names, g_fused, g_ref):
        a, b = np.asarray(a), np.asarray(b)
        if name == "dgeom":
            a, b = a[sel], b[sel]
        elif name in ("dpre_s", "dpre_d"):
            a, b = a[node_real], b[node_real]
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4, err_msg=name)


def test_bf16_path():
    (pre_s, pre_d, geom, w1, b1, wg, s, r, real_edge, node_real) = _workload(
        G=3, S=16, Eg=128, H=64, seed=9
    )
    N = pre_s.shape[0]
    cast = lambda a: jnp.asarray(a, jnp.bfloat16)
    out = egnn_edge_fused(
        cast(pre_s), cast(pre_d), cast(geom), cast(w1), cast(b1), cast(wg),
        jnp.asarray(s), jnp.asarray(r), node_slot=16, edge_slot=128,
    )
    assert out.dtype == jnp.bfloat16
    ref = _reference_masked(pre_s, pre_d, geom, w1, b1, wg, s, r,
                            real_edge, N)
    err = np.abs(
        np.asarray(out, np.float32)[node_real] - np.asarray(ref)[node_real]
    )
    denom = np.abs(np.asarray(ref)[node_real]).max()
    assert err.max() / denom < 0.03


def test_egcl_fused_matches_unfused_end_to_end(monkeypatch):
    """Full EGNN model: fused kernel path (forced, interpret mode) equals
    the unfused XLA path — loss and all parameter gradients."""
    from hydragnn_tpu.graph import GraphSample, collate
    from tests.test_models_forward import make_cfg
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.models.losses import compute_loss

    rng = np.random.RandomState(0)
    samples = []
    for _ in range(6):
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
    assert batch.edge_slot == 128

    cfg = make_cfg("EGNN")
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
    flat_r = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_f = jax.tree_util.tree_leaves(g_fused)
    for (path, a), b in zip(flat_r, flat_f):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_run_training_egnn_uses_edge_slot(tmp_path, monkeypatch):
    """run_training auto-enables the slotted collate for EGNN and the
    fused kernel path (forced on under interpret mode) trains end-to-end
    with finite metrics."""
    import os

    import hydragnn_tpu as hg
    from hydragnn_tpu.config import load_config
    from hydragnn_tpu.data.synthetic import deterministic_graph_data

    raw = str(tmp_path / "raw")
    deterministic_graph_data(raw, number_configurations=30, seed=9)
    config = load_config(
        os.path.join(os.path.dirname(__file__), "inputs", "ci.json")
    )
    config["NeuralNetwork"]["Architecture"]["mpnn_type"] = "EGNN"
    config["NeuralNetwork"]["Training"]["num_epoch"] = 2
    config["NeuralNetwork"]["Training"]["EarlyStopping"] = False
    config["NeuralNetwork"]["Training"]["Checkpoint"] = False
    config["Dataset"]["path"] = {"total": raw}

    monkeypatch.setenv("HYDRAGNN_FUSED_EGNN", "1")
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        model, cfg, full_cfg, state, results = hg.run_training(config)
    finally:
        os.chdir(cwd)
    assert np.isfinite(results["test_rmse"][0])


def test_force_training_uses_fused_second_order(monkeypatch):
    """Energy-force training (grad-of-grad) on a SLOTTED batch traces the
    FUSED path end-to-end: the edge-chain kernel's backward is itself a
    custom-VJP op with a second-order kernel (ops/pallas_egnn._bwd2_kernel),
    and the trainer's two-pass force-loss structure keeps the outer grad in
    reverse mode throughout. Loss + grads must be finite."""
    from hydragnn_tpu.graph import GraphSample, collate
    from hydragnn_tpu.models.arch import ArchConfig, BranchConfig
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.train.optimizer import select_optimizer
    from hydragnn_tpu.train.trainer import init_state, make_loss_fn

    monkeypatch.setenv("HYDRAGNN_FUSED_EGNN", "1")
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
            energy=np.float32(rng.randn()),
            forces=rng.randn(n, 3).astype(np.float32),
        ))
    batch = collate(samples, node_slot=16, edge_slot=128)
    cfg = ArchConfig(
        mpnn_type="EGNN", input_dim=1, hidden_dim=16, output_dim=(1,),
        output_type=("node",), graph_branches=(),
        node_branches=(
            BranchConfig("branch-0", 0, 0, 2, (16, 16),
                         head_nn_type="mlp"),
        ),
        num_conv_layers=2, num_nodes=8, max_neighbours=4,
    )
    model = create_model(cfg)
    opt = select_optimizer(
        {"Optimizer": {"type": "AdamW", "learning_rate": 1e-3}}
    )
    state = init_state(model, batch, opt)
    loss_fn = make_loss_fn(model, cfg, compute_grad_energy=True)
    (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, state.batch_stats, batch, jax.random.PRNGKey(0), True
    )
    assert np.isfinite(float(l))
    assert all(
        np.all(np.isfinite(np.asarray(x)))
        for x in jax.tree_util.tree_leaves(g)
    )


@pytest.mark.parametrize("H", [64, 40])
def test_second_order_grad_of_grad_matches_reference(H):
    """Energy-force-training structure: inner grad w.r.t. geom (the
    pos-dependent input), outer grad of a force-MSE w.r.t. everything else.
    The fused path must reproduce XLA's reverse-over-reverse exactly
    (ReLU gates a.e.-constant on both sides)."""
    (pre_s, pre_d, geom, w1, b1, wg, senders, receivers,
     real_edge, node_real) = _workload(G=3, S=16, Eg=128, H=H, GD=1,
                                       frac_pad=0.25, seed=5)
    N = pre_s.shape[0]
    S, Eg = 16, 128
    rng = np.random.RandomState(7)
    w_down = rng.randn(N, H).astype(np.float32) * node_real[:, None]
    f_tgt = rng.randn(*geom.shape).astype(np.float32)

    def make_fns(use_fused):
        def energy(geom_, ps, pd, w1_, b1_, wg_):
            if use_fused:
                agg = egnn_edge_fused(
                    ps, pd, geom_, w1_, b1_, wg_,
                    jnp.asarray(senders), jnp.asarray(receivers), S, Eg,
                )
            else:
                agg = egnn_edge_reference(
                    ps, pd, geom_, w1_, b1_, wg_,
                    jnp.asarray(senders), jnp.asarray(receivers), N,
                )
            return jnp.sum(agg * w_down)

        def loss(ps, pd, w1_, b1_, wg_):
            force = jax.grad(energy, argnums=0)(geom, ps, pd, w1_, b1_, wg_)
            return jnp.sum((force - f_tgt) ** 2) + energy(
                geom, ps, pd, w1_, b1_, wg_
            )

        return energy, loss

    outs = {}
    for name, use_fused in (("ref", False), ("fused", True)):
        energy, loss = make_fns(use_fused)
        inner = jax.grad(energy, argnums=0)(geom, pre_s, pre_d, w1, b1, wg)
        val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))(
            pre_s, pre_d, w1, b1, wg
        )
        outs[name] = (np.asarray(inner), float(val),
                      [np.asarray(g) for g in grads])

    np.testing.assert_allclose(
        outs["fused"][0], outs["ref"][0], rtol=2e-5, atol=2e-5,
        err_msg="inner (force) grad mismatch",
    )
    np.testing.assert_allclose(outs["fused"][1], outs["ref"][1], rtol=2e-5)
    for i, arg in enumerate(["pre_s", "pre_d", "w1", "b1", "wg"]):
        np.testing.assert_allclose(
            outs["fused"][2][i], outs["ref"][2][i], rtol=5e-5, atol=5e-5,
            err_msg=f"outer grad mismatch for {arg}",
        )


def test_second_order_rechunked_tile():
    """At H=512/Eg=512 the second-order kernel's VMEM model picks a SMALLER
    edge tile than the fwd/bwd pair (scale_edge_tile n_live=12), so the
    bwd2 call must re-chunk the prepared id arrays (_rechunk_ids). Checks
    grad-of-grad equality through that path."""
    from hydragnn_tpu.ops.pallas_egnn import scale_edge_tile

    H, Eg, G, S = 512, 512, 2, 8
    # precondition: the tile model really does split at this shape
    assert scale_edge_tile(512, 512, 4, 12) < scale_edge_tile(512, 512, 4, 6)

    (pre_s, pre_d, geom, w1, b1, wg, senders, receivers,
     real_edge, node_real) = _workload(G=G, S=S, Eg=Eg, H=H, GD=1,
                                       frac_pad=0.3, seed=9)
    N = pre_s.shape[0]
    rng = np.random.RandomState(4)
    w_down = (rng.randn(N, H).astype(np.float32) * node_real[:, None])

    def loss_of(params, use_fused):
        w1_, b1_, wg_ = params

        def energy(geom_):
            if use_fused:
                agg = egnn_edge_fused(
                    pre_s, pre_d, geom_, w1_, b1_, wg_,
                    jnp.asarray(senders), jnp.asarray(receivers), S, Eg,
                )
            else:
                agg = egnn_edge_reference(
                    pre_s, pre_d, geom_, w1_, b1_, wg_,
                    jnp.asarray(senders), jnp.asarray(receivers), N,
                )
            return jnp.sum(agg * w_down)

        force = jax.grad(energy)(geom)
        return jnp.sum(force ** 2)

    outs = {}
    for name, fused in (("ref", False), ("fused", True)):
        val, grads = jax.value_and_grad(loss_of)((w1, b1, wg), fused)
        outs[name] = (float(val), [np.asarray(g) for g in grads])
    np.testing.assert_allclose(outs["fused"][0], outs["ref"][0], rtol=1e-4)
    for i, nm in enumerate(["w1", "b1", "wg"]):
        # larger workload: fp32 accumulation-order differences reach ~0.2%
        # relative on O(1e3) entries — shape-scaled tolerance
        np.testing.assert_allclose(
            outs["fused"][1][i], outs["ref"][1][i], rtol=5e-3, atol=1e-3,
            err_msg=f"grad mismatch for {nm}",
        )
