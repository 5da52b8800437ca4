"""Edge-slotted batches are receiver-sorted only WITHIN each graph slot, not
globally (padding edges at each slot tail point at node N-1). Aggregations
that take the sorted fast path (Pallas CSR kernel / XLA sorted-scatter hint)
on such a batch silently mis-sum — exactly the path force training runs
(trainer wraps the trace in fused_kernels_disabled, so the UNFUSED conv path
executes on the slotted layout). Regression coverage for:

  - GraphBatch.edges_receiver_sorted / edge_perm_by_receiver invariants,
  - ops.segment.segment_sum routing respecting the unsorted flag
    (TPU-interpret, forced CSR-kernel eligibility),
  - SchNet + EGNN energy-force loss AND gradients identical between the
    edge-slotted and the plain receiver-sorted collate (CPU numerics).
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "examples", "LennardJones")
)
from lennard_jones import make_dataset  # noqa: E402

from hydragnn_tpu.config import update_config
from hydragnn_tpu.data.dataloader import split_dataset
from hydragnn_tpu.graph import collate
from hydragnn_tpu.models.arch import arch_config_from_dict
from hydragnn_tpu.models.create import create_model
from hydragnn_tpu.train.optimizer import select_optimizer
from hydragnn_tpu.train.trainer import init_state, make_loss_fn
from hydragnn_tpu.ops import segment as segment_mod


def _lj_samples(n=6, seed=11):
    return make_dataset(n_configs=n, uc=2, seed=seed)


def _slot_sizes(samples):
    node_slot = -(-max(s.num_nodes for s in samples) // 8) * 8
    edge_slot = -(-max(s.num_edges for s in samples) // 128) * 128
    return node_slot, edge_slot


def test_edge_slot_batch_invariants():
    samples = _lj_samples()
    node_slot, edge_slot = _slot_sizes(samples)

    plain = collate(samples)
    assert plain.edges_receiver_sorted is True
    assert plain.edge_perm_by_receiver is None
    r = np.asarray(plain.receivers)
    assert (np.diff(r) >= 0).all()

    slotted = collate(samples, node_slot=node_slot, edge_slot=edge_slot)
    assert slotted.edges_receiver_sorted is False
    r = np.asarray(slotted.receivers)
    assert not (np.diff(r) >= 0).all(), (
        "slot layout happened to be globally sorted; workload too small"
    )
    perm = np.asarray(slotted.edge_perm_by_receiver)
    assert (np.diff(r[perm]) >= 0).all(), "perm_by_receiver must sort receivers"

    unsorted = collate(samples, sort_edges_by_receiver=False)
    assert unsorted.edges_receiver_sorted is False
    assert unsorted.edge_perm_by_receiver is not None


def test_segment_sum_routing_respects_unsorted_receivers(monkeypatch):
    """With the CSR kernel force-eligible (backend spoofed to TPU, interpret
    mode), ops.segment.segment_sum must bypass the sorted path whenever the
    batch says receivers are unsorted — and the sorted path really does
    mis-sum on the slotted layout (teeth check)."""
    from jax.experimental.pallas import tpu as pltpu

    samples = _lj_samples()
    node_slot, edge_slot = _slot_sizes(samples)
    batch = collate(samples, node_slot=node_slot, edge_slot=edge_slot)
    E, N = batch.num_edges, batch.num_nodes
    rng = np.random.RandomState(0)
    msg = (
        rng.randn(E, 128).astype(np.float32)
        * np.asarray(batch.edge_mask)[:, None]
    )
    ref = jax.ops.segment_sum(
        jnp.asarray(msg), batch.receivers, N, indices_are_sorted=False
    )

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    with pltpu.force_tpu_interpret_mode():
        good = segment_mod.segment_sum(
            jnp.asarray(msg), batch.receivers, N,
            indices_are_sorted=batch.edges_receiver_sorted,
        )
        np.testing.assert_allclose(good, ref, rtol=1e-5, atol=1e-5)

    # teeth: the sorted CSR kernel really does mis-sum on unsorted receivers
    # (the slot layout itself is only FLAKILY wrong — its non-monotone values
    # are the N-1 sentinels, so the error depends on where binary search
    # lands — so the demonstration uses a deterministically unsorted id set)
    rngu = np.random.RandomState(1)
    Nu, Eu = 4096, 8192
    ru = rngu.randint(0, Nu, Eu).astype(np.int32)
    mu = rngu.randn(Eu, 128).astype(np.float32)
    ref_u = jax.ops.segment_sum(
        jnp.asarray(mu), jnp.asarray(ru), Nu, indices_are_sorted=False
    )
    with pltpu.force_tpu_interpret_mode():
        bad = segment_mod.segment_sum(
            jnp.asarray(mu), jnp.asarray(ru), Nu, indices_are_sorted=True
        )
    assert not np.allclose(bad, ref_u, rtol=1e-3, atol=1e-3), (
        "sorted CSR path unexpectedly correct on unsorted receivers — "
        "this test lost its teeth"
    )


def _force_config(mpnn_type):
    return {
        "Verbosity": {"level": 0},
        "NeuralNetwork": {
            "Architecture": {
                "mpnn_type": mpnn_type,
                "radius": 4.0,
                "max_neighbours": 64,
                "hidden_dim": 16,
                "num_conv_layers": 2,
                "num_gaussians": 16,
                "num_filters": 16,
                "num_radial": 6,
                "envelope_exponent": 5,
                "output_heads": {
                    "node": {"num_headlayers": 2, "dim_headlayers": [16, 16],
                             "type": "mlp"}
                },
                "task_weights": [1.0],
            },
            "Variables_of_interest": {
                "input_node_features": [0],
                "output_names": ["energy"],
                "output_index": [0],
                "type": ["node"],
                "output_dim": [1],
                "denormalize_output": False,
            },
            "Training": {
                "num_epoch": 1,
                "perc_train": 0.8,
                "compute_grad_energy": True,
                "batch_size": 4,
                "Optimizer": {"type": "AdamW", "learning_rate": 0.005},
            },
        },
    }


@pytest.mark.parametrize("mpnn_type", ["SchNet", "EGNN"])
def test_force_grads_slotted_matches_plain(mpnn_type):
    """Energy-force loss + parameter gradients must not depend on the collate
    layout: the edge-slotted batch (what run_training auto-enables for
    SchNet/EGNN) and the plain receiver-sorted batch are the same graphs."""
    samples = _lj_samples()
    config = _force_config(mpnn_type)
    train, val, test = split_dataset(samples, 0.8)
    config = update_config(config, train, val, test)
    cfg = arch_config_from_dict(config["NeuralNetwork"])
    model = create_model(cfg)

    node_slot, edge_slot = _slot_sizes(samples)
    plain = collate(samples[:4])
    slotted = collate(samples[:4], node_slot=node_slot, edge_slot=edge_slot)

    opt = select_optimizer(config["NeuralNetwork"]["Training"])
    state = init_state(model, plain, opt)
    loss_fn = make_loss_fn(model, cfg, compute_grad_energy=True)

    out = {}
    for name, b in (("plain", plain), ("slotted", slotted)):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, b, jax.random.PRNGKey(0), True
        )
        out[name] = (float(loss), grads)

    np.testing.assert_allclose(
        out["plain"][0], out["slotted"][0], rtol=1e-5,
        err_msg="loss differs between collate layouts",
    )
    flat_p = jax.tree_util.tree_leaves_with_path(out["plain"][1])
    flat_s = jax.tree_util.tree_leaves(out["slotted"][1])
    for (path, gp), gs in zip(flat_p, flat_s):
        np.testing.assert_allclose(
            gp, gs, rtol=2e-4, atol=1e-6,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_auto_slots_shared_across_splits():
    """edge_slot='auto' must resolve ONCE from the union of splits so all
    three loaders emit identical padded shapes (one compile per step fn),
    even when the largest graph lives only in one split."""
    from hydragnn_tpu.data.dataloader import create_dataloaders

    samples = _lj_samples(n=9, seed=4)
    # make the splits size-skewed: drop atoms from some samples
    for i, s in enumerate(samples[3:], start=3):
        k = max(2, s.num_nodes - 3 * i)
        keep = np.arange(k)
        m = np.isin(s.edge_index[0], keep) & np.isin(s.edge_index[1], keep)
        s.x = s.x[:k]
        s.pos = s.pos[:k]
        s.edge_index = s.edge_index[:, m]
        if s.edge_shifts is not None:
            s.edge_shifts = s.edge_shifts[m]
        if s.y_node is not None:
            s.y_node = s.y_node[:k]
        if s.forces is not None:
            s.forces = s.forces[:k]
    tr, va, te = samples[:3], samples[3:6], samples[6:]
    loaders = create_dataloaders(tr, va, te, batch_size=3, prefetch=False,
                                 edge_slot="auto")
    slots = {(ld.node_slot, ld.edge_slot) for ld in loaders}
    assert len(slots) == 1, f"per-split slot sizes differ: {slots}"
    node_slot, edge_slot = slots.pop()
    assert node_slot >= max(s.num_nodes for s in samples)
    assert edge_slot >= max(s.num_edges for s in samples)


@pytest.mark.parametrize("mpnn_type", ["SchNet", "EGNN", "PAINN"])
def test_fused_second_order_force_grads_match_unfused(mpnn_type, monkeypatch):
    """Model-level second-order equality: energy-force loss AND parameter
    gradients from the FUSED kernels (second-order custom VJPs, interpret
    mode) match the unfused XLA path on the same slotted batch."""
    from jax.experimental.pallas import tpu as pltpu

    samples = _lj_samples(n=5, seed=2)
    config = _force_config(mpnn_type)
    train, val, test = split_dataset(samples, 0.8)
    config = update_config(config, train, val, test)
    cfg = arch_config_from_dict(config["NeuralNetwork"])
    model = create_model(cfg)

    node_slot, edge_slot = _slot_sizes(samples)
    batch = collate(samples[:3], node_slot=node_slot, edge_slot=edge_slot)
    opt = select_optimizer(config["NeuralNetwork"]["Training"])
    state = init_state(model, batch, opt)
    loss_fn = make_loss_fn(model, cfg, compute_grad_energy=True)

    out = {}
    for name, flag in (("unfused", "0"), ("fused", "1")):
        monkeypatch.setenv("HYDRAGNN_FUSED_EGNN", flag)
        with pltpu.force_tpu_interpret_mode():
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, batch,
                jax.random.PRNGKey(0), True,
            )
            grads = jax.tree_util.tree_map(np.asarray, grads)
        out[name] = (float(loss), grads)

    np.testing.assert_allclose(out["fused"][0], out["unfused"][0], rtol=1e-5)
    flat_u = jax.tree_util.tree_leaves_with_path(out["unfused"][1])
    flat_f = jax.tree_util.tree_leaves(out["fused"][1])
    for (path, gu), gf in zip(flat_u, flat_f):
        np.testing.assert_allclose(
            gf, gu, rtol=5e-4, atol=1e-6,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )
