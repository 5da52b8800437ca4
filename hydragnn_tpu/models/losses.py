"""Multi-task losses as pure functions (ref: hydragnn/models/Base.py:572-686).

The reference gathers per-head targets out of a concatenated ``data.y`` with
dynamic ``head_index`` maps; here collate already laid targets out densely in
``batch.graph_y`` / ``batch.node_y`` (head-declaration order), so loss slicing
is static. All reductions are mask-weighted (padding excluded) — identical to
the reference's unpadded means.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from hydragnn_tpu.graph import GraphBatch
from hydragnn_tpu.models.arch import ArchConfig
from hydragnn_tpu.models.layers import masked_loss_function_selection


def normalized_task_weights(cfg: ArchConfig) -> Tuple[float, ...]:
    s = sum(abs(w) for w in cfg.task_weights)
    return tuple(w / s for w in cfg.task_weights)


def head_targets(cfg: ArchConfig, batch: GraphBatch) -> List[jnp.ndarray]:
    """Slice per-head target arrays in head order."""
    out = []
    goff = noff = 0
    for d, t in zip(cfg.output_dim, cfg.output_type):
        if t == "graph":
            out.append(batch.graph_y[:, goff : goff + d])
            goff += d
        else:
            out.append(batch.node_y[:, noff : noff + d])
            noff += d
    return out


def head_masks(cfg: ArchConfig, batch: GraphBatch) -> List[jnp.ndarray]:
    return [
        batch.graph_mask if t == "graph" else batch.node_mask
        for t in cfg.output_type
    ]


def loss_hpweighted(
    cfg: ArchConfig,
    pred: Sequence[jnp.ndarray],
    batch: GraphBatch,
    var: Optional[Sequence[jnp.ndarray]] = None,
):
    """Weighted multi-task loss (ref: Base.loss_hpweighted:659-686)."""
    loss_fn = masked_loss_function_selection(cfg.loss_function_type)
    weights = normalized_task_weights(cfg)
    targets = head_targets(cfg, batch)
    masks = head_masks(cfg, batch)
    tot = 0.0
    tasks = []
    for ihead in range(cfg.num_heads):
        p, t, m = pred[ihead], targets[ihead], masks[ihead]
        if var is None:
            l = loss_fn(p, t, m)
        else:
            l = loss_fn(p, t, m, var[ihead])
        tot = tot + l * weights[ihead]
        tasks.append(l)
    return tot, tasks


def compute_loss(cfg: ArchConfig, pred, batch: GraphBatch):
    """ref: Base.loss:572-580."""
    var = None
    if cfg.var_output:
        pred, var = pred
    return loss_hpweighted(cfg, pred, batch, var=var)


def energy_force_loss(
    cfg: ArchConfig,
    node_energy_pred: jnp.ndarray,
    forces_pred: jnp.ndarray,
    batch: GraphBatch,
):
    """ref: Base.energy_force_loss:582-636. ``forces_pred`` is computed by the
    trainer as -grad(E_total, pos) via jax.grad (the functional analogue of
    torch.autograd.grad with create_graph=True)."""
    from hydragnn_tpu.ops.segment import segment_sum

    loss_fn = masked_loss_function_selection(cfg.loss_function_type)
    G = batch.num_graphs
    graph_energy_pred = segment_sum(
        node_energy_pred[:, 0] * batch.node_mask.astype(node_energy_pred.dtype),
        batch.node_graph_idx,
        G,
    )
    graph_energy_true = batch.energy
    w_e = normalized_task_weights(cfg)[0]
    e_loss = loss_fn(graph_energy_pred, graph_energy_true, batch.graph_mask)
    tot = e_loss * w_e
    gm = batch.graph_mask.astype(jnp.float32)
    nm = batch.node_mask.astype(jnp.float32)
    mean_abs_e = jnp.sum(jnp.abs(graph_energy_true) * gm) / jnp.maximum(
        jnp.sum(gm), 1.0
    )
    mean_abs_f = jnp.sum(jnp.abs(batch.forces) * nm[:, None]) / jnp.maximum(
        jnp.sum(nm) * 3.0, 1.0
    )
    w_f = w_e * mean_abs_e / (mean_abs_f + 1e-8)
    f_loss = loss_fn(forces_pred, batch.forces, batch.node_mask)
    tot = tot + f_loss * w_f
    return tot, [e_loss]
