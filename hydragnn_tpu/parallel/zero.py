"""Optimizer-state sharding — the DeepSpeed ZeRO-1 / ZeroRedundancyOptimizer
equivalent (ref: hydragnn/run_training.py:118-155;
utils/optimizer/optimizer.py:43-101).

TPU-native: optimizer-state arrays are laid out with their first dimension
sharded over the mesh ("zero" = the data axis) via sharding constraints inside
the jitted step — XLA partitions the optimizer update and inserts the
reduce-scatter/all-gather pattern that ZeRO performs by hand. Parameters stay
replicated (ZeRO stage 1). Arrays whose first dim doesn't divide by the mesh
size stay replicated (they're small).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import optax

from hydragnn_tpu.graph import GraphBatch
from hydragnn_tpu.models.arch import ArchConfig
from hydragnn_tpu.train.trainer import TrainState, make_loss_fn


def _opt_state_sharding(opt_state: Any, mesh: Mesh, axis: str) -> Any:
    n_dev = mesh.devices.size

    def spec(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] % n_dev == 0 \
                and leaf.shape[0] >= n_dev:
            return NamedSharding(mesh, P(axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, opt_state)


def shard_state_zero(state: TrainState, mesh: Mesh, axis: str = "data"):
    """Place params/batch_stats replicated, optimizer state sharded."""
    repl = NamedSharding(mesh, P())
    params = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, repl), state.params
    )
    stats = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, repl), state.batch_stats
    )
    shardings = _opt_state_sharding(state.opt_state, mesh, axis)
    opt_state = jax.tree_util.tree_map(
        lambda a, s: jax.device_put(a, s), state.opt_state, shardings
    )
    return state.replace(
        params=params, batch_stats=stats, opt_state=opt_state,
        step=jax.device_put(state.step, repl),
    )


def make_zero_train_step(
    model,
    cfg: ArchConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    compute_grad_energy: bool = False,
    axis: str = "data",
):
    """DP train step over stacked per-device batches with ZeRO-1 optimizer
    sharding: grads are psum-averaged (handled by GSPMD from the sharded
    batch), the optimizer update runs on sharded state slices."""
    loss_fn = make_loss_fn(model, cfg, compute_grad_energy)
    repl = NamedSharding(mesh, P())

    def train_step(state: TrainState, batch: GraphBatch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (loss, (tasks, _, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, rng, True)
        shardings = _opt_state_sharding(state.opt_state, mesh, axis)
        opt_state = jax.lax.with_sharding_constraint(
            state.opt_state, shardings
        )
        updates, new_opt_state = optimizer.update(
            grads, opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        return (
            state.replace(
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt_state,
                step=state.step + 1,
            ),
            loss,
            tasks,
        )

    return jax.jit(train_step, donate_argnums=(0,))
