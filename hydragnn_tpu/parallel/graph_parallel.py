"""Graph (edge/node-partitioned) parallelism within a batch.

The reference has no equivalent (its graphs are small; DP suffices —
SURVEY.md §2.2). This is the designed TPU-native extension: partition a
batch's nodes and edges across chips and let XLA route the boundary-node
feature exchange over ICI.

Two layers:

1. **GSPMD path** (this module's default): jit the unchanged model/train step
   with sharding annotations — node arrays and edge arrays sharded on a
   "graph" mesh axis, parameters replicated. XLA inserts the all-gathers for
   cross-partition ``x[senders]`` gathers and the psum for replicated
   gradients (the "annotate shardings, let the compiler insert collectives"
   recipe). Zero model changes.

2. **Explicit shard_map SpMM** (``partitioned_spmm``): the hand-scheduled
   building block — all_gather of the local node block overlapped with
   aggregation of partition-local edges, then the remote contribution is
   added. Used to tune the hot path when the GSPMD schedule is suboptimal.

Requires node/edge pad sizes divisible by the mesh size (collate multiples of
64/128 cover the common cases; pass explicit pads otherwise).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map
import optax

from hydragnn_tpu.graph import GraphBatch
from hydragnn_tpu.models.arch import ArchConfig
from hydragnn_tpu.train.trainer import TrainState, make_loss_fn


# fields sharded along their leading (node or edge) dimension
_NODE_FIELDS = ("x", "pos", "node_graph_idx", "node_mask", "node_y", "forces",
                "pe")
_EDGE_FIELDS = ("senders", "receivers", "edge_mask", "edge_shifts",
                "edge_attr", "rel_pe", "edge_perm_by_sender",
                "edge_perm_by_sender_inv", "gp_sender_slot",
                # [D, D, H]: leading dim is the shard axis
                "gp_send_idx")


def batch_shardings(mesh: Mesh, batch: GraphBatch, axis: str = "graph"):
    """NamedSharding pytree matching the batch structure."""
    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def spec(path, leaf):
        name = path[-1].name if path else ""
        if name in _NODE_FIELDS or name in _EDGE_FIELDS:
            return shard
        return repl

    return jax.tree_util.tree_map_with_path(spec, batch)


def shard_graph_batch(
    batch: GraphBatch, mesh: Mesh, axis: str = "graph"
) -> GraphBatch:
    n_dev = mesh.devices.size
    assert batch.num_nodes % n_dev == 0, (
        f"node pad {batch.num_nodes} must divide by mesh size {n_dev}"
    )
    assert batch.num_edges % n_dev == 0, (
        f"edge pad {batch.num_edges} must divide by mesh size {n_dev}"
    )
    shardings = batch_shardings(mesh, batch, axis)
    return jax.tree_util.tree_map(
        lambda a, s: jax.device_put(a, s), batch, shardings
    )


def make_graph_parallel_train_step(
    model,
    cfg: ArchConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    compute_grad_energy: bool = False,
    axis: str = "graph",
    donate: bool = True,
):
    """jit the standard train step with graph-parallel input shardings."""
    loss_fn = make_loss_fn(model, cfg, compute_grad_energy)
    repl = NamedSharding(mesh, P())

    def train_step(state: TrainState, batch: GraphBatch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (loss, (tasks, _, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, rng, True)
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
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

    return jax.jit(
        train_step,
        donate_argnums=(0,) if donate else (),
        out_shardings=(repl, repl, repl),
    )


def partitioned_spmm(
    x_local: jnp.ndarray,  # [N/D, F] this device's node block
    senders: jnp.ndarray,  # [E/D] GLOBAL sender ids of local edges
    receivers_local: jnp.ndarray,  # [E/D] LOCAL receiver ids (sorted)
    edge_is_local: jnp.ndarray,  # [E/D] sender lives in this block
    edge_valid: jnp.ndarray,  # [E/D] real (non-padding) edge
    n_local: int,
    axis: str = "graph",
) -> jnp.ndarray:
    """Explicit overlapped boundary exchange inside shard_map.

    Local-sender edges aggregate from the resident block immediately; the ICI
    all_gather for remote senders runs concurrently (XLA schedules the
    collective async against the local segment_sum), then remote
    contributions are added.
    """
    D = jax.lax.axis_size(axis)
    block = x_local.shape[0]
    my = jax.lax.axis_index(axis)
    local_ids = senders - my * block

    # start the gather first so it overlaps with local work
    x_full = jax.lax.all_gather(x_local, axis, tiled=True)  # [N, F]

    safe_local = jnp.clip(local_ids, 0, block - 1)
    w_local = (edge_is_local & edge_valid)[:, None].astype(x_local.dtype)
    msgs_local = x_local[safe_local] * w_local
    out = jax.ops.segment_sum(
        msgs_local, receivers_local, n_local, indices_are_sorted=True
    )

    w_remote = ((~edge_is_local) & edge_valid)[:, None].astype(x_local.dtype)
    msgs_remote = x_full[senders] * w_remote
    out = out + jax.ops.segment_sum(
        msgs_remote, receivers_local, n_local, indices_are_sorted=True
    )
    return out


def make_partitioned_spmm(mesh: Mesh, n_local: int, axis: str = "graph"):
    return jax.jit(
        shard_map(
            partial(partitioned_spmm, n_local=n_local, axis=axis),
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
            out_specs=P(axis),
            check_vma=False,
        )
    )
