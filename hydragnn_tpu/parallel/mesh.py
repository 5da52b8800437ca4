"""SPMD distribution layer (ref: hydragnn/utils/distributed/distributed.py).

The reference's DDP-over-NCCL (setup_ddp:119, get_distributed_model:332) maps
to: one ``jax.sharding.Mesh`` with a "data" axis, the train step wrapped in
``shard_map`` — each device computes on its local sub-batch, gradients are
``psum``-averaged over ICI (exactly what DDP's bucketed allreduce does, but
fused/scheduled by XLA), optimizer update runs replicated. Multi-host
rendezvous (ref: :140-193 MASTER_ADDR machinery) is
``jax.distributed.initialize``.

Batches for N devices are *stacked*: every array gains a leading device axis
(D, ...) sharded on "data" — the analogue of DistributedSampler giving each
rank its own loader shard (ref: preprocess/load_data.py:256-274).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map
import optax

from hydragnn_tpu.graph import GraphBatch, GraphSample, collate
from hydragnn_tpu.models.arch import ArchConfig
from hydragnn_tpu.train.trainer import TrainState, make_loss_fn


def setup_distributed() -> Tuple[int, int]:
    """Multi-host init (ref: setup_ddp, distributed.py:119-193). Returns
    (world_size, rank) in process units."""
    if os.getenv("JAX_COORDINATOR_ADDRESS") and jax.process_count() == 1:
        jax.distributed.initialize()
    return jax.process_count(), jax.process_index()


def setup_mesh(axis_name: str = "data", devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def collate_stacked(
    shards: Sequence[Sequence[GraphSample]],
    n_node_pad: int,
    n_edge_pad: int,
    n_graph_pad: int,
) -> GraphBatch:
    """Collate per-device sample lists into one stacked GraphBatch [D, ...]."""
    batches = [
        collate(s, n_node_pad, n_edge_pad, n_graph_pad) for s in shards
    ]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *batches)


def shard_batch(stacked: GraphBatch, mesh: Mesh, axis: str = "data") -> GraphBatch:
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding), stacked
    )


def replicate_state(state: Any, mesh: Mesh) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), state)


def make_parallel_train_step(
    model,
    cfg: ArchConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    compute_grad_energy: bool = False,
    axis: str = "data",
):
    """DP train step: per-device forward/backward on the local sub-batch,
    pmean of grads/metrics over the mesh, replicated optimizer update.
    SyncBatchNorm semantics via pmean of the updated running stats
    (ref: distributed.py:344-347)."""
    loss_fn = make_loss_fn(model, cfg, compute_grad_energy)

    def device_fn(state: TrainState, local_batch: GraphBatch, rng):
        local = jax.tree_util.tree_map(lambda a: a[0], local_batch)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        rng = jax.random.fold_in(rng, state.step)
        (loss, (tasks, _, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, local, rng, True)
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        tasks = [jax.lax.pmean(t, axis) for t in tasks]
        new_stats = jax.lax.pmean(new_stats, axis)
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        return new_state, loss, tasks

    smapped = shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(smapped, donate_argnums=(0,))


class ShardedGraphLoader:
    """Loader yielding stacked per-device batches: global_batch_size =
    n_shards * per-device batch (ref: DistributedSampler splits the dataset;
    here we split each global batch round-robin across devices)."""

    def __init__(
        self,
        dataset: Sequence[GraphSample],
        batch_size: int,
        n_shards: int,
        shuffle: bool = False,
        seed: int = 0,
        node_multiple: int = 64,
        edge_multiple: int = 128,
    ):
        from hydragnn_tpu.graph import pad_sizes

        assert batch_size % n_shards == 0, "batch_size must divide by n_shards"
        self.dataset = list(dataset)
        self.batch_size = batch_size
        self.n_shards = n_shards
        self.local_bs = batch_size // n_shards
        self.shuffle = shuffle
        self.seed = seed
        self._epoch = 0
        sizes = sorted(
            ((s.num_nodes, s.num_edges) for s in self.dataset), reverse=True
        )
        top = sizes[: self.local_bs]
        self.n_node_pad, self.n_edge_pad, self.n_graph_pad = pad_sizes(
            sum(t[0] for t in top),
            sum(max(t[1], 1) for t in top),
            self.local_bs,
            node_multiple,
            edge_multiple,
        )

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def __len__(self):
        return len(self.dataset) // self.batch_size

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            rng.shuffle(order)
        nb = len(order) // self.batch_size
        for i in range(nb):
            chunk = order[i * self.batch_size : (i + 1) * self.batch_size]
            shards = [
                [self.dataset[j] for j in chunk[k :: self.n_shards]]
                for k in range(self.n_shards)
            ]
            yield collate_stacked(
                shards, self.n_node_pad, self.n_edge_pad, self.n_graph_pad
            )
