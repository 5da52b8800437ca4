"""Multi-dataset / multi-branch (task-parallel) training.

Equivalent of the reference's MultiTaskModelMP + multibranch example
(ref: hydragnn/models/MultiTaskModelMP.py:172-260;
examples/multibranch/train.py:48-517): a shared encoder trained on all
datasets, per-dataset decoder branches.

TPU-native design: instead of two overlapping DDP process groups with manual
gradient averaging (ref: MultiTaskModelMP.average_gradients:12-19), the branch
dispatch is *dense* inside the model (HydraBase computes every branch and
selects by ``dataset_id`` — see models/base.py) and the whole step runs as
one SPMD program. Encoder gradients automatically average over the full mesh;
branch-decoder gradients are zero on graphs of other datasets, so their psum
equals the reference's per-branch-group average up to the deterministic
proportionality factor absorbed into the branch learning rate. Proportional
sampling mirrors the reference's proportional process allocation
(ref: examples/multibranch/train.py:166-276).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

import numpy as np

from hydragnn_tpu.graph import GraphBatch, GraphSample, collate, pad_sizes


def tag_dataset_ids(
    datasets: Sequence[Sequence[GraphSample]],
) -> List[GraphSample]:
    """Label each sample with its dataset/branch id
    (ref: AbstractBaseDataset dataset_name -> tensor ID map,
    utils/datasets/abstractbasedataset.py:44-56)."""
    out = []
    for ds_id, ds in enumerate(datasets):
        for s in ds:
            d = dict(s.__dict__)
            d["dataset_id"] = ds_id
            out.append(GraphSample(**d))
    return out


class MultiDatasetLoader:
    """Yields batches mixing datasets proportionally to their sizes (the
    reference allocates ranks proportionally, ref: multibranch/train.py
    process_list; here graphs-per-batch are allocated proportionally)."""

    def __init__(
        self,
        datasets: Sequence[Sequence[GraphSample]],
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        node_multiple: int = 64,
        edge_multiple: int = 128,
    ):
        self.datasets = [list(d) for d in datasets]
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self._epoch = 0
        sizes = np.array([len(d) for d in self.datasets], float)
        frac = sizes / sizes.sum()
        self.per_ds = np.maximum(
            np.round(frac * batch_size).astype(int), 1
        )
        # fix rounding to match batch_size
        while self.per_ds.sum() > batch_size:
            self.per_ds[np.argmax(self.per_ds)] -= 1
        while self.per_ds.sum() < batch_size:
            self.per_ds[np.argmax(sizes)] += 1

        all_samples = tag_dataset_ids(self.datasets)
        self.tagged = [
            [s for s in all_samples if s.dataset_id == i]
            for i in range(len(self.datasets))
        ]
        worst = sorted(
            ((s.num_nodes, s.num_edges) for s in all_samples), reverse=True
        )[:batch_size]
        self.n_node_pad, self.n_edge_pad, self.n_graph_pad = pad_sizes(
            sum(t[0] for t in worst),
            sum(max(t[1], 1) for t in worst),
            batch_size,
            node_multiple,
            edge_multiple,
        )

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def __len__(self) -> int:
        n_batches = [
            len(d) // k for d, k in zip(self.tagged, self.per_ds) if k > 0
        ]
        return max(min(n_batches), 1)

    def __iter__(self):
        rng = np.random.RandomState(self.seed + self._epoch)
        orders = []
        for d in self.tagged:
            idx = np.arange(len(d))
            if self.shuffle:
                rng.shuffle(idx)
            orders.append(idx)
        for b in range(len(self)):
            chunk = []
            for ds_i, (d, k) in enumerate(zip(self.tagged, self.per_ds)):
                sel = orders[ds_i][b * k : (b + 1) * k]
                chunk.extend(d[j] for j in sel)
            yield collate(
                chunk,
                n_node_pad=self.n_node_pad,
                n_edge_pad=self.n_edge_pad,
                n_graph_pad=self.n_graph_pad,
            )


# ---------------------------------------------------------------------------
# True per-branch device groups (the reference's two overlapping DDP process
# groups — encoder over WORLD, decoder over the branch group,
# ref: MultiTaskModelMP.py:219-220 — as ONE shard_map program over a
# "branch" mesh axis).
# ---------------------------------------------------------------------------

def branch_of_param(path) -> Optional[int]:
    """Branch id encoded in a param path ('head_0_branch-2' -> 2), or None
    for shared (encoder) parameters."""
    for p in path:
        key = getattr(p, "key", None)
        if isinstance(key, str) and "branch-" in key:
            return int(key.split("branch-")[-1].split("_")[0])
    return None


def stack_device_batches(batches: Sequence[GraphBatch]) -> GraphBatch:
    """Stack per-device batches on a new leading axis (shard over 'branch').

    Device d of the mesh processes ``batches[d]``; allocate devices to
    branches proportionally and hand each device its own dataset's batch
    (the reference's proportional process_list, multibranch/train.py:166-214).
    """
    import jax

    return jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *batches
    )


def make_branch_parallel_train_step(
    model,
    cfg,
    optimizer,
    mesh,
    branch_sizes: Sequence[int],
    axis: str = "branch",
):
    """Train step with reference MultiTaskModelMP gradient semantics:

    - encoder gradients average over ALL devices (DDP over WORLD);
    - branch-k decoder gradients average over branch-k's device group only
      (DDP over the branch process group). Devices outside group k see no
      dataset-k graphs, so their branch-k decoder grads are exactly zero and
      ``psum / group_size`` equals the group mean.

    ``branch_sizes[k]`` = devices allocated to branch k (sum = mesh size).
    The batch argument is a ``stack_device_batches`` pytree: leading dim =
    total devices, sharded over ``axis``; device d (in group
    ``branch_of_device[d]``) must carry only that branch's dataset graphs.
    BatchNorm running stats average over WORLD (SyncBatchNorm semantics).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map
    import optax

    from hydragnn_tpu.train.trainer import make_loss_fn

    loss_fn = make_loss_fn(model, cfg, False)
    W = int(sum(branch_sizes))
    factors = {k: W / float(s) for k, s in enumerate(branch_sizes)}

    def scale(grads):
        def f(path, g):
            b = branch_of_param(path)
            return g * factors[b] if b is not None else g

        return jax.tree_util.tree_map_with_path(f, grads)

    def per_device(params, batch_stats, opt_state, step, batch, rng):
        batch = jax.tree_util.tree_map(lambda a: a[0], batch)  # drop dev dim
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        (loss, (tasks, _, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch_stats, batch, rng, True)
        # pmean over WORLD, then re-scale branch params by W / group_size:
        # pmean * W / W_k == psum / W_k == per-group mean (cross-group branch
        # grads are exactly zero). All devices end up with identical grads,
        # so the replicated optimizer update stays consistent.
        grads = scale(jax.lax.pmean(grads, axis))
        loss = jax.lax.pmean(loss, axis)
        tasks = [jax.lax.pmean(t, axis) for t in tasks]
        new_stats = jax.lax.pmean(new_stats, axis)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_stats, new_opt_state, step + 1, loss, tasks

    repl = P()
    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(repl, repl, repl, repl, P(axis), repl),
        out_specs=(repl, repl, repl, repl, repl, repl),
        check_vma=False,
    )

    def train_step(state, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        new_params, new_stats, new_opt, step, loss, tasks = fn(
            state.params, state.batch_stats, state.opt_state, state.step,
            batch, rng,
        )
        return (
            state.replace(
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt,
                step=step,
            ),
            loss,
            tasks,
        )

    return jax.jit(train_step)
