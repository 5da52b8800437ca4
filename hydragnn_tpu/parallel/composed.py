"""3-D composed parallelism: data x branch x model in ONE train step.

The three axes compose without new model code:

- ``data`` + ``branch`` are MANUAL shard_map axes: each (data, branch)
  device processes its own stacked batch slice (branch groups carry only
  their dataset's graphs, the reference MultiTaskModelMP placement —
  parallel/multibranch.py), gradients pmean over both axes with the
  branch re-scaling that reproduces per-group averages.
- ``model`` is an AUTO axis (jax.shard_map ``axis_names`` excludes it):
  parameters enter with their output-feature dims sharded over ``model``
  (parallel/tensor_parallel.shard_state_tp) and GSPMD partitions every
  matmul inside the per-device body Megatron-style.

Beyond reference parity: the reference composes DDP with branch process
groups only (SURVEY.md §2.2); it has no tensor axis to compose.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hydragnn_tpu.parallel.multibranch import branch_of_param


def setup_composed_mesh(
    dp: int, branch: int, tp: int, devices=None
) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= dp * branch * tp
    return Mesh(
        devices[: dp * branch * tp].reshape(dp, branch, tp),
        ("data", "branch", "model"),
    )


def make_composed_train_step(
    model,
    cfg,
    optimizer,
    mesh: Mesh,
    branch_sizes: Sequence[int],
):
    """Train step over a (data, branch, model) mesh.

    ``batch``: stack_device_batches pytree with leading dim
    dp * n_branches, ordered so index (d * B + b) carries branch b's
    dataset graphs for data-shard d. ``branch_sizes[k]`` = data shards
    serving branch k (here: dp each; sum * 1 = dp * B devices in the
    manual submesh)."""
    import jax.numpy as jnp
    import optax

    from hydragnn_tpu.train.trainer import make_loss_fn

    loss_fn = make_loss_fn(model, cfg, False)
    # W manual devices total; branch k is served by branch_sizes[k] of them
    # (counted over the data x branch submesh). Cross-group branch grads
    # are exactly zero, so pmean * W / group_size == per-group mean.
    W = int(mesh.shape["data"] * mesh.shape["branch"])
    factors = {k: W / float(s) for k, s in enumerate(branch_sizes)}

    def scale(grads):
        def f(path, g):
            b = branch_of_param(path)
            return g * factors[b] if b is not None else g

        return jax.tree_util.tree_map_with_path(f, grads)

    def per_device(params, batch_stats, opt_state, step, batch, rng):
        batch = jax.tree_util.tree_map(lambda a: a[0], batch)
        rng = jax.random.fold_in(
            rng,
            jax.lax.axis_index("data") * mesh.shape["branch"]
            + jax.lax.axis_index("branch"),
        )
        (loss, (tasks, _, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch_stats, batch, rng, True)
        grads = scale(jax.lax.pmean(grads, ("data", "branch")))
        loss = jax.lax.pmean(loss, ("data", "branch"))
        tasks = [jax.lax.pmean(t, ("data", "branch")) for t in tasks]
        new_stats = jax.lax.pmean(new_stats, ("data", "branch"))
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_stats, new_opt_state, step + 1, loss, tasks

    repl = P()
    fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(repl, repl, repl, repl, P(("data", "branch")), repl),
        out_specs=(repl, repl, repl, repl, repl, repl),
        axis_names={"data", "branch"},  # "model" stays auto -> GSPMD TP
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
