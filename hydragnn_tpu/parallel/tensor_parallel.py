"""Tensor (model) parallelism for wide GFM-scale stacks — beyond reference
parity (the reference scales only by DDP replicas + branch groups;
ref: hydragnn/run_training.py:118-155, examples/multibranch/train.py).

TPU-native recipe (the scaling-book pattern): lay the parameters out with
their feature dimensions sharded over a ``model`` mesh axis via
``NamedSharding`` and run the UNCHANGED jitted train step — XLA's GSPMD
propagates the shardings through every matmul and inserts the
all-gather / reduce-scatter pattern Megatron-style TP performs by hand,
riding ICI. No model code changes: sharding is a data layout, not an
architecture.

Rule: a kernel's last (output-feature) dimension is sharded over ``model``
when divisible; everything else (biases, norm scales, small tables) stays
replicated. Optimizer-state leaves mirror their parameter's layout, so the
optimizer update runs sharded too (ZeRO-3-like memory scaling for the
state of sharded kernels). Composes with a 2-D (data, model) mesh: batch
leaves sharded over ``data`` give DP x TP in one jit.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hydragnn_tpu.train.trainer import TrainState


def setup_tp_mesh(tp: int, dp: Optional[int] = None,
                  devices=None) -> Mesh:
    """(data, model) mesh; dp defaults to n_devices // tp."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    dp = dp or devices.size // tp
    return Mesh(devices.reshape(dp, tp), ("data", "model"))


def _param_sharding(mesh: Mesh, model_axis: str):
    tp = mesh.shape[model_axis]

    def spec(leaf):
        if (
            hasattr(leaf, "ndim") and leaf.ndim >= 2
            and leaf.shape[-1] % tp == 0 and leaf.shape[-1] >= tp
        ):
            return NamedSharding(
                mesh, P(*([None] * (leaf.ndim - 1)), model_axis)
            )
        return NamedSharding(mesh, P())

    return spec


def shard_state_tp(
    state: TrainState, mesh: Mesh, model_axis: str = "model"
) -> TrainState:
    """Lay out params (and the matching optimizer-state leaves) with
    output-feature dims sharded over ``model``. The returned state feeds
    the ordinary ``make_train_step`` — jit picks the layouts up from the
    committed arrays and GSPMD partitions the whole step."""
    spec = _param_sharding(mesh, model_axis)

    def put(leaf):
        return jax.device_put(leaf, spec(leaf))

    return state.replace(
        params=jax.tree_util.tree_map(put, state.params),
        batch_stats=jax.tree_util.tree_map(put, state.batch_stats),
        opt_state=jax.tree_util.tree_map(
            lambda l: put(l) if hasattr(l, "ndim") else l, state.opt_state
        ),
        step=jax.device_put(state.step, NamedSharding(mesh, P())),
    )


def replicate_batch(batch, mesh: Mesh):
    """Commit batch leaves replicated on the mesh (pure-TP layout; for
    DP x TP shard the leading batch dims over ``data`` instead)."""
    repl = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, repl) if hasattr(a, "ndim") else a,
        batch,
    )


def shard_batch_dp(batch, mesh: Mesh, axis: str = "data"):
    """Commit batch leaves with their LEADING dim sharded over the data
    axis (real DP x TP layout: each data shard holds its slice of the
    global batch; GSPMD keeps the step semantically identical to the
    replicated layout). Leaves whose leading dim does not divide the axis
    size stay replicated."""
    dp = mesh.shape[axis]
    repl = NamedSharding(mesh, P())

    def put(a):
        if not hasattr(a, "ndim"):
            return a
        if a.ndim >= 1 and a.shape[0] % dp == 0 and a.shape[0] >= dp:
            return jax.device_put(
                a, NamedSharding(mesh, P(axis, *([None] * (a.ndim - 1))))
            )
        return jax.device_put(a, repl)

    return jax.tree_util.tree_map(put, batch)


def tp_fraction_sharded(state: TrainState, mesh: Mesh) -> float:
    """Fraction of parameter bytes actually sharded (sanity probe)."""
    total = sharded = 0
    for leaf in jax.tree_util.tree_leaves(state.params):
        nbytes = leaf.size * leaf.dtype.itemsize
        total += nbytes
        if (
            hasattr(leaf, "sharding")
            and not leaf.sharding.is_fully_replicated
        ):
            sharded += nbytes
    return sharded / max(total, 1)
