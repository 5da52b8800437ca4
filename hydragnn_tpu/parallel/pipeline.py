"""Pipeline (stage) parallelism for deep conv trunks — beyond reference
parity (the reference scales only by DDP + branch groups).

GPipe-style microbatch pipelining, TPU-native: conv layers are grouped
into S stages laid on a ``pipe`` mesh axis; microbatches stream through
the stages with ``lax.ppermute`` passing activations stage-to-stage over
ICI. Everything is one ``shard_map``-ped ``lax.scan`` — no host
involvement per tick, and the whole schedule (S + M - 1 ticks) is a
single XLA program. Reverse-mode differentiates through the scan +
ppermute, so the same executor serves training (the backward pass is the
reverse pipeline schedule XLA derives automatically).

GNN specifics: activations are node features [N, F]; each stage also
needs the microbatch's graph structure (edges/masks), which is replicated
— only the [N, F] activation rides the ICI ring, the static structure is
indexed locally by each stage's own microbatch clock (stage s processes
microbatch t - s at tick t).

Homogeneity requirement: the pipelined layers must share parameter
shapes (hidden -> hidden conv layers do; run the input embedding/first
layer outside, as ``Base._embedding`` already does).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def stack_layer_params(params_list: Sequence[Any], n_stages: int):
    """[L] per-layer param trees -> one tree with leading [S, L // S] dims
    (leading axis sharded over the ``pipe`` mesh axis)."""
    L = len(params_list)
    assert L % n_stages == 0, f"{L} layers not divisible by {n_stages} stages"
    k = L // n_stages
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves).reshape(
            (n_stages, k) + np.shape(leaves[0])
        ),
        *params_list,
    )


def shard_pipeline_params(stacked, mesh: Mesh, axis: str = "pipe"):
    """Commit the stacked [S, k, ...] params with S sharded over ``axis``."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), stacked)


def make_pipelined_apply(
    layer_fn: Callable[[Any, jnp.ndarray, Any], jnp.ndarray],
    mesh: Mesh,
    n_stages: int,
    n_micro: int,
    axis: str = "pipe",
):
    """Returns ``fn(stacked_params, micro_x, micro_batches) -> outs``.

    ``layer_fn(layer_params, x, batch) -> x`` applies ONE conv layer.
    ``stacked_params``: tree with leading [S, k] dims (S sharded on
    ``axis``). ``micro_x``: activation PYTREE with leading M on every leaf
    (a plain [M, N, F] array included) — e.g. MACE carries
    {inv, equiv, outs: (...head accumulators...)} so each staged layer's
    decoder contribution rides the pipeline. ``micro_batches``: any pytree
    with leading M on every leaf (replicated graph structure). Output:
    same pytree structure as ``micro_x``, replicated.
    """
    S, M = n_stages, n_micro
    tmap = jax.tree_util.tree_map

    def per_stage(params_stage, micro_x, micro_batches):
        params_stage = tmap(
            lambda a: a[0], params_stage
        )  # [1, k, ...] block -> [k, ...]
        sid = jax.lax.axis_index(axis)

        def tick(carry, t):
            buf, outs = carry
            mb = jnp.clip(t - sid, 0, M - 1)
            batch_t = tmap(
                lambda a: a[mb] if hasattr(a, "ndim") and a.ndim else a,
                micro_batches,
            )
            x_in = tmap(
                lambda mx, b: jnp.where(sid == 0, mx[mb], b), micro_x, buf
            )

            def body(h, p):
                return layer_fn(p, h, batch_t), None

            y, _ = jax.lax.scan(body, x_in, params_stage)
            idx = jnp.clip(t - (S - 1), 0, M - 1)
            take = jnp.logical_and(sid == S - 1, t >= S - 1)
            outs = tmap(
                lambda o, yy: o.at[idx].set(jnp.where(take, yy, o[idx])),
                outs, y,
            )
            buf = tmap(
                lambda yy: jax.lax.ppermute(
                    yy, axis, [(i, (i + 1) % S) for i in range(S)]
                ),
                y,
            )
            return (buf, outs), None

        init = (
            tmap(lambda a: jnp.zeros_like(a[0]), micro_x),
            tmap(jnp.zeros_like, micro_x),
        )
        (buf, outs), _ = jax.lax.scan(
            tick, init, jnp.arange(M + S - 1)
        )
        # result lives on the last stage; psum replicates it to every stage
        return jax.lax.psum(
            tmap(
                lambda o: jnp.where(sid == S - 1, o, jnp.zeros_like(o)),
                outs,
            ),
            axis,
        )

    return shard_map(
        per_stage,
        mesh=mesh,
        in_specs=(P(axis), P(), P()),
        out_specs=P(),
        check_vma=False,
    )


def setup_pipe_mesh(n_stages: int, devices=None,
                    axis: str = "pipe") -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices[:n_stages], (axis,))
