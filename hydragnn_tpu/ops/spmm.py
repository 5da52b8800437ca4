"""Fused-path SpMM: gather + CSR segment-sum with kernel-fast backward.

Forward: out[r] += x[s] (XLA gather — fast on TPU — then the Pallas CSR
segment-sum). Backward: dx[s] += g[r], which is itself a segment-sum over
edges sorted by sender; the host-precomputed ``edge_perm_by_sender``
(GraphBatch field) re-sorts so the same Pallas kernel handles it — otherwise
XLA's slow scatter-add would dominate the backward pass.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from hydragnn_tpu.ops.pallas_segment import segment_sum_auto


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def spmm_sorted(
    x: jnp.ndarray,
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    perm_by_sender: jnp.ndarray,
    num_nodes: int,
) -> jnp.ndarray:
    """out[i] = sum_{e: receivers[e]=i} x[senders[e]]; receivers sorted."""
    msgs = x[senders]
    return segment_sum_auto(msgs, receivers, num_nodes, indices_are_sorted=True)


def _fwd(x, senders, receivers, perm_by_sender, num_nodes):
    out = spmm_sorted(x, senders, receivers, perm_by_sender, num_nodes)
    return out, (senders, receivers, perm_by_sender)


def _bwd(num_nodes, res, g):
    senders, receivers, perm = res
    # dx[s] = sum over outgoing edges of g[r]: segment-sum sorted by sender
    g_edges = g[receivers[perm]]
    dx = segment_sum_auto(
        g_edges, senders[perm], num_nodes, indices_are_sorted=True
    )
    return (dx, None, None, None)


spmm_sorted.defvjp(_fwd, _bwd)


def spmm(
    x: jnp.ndarray,
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    num_nodes: int,
    perm_by_sender: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    if perm_by_sender is None:
        msgs = x[senders]
        return jax.ops.segment_sum(
            msgs, receivers, num_nodes, indices_are_sorted=True
        )
    return spmm_sorted(x, senders, receivers, perm_by_sender, num_nodes)
