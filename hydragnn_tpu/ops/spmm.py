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
from hydragnn_tpu.ops.pallas_gather import gather_rows_auto


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def spmm_sorted(
    x: jnp.ndarray,
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    perm_by_sender: jnp.ndarray,
    num_nodes: int,
) -> jnp.ndarray:
    """out[i] = sum_{e: receivers[e]=i} x[senders[e]]; receivers sorted."""
    msgs = gather_rows_auto(x, senders)
    return segment_sum_auto(msgs, receivers, num_nodes, indices_are_sorted=True)


def _fwd(x, senders, receivers, perm_by_sender, num_nodes):
    out = spmm_sorted(x, senders, receivers, perm_by_sender, num_nodes)
    return out, (senders, receivers, perm_by_sender)


def _bwd(num_nodes, res, g):
    senders, receivers, perm = res
    # dx[s] = sum over outgoing edges of g[r]: segment-sum sorted by sender.
    # receivers[perm] is still graph-local (both endpoints share a graph), so
    # the windowed gather applies here too.
    g_edges = gather_rows_auto(g, receivers[perm])
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


@jax.custom_vjp
def _gather_sorted_bwd(x, ids, perm):
    """x[ids] whose BACKWARD scatter runs sorted: dx = segment_sum of the
    cotangent re-ordered by ``perm`` (which sorts ``ids``; identity when ids
    are already sorted). Plain x[ids] backward is an unsorted XLA scatter-add
    — the slowest op on TPU (measured ~10-30x worse than sorted) and it
    appears in the backward of EVERY message gather. The forward routes
    through the windowed one-hot MXU gather on TPU (graph-local ids)."""
    return gather_rows_auto(x, ids)


def _gather_fwd(x, ids, perm):
    return x[ids], (ids, perm, x.shape[0])


def _gather_bwd(res, g):
    ids, perm, n = res
    from hydragnn_tpu.ops.pallas_segment import (
        segment_sum_auto,
        segment_sum_local_auto,
    )

    if g.ndim == 2:
        # fast path: aggregate the cotangent straight in edge order via the
        # unsorted-local windowed kernel — skips the [E, F] g[perm] permute
        dx = segment_sum_local_auto(g, ids, n, perm)
        if dx is None:
            dx = segment_sum_auto(
                g[perm], ids[perm], n, indices_are_sorted=True
            )
    else:
        dx = jax.ops.segment_sum(
            g[perm], ids[perm], n, indices_are_sorted=True
        )
    return (dx, None, None)


_gather_sorted_bwd.defvjp(_gather_fwd, _gather_bwd)


def gather_nodes(
    x: jnp.ndarray,
    ids: jnp.ndarray,
    perm: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Gather node rows to edges with a sorted-scatter backward. ``perm``
    sorts ``ids`` (GraphBatch.edge_perm_by_sender for sender gathers); pass
    None when ``ids`` are already sorted (receiver gathers)."""
    if perm is None:
        perm = jnp.arange(ids.shape[0], dtype=jnp.int32)
    return _gather_sorted_bwd(x, ids, perm)


@jax.custom_vjp
def _gather_src_dst(x, senders, receivers, perm):
    return x[senders], x[receivers]


def _gather_both_fwd(x, senders, receivers, perm):
    return (x[senders], x[receivers]), (senders, receivers, perm, x.shape[0])


def _gather_both_bwd(res, gs):
    g_s, g_r = gs
    senders, receivers, perm, n = res
    if g_s.ndim == 2:
        from hydragnn_tpu.ops.pallas_segment import (
            segment_sum_auto,
            segment_sum_local_auto,
        )

        # fastest: sender cotangent aggregated in edge order by the
        # unsorted-local kernel (no permute), receiver cotangent by the
        # sorted kernel
        ds = segment_sum_local_auto(g_s, senders, n, perm)
        if ds is not None:
            dr = segment_sum_auto(
                g_r, receivers, n, indices_are_sorted=True
            )
            return (ds + dr, None, None, None)
        # merged fallback — ONE sorted segment-sum instead of two:
        # receivers are ascending in [0, n) and senders[perm] are
        # ascending, so [receivers ‖ senders+n] is globally sorted over 2n
        # segments; dx = out[:n] + out[n:].
        ids = jnp.concatenate([receivers, senders[perm] + n])
        data = jnp.concatenate([g_r, g_s[perm]], axis=0)
        out = segment_sum_auto(data, ids, 2 * n, indices_are_sorted=True)
    else:
        ids = jnp.concatenate([receivers, senders[perm] + n])
        data = jnp.concatenate([g_r, g_s[perm]], axis=0)
        out = jax.ops.segment_sum(data, ids, 2 * n, indices_are_sorted=True)
    return (out[:n] + out[n:], None, None, None)


_gather_src_dst.defvjp(_gather_both_fwd, _gather_both_bwd)


def gather_src_dst(
    x: jnp.ndarray,
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    perm: Optional[jnp.ndarray] = None,
    perm_r: Optional[jnp.ndarray] = None,
):
    """(x[senders], x[receivers]) with the two backward scatters merged into
    one sorted segment reduction over 2N virtual segments — halves the
    per-layer backward kernel launches of convs that gather both endpoints
    (EGNN/GAT/CGCNN-style edge MLPs).

    Only profitable when the merged reduction hits the Pallas CSR kernel
    (2-D float, 128-multiple features, TPU): otherwise the [2E, F] concat of
    the two cotangents costs more HBM traffic than it saves (measured: EGNN
    h866 bf16 70 -> 140 ms/step when merged onto the XLA path)."""
    if perm is None:
        return x[senders], x[receivers]
    # the merged 2n-segment reduction requires receivers globally ascending;
    # edge-slotted batches (perm_r set) use two separately-sorted backwards
    merged_ok = (
        perm_r is None
        and x.ndim == 2
        and x.shape[-1] % 128 == 0
        and x.dtype in (jnp.float32, jnp.bfloat16)
        and jax.default_backend() not in ("cpu", "gpu")
    )
    if not merged_ok:
        return (
            gather_nodes(x, senders, perm),
            gather_nodes(x, receivers, perm_r),
        )
    return _gather_src_dst(x, senders, receivers, perm)
