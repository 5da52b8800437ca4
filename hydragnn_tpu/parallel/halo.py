"""Static halo exchange for edge-partitioned graph parallelism.

The BASELINE north star (absent in the reference, whose graphs are small —
SURVEY.md §2.2): partition a batch's nodes/edges across chips and exchange
only the BOUNDARY node features over ICI, overlapped with local aggregation.

``make_graph_parallel_train_step`` (graph_parallel.py) already runs the whole
model node-sharded under GSPMD, but XLA's generic schedule all-gathers the
full [N, F] node array per SpMM. For radius graphs laid out contiguously the
cross-shard edge fraction is small, so the halo set (remote rows each shard
actually references) is far smaller than N. ``partition_batch`` computes that
halo STATICALLY on the host (static shapes — no data-dependent comms), and
``halo_exchange_spmm`` moves it with ONE ``all_to_all`` of [D, H, F] per
device instead of an all-gather of [N, F]:

    traffic/device:  all_gather  N * F
                     halo        D * H * F   (H = max pairwise halo rows)

and the collective overlaps with the aggregation of shard-local edges (XLA
schedules the all_to_all async; local edges never wait on it).

Layout produced by ``partition_batch`` (D shards over an existing collated
batch):

  - nodes: untouched — shard d owns rows [d*B, (d+1)*B), B = N/D.
  - edges: regrouped so shard d's edges (receiver in shard d) occupy
    [d*Es, (d+1)*Es), receiver-sorted; global receiver order is preserved, so
    every sorted-segment invariant still holds for the unsharded paths.
    Per-shard padding edges are self-loops on the shard's last row with
    ``edge_mask=False`` (all aggregation ops here weight by the mask).
  - gp_send_idx[src, dest, :H]: local rows shard src sends to shard dest.
  - gp_sender_slot[e]: index into the receiving shard's extended buffer
    ``[x_local | halo_0 | ... | halo_{D-1}]`` (size B + D*H).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from hydragnn_tpu.graph import GraphBatch


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def partition_batch(
    batch: GraphBatch, n_shards: int, edge_multiple: int = 128
) -> GraphBatch:
    """Re-lay a collated batch's edges for D-way halo-exchange execution.

    Host-side (numpy). Node arrays are unchanged; edge-aligned arrays are
    regrouped per receiver shard and padded to a common per-shard edge count.
    """
    D = n_shards
    N = batch.num_nodes
    if N % D:
        raise ValueError(f"node pad {N} must divide by n_shards {D}")
    B = N // D

    send = np.asarray(batch.senders)
    recv = np.asarray(batch.receivers)
    mask = np.asarray(batch.edge_mask)
    real = np.flatnonzero(mask)
    r_shard = recv[real] // B

    # per-shard real edge lists (receiver-sorted within shard already, since
    # the input batch is receiver-sorted and shards own contiguous id ranges)
    per_shard = [real[r_shard == d] for d in range(D)]
    Es = max(
        _round_up(max((len(p) for p in per_shard), default=1), edge_multiple),
        edge_multiple,
    )
    E_new = D * Es

    # halo: for each (src, dest) pair, unique rows src must send to dest
    send_lists = [[np.zeros((0,), np.int64)] * D for _ in range(D)]
    H = 1
    for d in range(D):
        s = send[per_shard[d]]
        s_shard = s // B
        for o in range(D):
            if o == d:
                continue
            rows = np.unique(s[s_shard == o]) - o * B  # local ids in shard o
            send_lists[o][d] = rows
            H = max(H, len(rows))
    H = _round_up(H, 8)

    gp_send_idx = np.zeros((D, D, H), np.int32)
    for o in range(D):
        for d in range(D):
            rows = send_lists[o][d]
            gp_send_idx[o, d, : len(rows)] = rows

    def relayout(arr, fill):
        out = np.full((E_new,) + arr.shape[1:], fill, arr.dtype)
        for d in range(D):
            sel = arr[per_shard[d]]
            out[d * Es : d * Es + len(sel)] = sel
        return out

    new_send = relayout(send, 0)
    new_recv = relayout(recv, 0)
    new_mask = np.zeros((E_new,), bool)
    slot = np.zeros((E_new,), np.int32)
    for d in range(D):
        n_real = len(per_shard[d])
        lo = d * Es
        new_mask[lo : lo + n_real] = True
        # padding edges: self-loop on the shard's LAST row, weight 0 — keeps
        # per-shard receivers sorted and global receiver order monotone
        pad_row = (d + 1) * B - 1
        new_send[lo + n_real : lo + Es] = pad_row
        new_recv[lo + n_real : lo + Es] = pad_row
        # extended-buffer slots
        s = new_send[lo : lo + Es]
        s_shard = s // B
        local = s_shard == d
        slot_d = np.where(local, s - d * B, 0).astype(np.int32)
        for o in range(D):
            if o == d:
                continue
            sel = np.flatnonzero(s_shard == o)
            if len(sel) == 0:
                continue
            pos = np.searchsorted(send_lists[o][d], s[sel] - o * B)
            slot_d[sel] = B + o * H + pos
        slot[lo : lo + Es] = slot_d

    def relayout_opt(arr):
        if arr is None:
            return None
        return jnp.asarray(relayout(np.asarray(arr), 0))

    perm_by_sender = np.argsort(new_send, kind="stable").astype(np.int32)
    inv = np.empty_like(perm_by_sender)
    inv[perm_by_sender] = np.arange(E_new, dtype=np.int32)

    return batch.replace(
        senders=jnp.asarray(new_send.astype(np.int32)),
        receivers=jnp.asarray(new_recv.astype(np.int32)),
        edge_mask=jnp.asarray(new_mask),
        edge_shifts=relayout_opt(batch.edge_shifts),
        edge_attr=relayout_opt(batch.edge_attr),
        rel_pe=relayout_opt(batch.rel_pe),
        edge_perm_by_sender=jnp.asarray(perm_by_sender),
        edge_perm_by_sender_inv=jnp.asarray(inv),
        gp_send_idx=jnp.asarray(gp_send_idx),
        gp_sender_slot=jnp.asarray(slot),
        gp_num_shards=D,
        gp_halo=H,
    )


def halo_exchange_spmm(
    x_local: jnp.ndarray,  # [B, F] resident node block
    send_idx_me: jnp.ndarray,  # [1, D, H] or [D, H] this shard's send rows
    sender_slot: jnp.ndarray,  # [Es] extended-buffer slot per local edge
    recv_local: jnp.ndarray,  # [Es] GLOBAL receiver ids of local edges
    weight: jnp.ndarray,  # [Es] edge weight (0 for padding)
    axis: str = "graph",
) -> jnp.ndarray:
    """out[i] += w_e * x[sender_e] with boundary features moved by ONE
    all_to_all of the static halo, overlapped with local aggregation.

    Runs inside shard_map. ``recv_local`` may be global (the shard offset is
    subtracted internally). Differentiable (pure jax ops; the all_to_all
    transposes to the reverse all_to_all)."""
    D = jax.lax.axis_size(axis)
    B, F = x_local.shape
    me = jax.lax.axis_index(axis)
    send_idx_me = send_idx_me.reshape(D, -1)
    H = send_idx_me.shape[-1]

    # launch the halo exchange first; local aggregation overlaps with it
    buf = x_local[send_idx_me]  # [D, H, F] rows for each destination
    halo = jax.lax.all_to_all(buf, axis, split_axis=0, concat_axis=0)

    recv = recv_local - me * B
    is_local = sender_slot < B
    wl = (weight * is_local).astype(x_local.dtype)
    local_rows = jnp.clip(sender_slot, 0, B - 1)
    out = jax.ops.segment_sum(
        x_local[local_rows] * wl[:, None], recv, B, indices_are_sorted=True
    )

    wr = (weight * (~is_local)).astype(x_local.dtype)
    hbuf = halo.reshape(D * H, F)
    halo_rows = jnp.clip(sender_slot - B, 0, D * H - 1)
    out = out + jax.ops.segment_sum(
        hbuf[halo_rows] * wr[:, None], recv, B, indices_are_sorted=True
    )
    return out


def make_halo_spmm(mesh: Mesh, axis: str = "graph"):
    """jit-wrapped shard_map entry: (x, batch) -> aggregated node features."""

    fn = shard_map(
        partial(halo_exchange_spmm, axis=axis),
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )

    def run(x: jnp.ndarray, batch: GraphBatch,
            weight: Optional[jnp.ndarray] = None):
        w = batch.edge_mask.astype(x.dtype)
        if weight is not None:
            w = w * weight.astype(x.dtype)
        return fn(
            x, batch.gp_send_idx, batch.gp_sender_slot, batch.receivers, w
        )

    return jax.jit(run)
