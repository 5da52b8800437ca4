"""Static-shape graph containers for TPU.

The reference (HydraGNN) uses PyG ``Data``/``Batch`` with fully dynamic shapes
(ref: hydragnn/preprocess/load_data.py:225, torch_geometric collate). XLA wants
static shapes, so batches here are padded to bucketed sizes:

  - nodes padded to ``n_node_pad`` (>= real nodes + 1; the last node slot is a
    reserved dummy that padding edges point at),
  - edges padded to ``e_edge_pad``,
  - graphs padded to ``n_graph_pad`` (>= real graphs + 1; padding nodes belong
    to the reserved trailing padding graph).

All ops are masked; segment reductions over ``node_graph_idx``/``receivers``
stay inside real slots because padding elements target reserved padding slots
AND carry zeroed mask weights (defence in depth).

Targets are pre-gathered on the host at collate time into per-head dense
arrays (``graph_y`` [G, sum(graph-head dims)], ``node_y`` [N, sum(node-head
dims)]) — the TPU-first redesign of the reference's dynamic ``y_loc``/
``get_head_indices`` bookkeeping (ref: hydragnn/train/train_validate_test.py:316-379).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct


@dataclasses.dataclass
class GraphSample:
    """One graph, host-side (numpy). Analogue of PyG ``Data``.

    ``x``: [n, F] node features; ``pos``: [n, 3]; ``edge_index``: [2, e]
    (row 0 = senders/source, row 1 = receivers/target, messages flow
    src -> dst as in PyG flow='source_to_target').
    """

    x: np.ndarray
    pos: np.ndarray
    edge_index: np.ndarray
    edge_attr: Optional[np.ndarray] = None
    edge_shifts: Optional[np.ndarray] = None  # [e,3] PBC shift vectors
    y_graph: Optional[np.ndarray] = None  # concatenated graph-level targets [Dg]
    y_node: Optional[np.ndarray] = None  # concatenated node-level targets [n, Dn]
    energy: Optional[np.ndarray] = None  # scalar
    forces: Optional[np.ndarray] = None  # [n, 3]
    pe: Optional[np.ndarray] = None  # [n, pe_dim] Laplacian eigvec PE
    rel_pe: Optional[np.ndarray] = None  # [e, pe_dim] relative edge PE
    dataset_id: int = 0

    @property
    def num_nodes(self) -> int:
        return int(self.x.shape[0])

    @property
    def num_edges(self) -> int:
        return int(self.edge_index.shape[1])


@struct.dataclass
class GraphBatch:
    """Padded, static-shape device batch (pytree). Analogue of PyG ``Batch``."""

    x: jnp.ndarray  # [N, F] float
    pos: jnp.ndarray  # [N, 3] float
    senders: jnp.ndarray  # [E] int32 (edge_index[0])
    receivers: jnp.ndarray  # [E] int32 (edge_index[1])
    node_graph_idx: jnp.ndarray  # [N] int32 (PyG `batch` vector)
    node_mask: jnp.ndarray  # [N] bool
    edge_mask: jnp.ndarray  # [E] bool
    graph_mask: jnp.ndarray  # [G] bool
    n_node: jnp.ndarray  # [G] int32 nodes per graph
    dataset_id: jnp.ndarray  # [G] int32 (multi-dataset branch id)
    edge_shifts: jnp.ndarray  # [E, 3]
    edge_attr: Optional[jnp.ndarray] = None  # [E, De]
    graph_y: Optional[jnp.ndarray] = None  # [G, Dg]
    node_y: Optional[jnp.ndarray] = None  # [N, Dn]
    energy: Optional[jnp.ndarray] = None  # [G]
    forces: Optional[jnp.ndarray] = None  # [N, 3]
    pe: Optional[jnp.ndarray] = None  # [N, pe_dim]
    rel_pe: Optional[jnp.ndarray] = None  # [E, pe_dim]
    # permutation sorting edges by sender — lets the backward scatter of
    # gather ops reuse the sorted-CSR Pallas kernel (ops/pallas_segment.py)
    edge_perm_by_sender: Optional[jnp.ndarray] = None  # [E] int32
    # its inverse (inv[perm] = arange): makes the backward of data[perm] a
    # GATHER by the inverse instead of an unsorted scatter (~2 ms/op on v5e
    # at E=131k — one per conv layer in sender-aggregating stacks)
    edge_perm_by_sender_inv: Optional[jnp.ndarray] = None  # [E] int32
    # permutation sorting edges by RECEIVER — only set when receivers are
    # NOT already globally sorted (edge-slotted collate); lets gather_dst /
    # gather_src_dst keep a sorted backward scatter (None = identity,
    # receivers already sorted)
    edge_perm_by_receiver: Optional[jnp.ndarray] = None  # [E] int32
    # dense block-diagonal adjacency [G, S, S] (collate(node_slot=S,
    # dense_adjacency=True)): A[g, i, j] = multiplicity of edge j->i in
    # graph g's slot-local indices. Turns raw-neighbor aggregation into a
    # batched MXU matmul with NO gather/scatter (ops.segment.adjacency_spmm)
    # — the fastest SpMM form on TPU for small uniform graphs.
    adjacency: Optional[jnp.ndarray] = None  # [G, S, S]
    # STATIC slot width when collated with collate(node_slot=S): every graph
    # occupies a fixed S-row slot, so node arrays reshape to [G, S, F]. Lets
    # GPS global attention run per-graph [G, S, S] blocks instead of the
    # whole-batch [N, N] mask (G-fold fewer logits).
    node_slot: Optional[int] = struct.field(pytree_node=False, default=None)
    # STATIC per-graph edge slot (collate(edge_slot=Eg)): graph g's edges at
    # rows [g*Eg, (g+1)*Eg), padding edges (-> node N-1, mask 0) at each
    # group's tail. Enables the fused per-graph-block edge-chain kernel
    # (ops/pallas_egnn.py). NOTE: receivers are receiver-sorted only WITHIN
    # a graph's group, not globally — ops that assume global sortedness must
    # check this field.
    edge_slot: Optional[int] = struct.field(pytree_node=False, default=None)
    # True iff ``receivers`` is GLOBALLY non-decreasing (the default
    # receiver-sorted collate). False for edge-slotted batches (sorted only
    # within each graph's slot — padding edges at each slot tail point at
    # node N-1) and for collate(sort_edges_by_receiver=False). Aggregations
    # into receivers MUST pass this as ``indices_are_sorted`` — the sorted
    # fast path (Pallas CSR kernel / XLA sorted scatter) silently mis-sums
    # on unsorted ids.
    edges_receiver_sorted: bool = struct.field(pytree_node=False, default=True)
    # STATIC fused-SpMM sender-window hint (ops/pallas_spmm.required_window,
    # set by collate): smallest verified cascade width covering every edge
    # tile's endpoint span in BOTH edge directions (fwd receiver-sorted, bwd
    # sender-sorted); -1 = none fits (skip the fused kernel); None =
    # unknown (use the default runtime cascade). Giant RCM-ordered graphs
    # (data/ordering.py) get 512/1024 windows here instead of falling back.
    spmm_window: Optional[int] = struct.field(pytree_node=False, default=None)
    # block-sparse adjacency for GIANT graphs (collate(bcsr_adjacency=True)):
    # ragged [B, C] int8 tiles built once per batch on the host; turns the
    # per-layer aggregation into a streamed banded MXU matmul with no
    # per-layer A-build (ops/bcsr.py). Forward + transposed tile sets.
    bcsr: Optional[Any] = None  # ops.bcsr.BCSR
    # graph-parallel halo exchange layout (parallel/halo.partition_batch):
    # gp_send_idx[src, dest, :] = local node rows shard `src` sends to shard
    # `dest`; gp_sender_slot[e] indexes the per-shard extended buffer
    # [block | halo from shard 0 | ... | halo from shard D-1].
    gp_send_idx: Optional[jnp.ndarray] = None  # [D, D, H] int32
    gp_sender_slot: Optional[jnp.ndarray] = None  # [E] int32
    gp_num_shards: Optional[int] = struct.field(
        pytree_node=False, default=None
    )
    gp_halo: Optional[int] = struct.field(pytree_node=False, default=None)

    @property
    def num_nodes(self) -> int:
        return self.x.shape[0]

    @property
    def gp(self):
        """(gp_send_idx, gp_sender_slot) for halo-exchange aggregation, or
        None when the batch was not partitioned (parallel/halo.py)."""
        if self.gp_send_idx is None:
            return None
        return (self.gp_send_idx, self.gp_sender_slot)

    @property
    def num_edges(self) -> int:
        return self.senders.shape[0]

    @property
    def num_graphs(self) -> int:
        return self.graph_mask.shape[0]

    def gather_src(self, x: jnp.ndarray) -> jnp.ndarray:
        """x[senders] with a sorted-scatter backward (see ops.spmm.gather_nodes)."""
        from hydragnn_tpu.ops.spmm import gather_nodes

        return gather_nodes(x, self.senders, self.edge_perm_by_sender)

    def gather_dst(self, x: jnp.ndarray) -> jnp.ndarray:
        """x[receivers] with a sorted backward scatter. For the default
        collate receivers are already sorted (identity perm); edge-slotted
        batches carry ``edge_perm_by_receiver`` so the backward stays a
        SORTED segment reduction (the sorted fast path silently mis-sums on
        unsorted ids)."""
        from hydragnn_tpu.ops.spmm import gather_nodes

        return gather_nodes(x, self.receivers, self.edge_perm_by_receiver)

    def gather_src_dst(self, x: jnp.ndarray):
        """(x[senders], x[receivers]) with a single merged backward
        reduction (see ops.spmm.gather_src_dst)."""
        from hydragnn_tpu.ops.spmm import gather_src_dst

        return gather_src_dst(
            x, self.senders, self.receivers, self.edge_perm_by_sender,
            perm_r=self.edge_perm_by_receiver,
        )


def _round_up(v: int, multiple: int) -> int:
    return ((v + multiple - 1) // multiple) * multiple


def pad_sizes(
    n_node: int,
    n_edge: int,
    n_graph: int,
    node_multiple: int = 64,
    edge_multiple: int = 128,
) -> Tuple[int, int, int]:
    """Bucketed padded sizes (bounded recompile count under jit).

    Reserves >=1 dummy node and >=1 dummy graph slot (jraph-style convention).
    Multiples align the leading (sublane) dim to TPU-friendly tiles.
    """
    return (
        _round_up(n_node + 1, node_multiple),
        max(_round_up(n_edge, edge_multiple), edge_multiple),
        n_graph + 1,
    )


def collate(
    samples: Sequence[GraphSample],
    n_node_pad: Optional[int] = None,
    n_edge_pad: Optional[int] = None,
    n_graph_pad: Optional[int] = None,
    node_multiple: int = 64,
    edge_multiple: int = 128,
    sort_edges_by_receiver: bool = True,
    node_slot: Optional[int] = None,
    edge_slot: Optional[int] = None,
    dense_adjacency: bool = False,
    bcsr_adjacency: bool = False,
) -> GraphBatch:
    """Concatenate + pad host samples into one static-shape ``GraphBatch``.

    Edges are (optionally, default on) sorted by receiver so segment
    aggregations can use ``indices_are_sorted=True`` and the Pallas kernel can
    walk contiguous CSR rows.

    ``node_slot=S`` lays every graph into a fixed S-row slot (N = Gp * S,
    graph g's nodes at rows [g*S, g*S + n_g)) so node arrays reshape to
    [Gp, S, F]; ``dense_adjacency=True`` additionally builds the [Gp, S, S]
    block-diagonal adjacency, enabling the batched-matmul SpMM path.

    ``bcsr_adjacency=True`` builds the block-sparse ragged-tile adjacency
    for GIANT (RCM-ordered) graphs — the streamed banded-matmul aggregation
    path (ops/bcsr.py). Host build is O(E); worth it when the batch is
    reused over many layers/steps.

    ``edge_slot=Eg`` (requires ``node_slot``) lays graph g's edges into a
    fixed Eg-row slot [g*Eg, (g+1)*Eg), receiver-sorted within the slot,
    padding edges (sender=receiver=N-1, mask 0) at the slot tail — the
    layout of the fused per-graph-block edge kernel (ops/pallas_egnn.py).
    """
    G = len(samples)
    tot_n = sum(s.num_nodes for s in samples)
    tot_e = sum(s.num_edges for s in samples)
    auto_n, auto_e, auto_g = pad_sizes(tot_n, tot_e, G, node_multiple, edge_multiple)
    if dense_adjacency and node_slot is None:
        raise ValueError("dense_adjacency requires node_slot")
    if edge_slot is not None and node_slot is None:
        raise ValueError("edge_slot requires node_slot")
    Gp = n_graph_pad or auto_g
    if node_slot is not None:
        max_n = max((s.num_nodes for s in samples), default=0)
        if max_n > node_slot:
            raise ValueError(
                f"node_slot={node_slot} smaller than largest graph ({max_n})"
            )
        N = Gp * node_slot
        if n_node_pad is not None and n_node_pad != N:
            raise ValueError("node_slot fixes n_node_pad = n_graph_pad * slot")
    else:
        N = n_node_pad or auto_n
    if edge_slot is not None:
        max_e = max((s.num_edges for s in samples), default=0)
        if max_e > edge_slot:
            raise ValueError(
                f"edge_slot={edge_slot} smaller than largest graph's edge "
                f"count ({max_e})"
            )
        E = Gp * edge_slot
        if n_edge_pad is not None and n_edge_pad != E:
            raise ValueError("edge_slot fixes n_edge_pad = n_graph_pad * slot")
    else:
        E = n_edge_pad or auto_e
    if N < tot_n + 1 or E < tot_e or Gp < G + 1:
        raise ValueError(
            f"padded sizes ({N},{E},{Gp}) too small for batch ({tot_n},{tot_e},{G})"
        )

    F = samples[0].x.shape[1] if samples[0].x.ndim == 2 else 1
    x = np.zeros((N, F), np.float32)
    pos = np.zeros((N, 3), np.float32)
    senders = np.full((E,), N - 1, np.int32)
    receivers = np.full((E,), N - 1, np.int32)
    node_graph_idx = np.full((N,), Gp - 1, np.int32)
    node_mask = np.zeros((N,), bool)
    edge_mask = np.zeros((E,), bool)
    graph_mask = np.zeros((Gp,), bool)
    n_node = np.zeros((Gp,), np.int32)
    dataset_id = np.zeros((Gp,), np.int32)
    edge_shifts = np.zeros((E, 3), np.float32)

    has = lambda attr: getattr(samples[0], attr) is not None
    edge_attr = (
        np.zeros((E, np.atleast_2d(samples[0].edge_attr).shape[-1]), np.float32)
        if has("edge_attr")
        else None
    )
    graph_y = (
        np.zeros((Gp, np.atleast_1d(samples[0].y_graph).shape[-1]), np.float32)
        if has("y_graph")
        else None
    )
    node_y = (
        np.zeros((N, np.atleast_2d(samples[0].y_node).shape[-1]), np.float32)
        if has("y_node")
        else None
    )
    energy = np.zeros((Gp,), np.float32) if has("energy") else None
    forces = np.zeros((N, 3), np.float32) if has("forces") else None
    pe = (
        np.zeros((N, np.atleast_2d(samples[0].pe).shape[-1]), np.float32)
        if has("pe")
        else None
    )
    rel_pe = (
        np.zeros((E, np.atleast_2d(samples[0].rel_pe).shape[-1]), np.float32)
        if has("rel_pe")
        else None
    )

    # vectorized assembly: one concatenate per field + tail padding (the
    # per-sample python loop + 130 separate device_puts dominated collate)
    n_sizes = np.array([s.num_nodes for s in samples])
    e_sizes = np.array([s.num_edges for s in samples])
    if node_slot is not None:
        n_offsets = np.arange(G + 1, dtype=np.int64) * node_slot
        # destination rows: graph g occupies [g*slot, g*slot + n_g)
        dest = np.concatenate(
            [np.arange(n, dtype=np.int64) + g * node_slot
             for g, n in enumerate(n_sizes)]
        ) if G else np.zeros((0,), np.int64)
    else:
        n_offsets = np.concatenate([[0], np.cumsum(n_sizes)])
        dest = np.arange(tot_n, dtype=np.int64)

    x[dest] = np.concatenate(
        [np.atleast_2d(s.x.reshape(s.num_nodes, -1)) for s in samples]
    )
    pos[dest] = np.concatenate([s.pos for s in samples])
    if edge_slot is not None:
        # per-graph edge slots, receiver-sorted within the slot
        e_orders = [
            np.argsort(s.edge_index[1], kind="stable") for s in samples
        ]
        e_dest = np.concatenate(
            [np.arange(e, dtype=np.int64) + g * edge_slot
             for g, e in enumerate(e_sizes)]
        ) if G else np.zeros((0,), np.int64)
    else:
        e_orders = [np.arange(s.num_edges) for s in samples]
        e_dest = np.arange(tot_e, dtype=np.int64)
    if tot_e:
        senders[e_dest] = np.concatenate(
            [s.edge_index[0][o] + off
             for s, o, off in zip(samples, e_orders, n_offsets)]
        )
        receivers[e_dest] = np.concatenate(
            [s.edge_index[1][o] + off
             for s, o, off in zip(samples, e_orders, n_offsets)]
        )
    if node_slot is not None:
        # every row of slot g (incl. slot padding) is labeled graph g so
        # node_graph_idx stays SORTED (segment ops rely on it); node_mask
        # marks validity
        node_graph_idx[:] = np.repeat(
            np.arange(Gp, dtype=np.int32), node_slot
        )
    else:
        node_graph_idx[dest] = np.repeat(np.arange(G, dtype=np.int32), n_sizes)
    node_mask[dest] = True
    edge_mask[e_dest] = True
    graph_mask[:G] = True
    n_node[:G] = n_sizes
    dataset_id[:G] = [s.dataset_id for s in samples]
    if tot_e and samples[0].edge_shifts is not None:
        edge_shifts[e_dest] = np.concatenate(
            [s.edge_shifts[o] for s, o in zip(samples, e_orders)]
        )
    if edge_attr is not None and tot_e:
        edge_attr[e_dest] = np.concatenate(
            [np.atleast_2d(s.edge_attr.reshape(s.num_edges, -1))[o]
             for s, o in zip(samples, e_orders)]
        )
    if graph_y is not None:
        graph_y[:G] = np.stack(
            [np.atleast_1d(s.y_graph).ravel() for s in samples]
        )
    if node_y is not None:
        node_y[dest] = np.concatenate(
            [np.atleast_2d(s.y_node.reshape(s.num_nodes, -1)) for s in samples]
        )
    if energy is not None:
        energy[:G] = [float(np.asarray(s.energy).ravel()[0]) for s in samples]
    if forces is not None:
        forces[dest] = np.concatenate([s.forces for s in samples])
    if pe is not None:
        pe[dest] = np.concatenate(
            [np.atleast_2d(s.pe.reshape(s.num_nodes, -1)) for s in samples]
        )
    if rel_pe is not None and tot_e:
        rel_pe[e_dest] = np.concatenate(
            [np.atleast_2d(s.rel_pe.reshape(s.num_edges, -1))[o]
             for s, o in zip(samples, e_orders)]
        )

    if sort_edges_by_receiver and tot_e > 0 and edge_slot is None:
        # padding edges already point at the last node (max receiver), so the
        # default introsort keeps them at the tail; ties within a receiver
        # carry no semantics
        order = np.argsort(receivers)
        senders = senders[order]
        receivers = receivers[order]
        edge_mask = edge_mask[order]
        edge_shifts = edge_shifts[order]
        if edge_attr is not None:
            edge_attr = edge_attr[order]
        if rel_pe is not None:
            rel_pe = rel_pe[order]

    perm_by_sender = np.argsort(senders).astype(np.int32)
    perm_by_sender_inv = np.empty_like(perm_by_sender)
    perm_by_sender_inv[perm_by_sender] = np.arange(
        perm_by_sender.shape[0], dtype=np.int32
    )
    edges_sorted = sort_edges_by_receiver and edge_slot is None
    perm_by_receiver = (
        None if edges_sorted else np.argsort(receivers).astype(np.int32)
    )

    spmm_window = None
    if sort_edges_by_receiver and tot_e > 0 and edge_slot is None:
        # static fused-SpMM window hint: verify both edge directions so the
        # custom-VJP backward (roles swapped, sender-sorted) is covered too
        from hydragnn_tpu.ops.pallas_spmm import required_window

        w_fwd = required_window(senders, N)
        w_bwd = required_window(receivers[perm_by_sender], N)
        spmm_window = -1 if (w_fwd < 0 or w_bwd < 0) else max(w_fwd, w_bwd)

    adjacency = None
    if dense_adjacency:
        adjacency = np.zeros((Gp, node_slot, node_slot), np.float32)
        if tot_e:
            se = senders[edge_mask].astype(np.int64)
            re_ = receivers[edge_mask].astype(np.int64)
            g = re_ // node_slot
            np.add.at(
                adjacency,
                (g, re_ - g * node_slot, se - g * node_slot),
                1.0,
            )
        # bf16 storage: integer multiplicities < 256 are exact, halves the
        # HBM read of every adjacency_spmm and skips the in-kernel cast
        import ml_dtypes

        adjacency = adjacency.astype(ml_dtypes.bfloat16)

    bcsr = None
    if bcsr_adjacency and tot_e:
        from hydragnn_tpu.ops.bcsr import build_bcsr

        bcsr = build_bcsr(senders, receivers, edge_mask, N)

    # single batched device_put for all fields (one dispatch, not 14)
    host = dict(
        x=x, pos=pos, senders=senders, receivers=receivers,
        node_graph_idx=node_graph_idx, node_mask=node_mask,
        edge_mask=edge_mask, graph_mask=graph_mask, n_node=n_node,
        dataset_id=dataset_id, edge_shifts=edge_shifts,
        edge_perm_by_sender=perm_by_sender,
        edge_perm_by_sender_inv=perm_by_sender_inv,
    )
    for name, arr in (("edge_perm_by_receiver", perm_by_receiver),
                      ("edge_attr", edge_attr), ("graph_y", graph_y),
                      ("node_y", node_y), ("energy", energy),
                      ("forces", forces), ("pe", pe), ("rel_pe", rel_pe),
                      ("adjacency", adjacency)):
        if arr is not None:
            host[name] = arr
    dev = jax.device_put(host)
    return GraphBatch(
        node_slot=node_slot,
        edge_slot=edge_slot,
        edges_receiver_sorted=edges_sorted,
        edge_perm_by_receiver=dev.get("edge_perm_by_receiver"),
        spmm_window=spmm_window,
        bcsr=bcsr,
        edge_attr=dev.get("edge_attr"),
        graph_y=dev.get("graph_y"),
        node_y=dev.get("node_y"),
        energy=dev.get("energy"),
        forces=dev.get("forces"),
        pe=dev.get("pe"),
        rel_pe=dev.get("rel_pe"),
        adjacency=dev.get("adjacency"),
        **{k: dev[k] for k in (
            "x", "pos", "senders", "receivers", "node_graph_idx",
            "node_mask", "edge_mask", "graph_mask", "n_node", "dataset_id",
            "edge_shifts", "edge_perm_by_sender", "edge_perm_by_sender_inv",
        )},
    )
