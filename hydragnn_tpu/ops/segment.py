"""Segment (scatter/aggregate) ops — THE hot path of message passing.

TPU-native replacement for torch_scatter / PyG ``MessagePassing`` C++ kernels
(ref: hydragnn/models/Base.py:18,599; every *Stack.py conv). Built on XLA
``jax.ops.segment_sum`` (which lowers to sorted-scatter on TPU) with
``indices_are_sorted=True`` fast path (collate sorts edges by receiver).
The Pallas CSR kernel in ``hydragnn_tpu.ops.pallas_segment`` overrides the
dense-feature segment-sum where profitable.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def segment_sum(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    indices_are_sorted: bool = True,
) -> jnp.ndarray:
    """Sorted 2-D float reductions with 128-multiple features route through
    the Pallas CSR MXU kernel on TPU (4.1x over XLA scatter, exact fp32);
    everything else uses XLA segment_sum."""
    if (
        indices_are_sorted
        and data.ndim == 2
        and data.shape[-1] % 128 == 0
        and data.dtype in (jnp.float32, jnp.bfloat16)
        and jax.default_backend() not in ("cpu", "gpu")
    ):
        from hydragnn_tpu.ops.pallas_segment import segment_sum_csr

        return segment_sum_csr(data, segment_ids, num_segments)
    return jax.ops.segment_sum(
        data, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )


def degree(
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = True,
) -> jnp.ndarray:
    w = jnp.ones(segment_ids.shape, jnp.float32)
    if mask is not None:
        w = w * mask.astype(jnp.float32)
    return jax.ops.segment_sum(
        w, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )


def segment_mean(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = True,
) -> jnp.ndarray:
    if mask is not None:
        data = data * mask.astype(data.dtype).reshape((-1,) + (1,) * (data.ndim - 1))
    s = segment_sum(data, segment_ids, num_segments, indices_are_sorted)
    cnt = degree(segment_ids, num_segments, mask, indices_are_sorted)
    cnt = jnp.maximum(cnt, 1.0).reshape((-1,) + (1,) * (data.ndim - 1))
    return s / cnt.astype(s.dtype)


def segment_max(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = True,
) -> jnp.ndarray:
    """Max over segment; empty/masked-out segments yield 0 (PyG convention
    fills with 0 after aggr when no messages: matches scatter 'max' w/ zero init
    in torch_scatter for ReLU'd inputs; we clamp identity to a large negative
    then zero empty segments)."""
    neg = jnp.asarray(jnp.finfo(data.dtype).min, data.dtype)
    if mask is not None:
        data = jnp.where(
            mask.reshape((-1,) + (1,) * (data.ndim - 1)), data, neg
        )
    out = jax.ops.segment_max(
        data, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )
    cnt = degree(segment_ids, num_segments, mask, indices_are_sorted)
    has = (cnt > 0).reshape((-1,) + (1,) * (data.ndim - 1))
    return jnp.where(has, out, 0.0).astype(data.dtype)


def segment_min(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = True,
) -> jnp.ndarray:
    return -segment_max(-data, segment_ids, num_segments, mask, indices_are_sorted)


def segment_std(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = True,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Relaxed std as in PyG PNA ('std' scaler): sqrt(relu(E[x^2]-E[x]^2)+eps)
    (ref: torch_geometric.nn.aggr.multi StdAggregation used by PNAConv)."""
    mean = segment_mean(data, segment_ids, num_segments, mask, indices_are_sorted)
    mean2 = segment_mean(
        data * data, segment_ids, num_segments, mask, indices_are_sorted
    )
    var = jax.nn.relu(mean2 - mean * mean)
    return jnp.sqrt(var + eps)


def pna_aggregate(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = True,
    perm: Optional[jnp.ndarray] = None,
    inv_perm: Optional[jnp.ndarray] = None,
    eps: float = 1e-5,
):
    """(mean, min, max, std) per segment — the PNA DegreeScalerAggregation
    hot path (ref: PNAPlusStack.py:144-304, PNAEqStack.py:103).

    On TPU with 2-D float data this fuses all four aggregators into ONE
    pass over the messages (ops/pallas_multiagg.py) instead of five XLA
    scatter passes; elsewhere it falls back to the unfused segment ops.
    Unsorted ids (PNAEq aggregates by SENDER of a receiver-sorted edge
    list) are routed through one [E, F] permutation (``perm`` /
    ``inv_perm`` = GraphBatch.edge_perm_by_sender[_inv]) so the sorted
    kernel applies; its backward is a gather by the inverse permutation.
    """
    import os

    eligible = (
        os.environ.get("HYDRAGNN_TPU_MULTIAGG", "1") != "0"
        and data.ndim == 2
        and data.dtype in (jnp.float32, jnp.bfloat16)
        and data.shape[0] >= 4096
        and jax.default_backend() not in ("cpu", "gpu")
        and (indices_are_sorted or perm is not None)
    )
    if not eligible:
        return (
            segment_mean(data, segment_ids, num_segments, mask,
                         indices_are_sorted),
            segment_min(data, segment_ids, num_segments, mask,
                        indices_are_sorted),
            segment_max(data, segment_ids, num_segments, mask,
                        indices_are_sorted),
            segment_std(data, segment_ids, num_segments, mask,
                        indices_are_sorted, eps=eps),
        )
    from hydragnn_tpu.ops.pallas_multiagg import segment_multiagg

    if not indices_are_sorted:
        data = (
            permute_rows(data, perm, inv_perm) if inv_perm is not None
            else data[perm]
        )
        segment_ids = segment_ids[perm]
        if mask is not None:
            mask = mask[perm]
    ids_eff = segment_ids.astype(jnp.int32)
    if mask is not None:
        ids_eff = jnp.where(mask, ids_eff, jnp.int32(2**31 - 2))
        # zero masked rows: they ride through the kernel's matmuls with a
        # 0 one-hot and must stay finite
        data = data * mask.astype(data.dtype)[:, None]
    cnt = degree(segment_ids, num_segments, mask, indices_are_sorted=True)
    max_run = jnp.max(cnt).astype(jnp.int32)
    F = data.shape[1]
    F_pad = ((F + 127) // 128) * 128
    if F_pad != F:
        data = jnp.pad(data, ((0, 0), (0, F_pad - F)))
    s, ss, mx, mn = segment_multiagg(data, ids_eff, num_segments, max_run)
    if F_pad != F:
        s, ss, mx, mn = (a[:, :F] for a in (s, ss, mx, mn))
    d = jnp.maximum(cnt, 1.0)[:, None].astype(s.dtype)
    mean = s / d
    mean2 = ss / d
    var = jax.nn.relu(mean2 - mean * mean)
    std = jnp.sqrt(var + eps)
    return mean, mn, mx, std


def segment_softmax(
    logits: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = True,
) -> jnp.ndarray:
    """Per-segment softmax over edges (GAT attention normalization;
    ref: torch_geometric.utils.softmax used by GATConv)."""
    if mask is not None:
        m = mask.reshape((-1,) + (1,) * (logits.ndim - 1))
        logits = jnp.where(m, logits, jnp.finfo(logits.dtype).min)
    seg_max = jax.ops.segment_max(
        logits, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    logits = logits - seg_max[segment_ids]
    unnorm = jnp.exp(logits)
    if mask is not None:
        unnorm = unnorm * mask.astype(unnorm.dtype).reshape(
            (-1,) + (1,) * (unnorm.ndim - 1)
        )
    denom = segment_sum(unnorm, segment_ids, num_segments, indices_are_sorted)
    denom = jnp.maximum(denom, jnp.asarray(1e-16, denom.dtype))
    return unnorm / denom[segment_ids]


def _adjacency_bmm(adj: jnp.ndarray, xg: jnp.ndarray) -> jnp.ndarray:
    """einsum('gij,gjf->gif') with exact-fp32 MXU arithmetic.

    The adjacency is exact in bf16 (integer multiplicities < 256; collate
    stores it bf16 — half the HBM residency/read). For fp32 x, the upcast
    A.astype(f32) fuses into a Precision.HIGHEST dot: XLA's 6-pass bf16
    decomposition in the MXU pipeline, which — A being exact in its leading
    bf16 chunk — reduces to exactly the A*(x1+x2+x3) mantissa-split product
    (fp32-exact) WITHOUT materializing split terms in HBM. Measured v5e,
    G=1024 S=128 F=128: 1.39 ms / 1510 Medges/s vs 1.75 ms for manual
    3-term splits and 1.88 ms for f32-stored A (bench.py --dense)."""
    # Pallas streamed block-diagonal bmm on TPU: XLA's generic batched-GEMM
    # schedule leaves ~3x bandwidth on the table for thousands-of-tiny-
    # matmul shapes (ops/pallas_bmm.py; round-3 retune of the round-1
    # numbers above)
    if (
        jax.default_backend() not in ("cpu", "gpu")
        and xg.dtype in (jnp.float32, jnp.bfloat16)
        and xg.shape[-1] % 128 == 0
        and adj.shape[-1] % 8 == 0
    ):
        from hydragnn_tpu.ops.pallas_bmm import bmm_blockdiag

        return bmm_blockdiag(
            adj if adj.dtype == jnp.bfloat16 else adj.astype(jnp.bfloat16),
            xg,
        )
    a16 = adj if adj.dtype == jnp.bfloat16 else adj.astype(jnp.bfloat16)
    dn = (((2,), (1,)), ((0,), (0,)))
    if xg.dtype == jnp.float32:
        out = jax.lax.dot_general(
            a16.astype(jnp.float32), xg, dn,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
    else:
        out = jax.lax.dot_general(
            a16, xg.astype(jnp.bfloat16), dn,
            preferred_element_type=jnp.float32,
        )
    return out.astype(xg.dtype)


@jax.custom_vjp
def adjacency_spmm(adj: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Dense block-diagonal SpMM: out[i] = sum_j A[g,i,j] x[g*S+j] for the
    slotted layout (collate(node_slot=S, dense_adjacency=True)).

    THE fastest aggregation form on TPU for batches of small uniform graphs:
    a single batched MXU matmul — no gather, no scatter, no edge array.
    adj: [G, S, S]; x: [G*S, F]; returns [G*S, F]. Backward is the same bmm
    with A transposed."""
    G, S, _ = adj.shape
    return _adjacency_bmm(adj, x.reshape(G, S, -1)).reshape(x.shape)


def _adj_fwd(adj, x):
    return adjacency_spmm(adj, x), (adj, x)


def _adj_bwd(res, g):
    adj, x = res
    G, S, _ = adj.shape
    dx = _adjacency_bmm(
        jnp.swapaxes(adj, 1, 2), g.reshape(G, S, -1)
    ).reshape(x.shape)
    # dA = g x^T per graph — only materialized if the caller differentiates
    # w.r.t. the adjacency (DCE'd otherwise; batches are not diff targets)
    dA = jax.lax.dot_general(
        g.reshape(G, S, -1).astype(jnp.bfloat16),
        x.reshape(G, S, -1).astype(jnp.bfloat16),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(adj.dtype)
    return (dA, dx)


adjacency_spmm.defvjp(_adj_fwd, _adj_bwd)


@jax.custom_vjp
def permute_rows(data: jnp.ndarray, perm: jnp.ndarray,
                 inv_perm: jnp.ndarray) -> jnp.ndarray:
    """``data[perm]`` whose backward is ``g[inv_perm]`` — a gather by the
    host-precomputed inverse permutation. The default backward of a
    permutation gather is an XLA scatter-add, which costs ~2 ms/op on v5e at
    E=131k regardless of feature width (latency-bound) and appears once per
    conv layer in sender-aggregating stacks."""
    return data[perm]


def _permute_fwd(data, perm, inv_perm):
    return data[perm], inv_perm


def _permute_bwd(inv_perm, g):
    return (g[inv_perm], None, None)


permute_rows.defvjp(_permute_fwd, _permute_bwd)


def segment_sum_via_perm(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    perm: Optional[jnp.ndarray],
    inv_perm: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Unsorted segment sum re-sorted through a host-precomputed permutation
    (GraphBatch.edge_perm_by_sender) so the Pallas sorted-CSR kernel applies —
    used by stacks that aggregate into SENDER nodes (EGNN/PAINN/PNAEq).
    Pass ``inv_perm`` (GraphBatch.edge_perm_by_sender_inv) to make the
    permutation's backward a gather instead of an unsorted scatter.

    Fast path: the v3 unsorted-local windowed kernel aggregates straight
    from the receiver-sorted edge order — no [E, F] permutation at all
    (ops/pallas_segment.segment_sum_local; graph-locality checked at
    runtime, permute+sorted-kernel fallback)."""
    if perm is None:
        return jax.ops.segment_sum(
            data, segment_ids, num_segments, indices_are_sorted=False
        )
    from hydragnn_tpu.ops.pallas_segment import segment_sum_local_auto

    local = segment_sum_local_auto(data, segment_ids, num_segments, perm)
    if local is not None:
        return local
    sorted_data = (
        permute_rows(data, perm, inv_perm) if inv_perm is not None
        else data[perm]
    )
    return segment_sum(
        sorted_data, segment_ids[perm], num_segments, indices_are_sorted=True
    )


def masked_segment_mean(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: jnp.ndarray,
    indices_are_sorted: bool = True,
) -> jnp.ndarray:
    """global_mean_pool equivalent (ref: hydragnn/models/Base.py:478)."""
    return segment_mean(data, segment_ids, num_segments, mask, indices_are_sorted)


def gather_scatter_sum(
    node_feat: jnp.ndarray,
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    num_nodes: int,
    edge_weight: Optional[jnp.ndarray] = None,
    edge_mask: Optional[jnp.ndarray] = None,
    perm_by_sender: Optional[jnp.ndarray] = None,
    adjacency: Optional[jnp.ndarray] = None,
    gp: Optional[tuple] = None,
    window_hint: Optional[int] = None,
    bcsr=None,
    edges_receiver_sorted: bool = True,
) -> jnp.ndarray:
    """SpMM: out[r] += w_e * x[s].

    Fastest first: (1) dense block-diagonal ``adjacency`` bmm when the batch
    was collated with node slots (one batched MXU matmul, zero gather/
    scatter; masks are built into A), (1b) the block-sparse ``bcsr`` banded
    matmul for GIANT graphs (collate(bcsr_adjacency=True); edge masks are
    baked into the tiles), (2) the FUSED adjacency-block Pallas kernel
    (ops/pallas_spmm.py — no [E, F] intermediate in HBM, ~2x the unfused
    kernel pipeline and ~8x XLA on v5e), (3) gather + segment-sum with a
    sorted backward via ``perm_by_sender``.

    ``gp=(gp_send_idx, gp_sender_slot)`` (GraphBatch.gp, set by
    parallel/halo.partition_batch) + an enabled halo-exchange context routes
    the aggregation through an explicit shard_map island: boundary node
    features move with ONE all_to_all of the static halo, overlapped with
    shard-local aggregation (parallel/halo.py)."""
    if gp is not None and gp[0] is not None and node_feat.ndim == 2 and (
        edge_weight is None or edge_weight.ndim == 1
    ):
        from hydragnn_tpu.parallel.context import halo_exchange_config

        cfg = halo_exchange_config()
        if cfg is not None:
            from functools import partial

            from jax.sharding import PartitionSpec as P
            from jax import shard_map

            from hydragnn_tpu.parallel.halo import halo_exchange_spmm

            mesh, axis = cfg
            w = jnp.ones(senders.shape, node_feat.dtype)
            if edge_weight is not None:
                w = w * edge_weight.astype(node_feat.dtype)
            if edge_mask is not None:
                w = w * edge_mask.astype(node_feat.dtype)
            fn = shard_map(
                partial(halo_exchange_spmm, axis=axis),
                mesh=mesh,
                in_specs=(P(axis),) * 5,
                out_specs=P(axis),
                check_vma=False,
            )
            return fn(node_feat, gp[0], gp[1], receivers, w)
    if adjacency is not None and edge_weight is None and node_feat.ndim == 2:
        return adjacency_spmm(jax.lax.stop_gradient(adjacency), node_feat)
    if (
        bcsr is not None
        and edge_weight is None
        and node_feat.ndim == 2
        and node_feat.shape[1] % 128 == 0
        and node_feat.dtype in (jnp.float32, jnp.bfloat16)
        and jax.default_backend() not in ("cpu", "gpu")
    ):
        import os

        if os.environ.get("HYDRAGNN_TPU_BCSR", "1") != "0":
            from hydragnn_tpu.ops.bcsr import bcsr_spmm

            return bcsr_spmm(node_feat, bcsr)
    from hydragnn_tpu.ops.pallas_spmm import spmm_fused_auto

    # fused kernel + sorted-CSR segment path both require GLOBALLY
    # receiver-sorted edges (GraphBatch.edges_receiver_sorted; False for
    # edge-slotted / unsorted collates)
    fused = None if not edges_receiver_sorted else spmm_fused_auto(
        node_feat, senders, receivers, num_nodes,
        weights=edge_weight if edge_weight is not None and edge_weight.ndim == 1 else None,
        edge_mask=edge_mask,
        perm_by_sender=perm_by_sender,
        window_hint=window_hint,
    ) if (edge_weight is None or edge_weight.ndim == 1) else None
    if fused is not None:
        return fused
    if perm_by_sender is not None:
        from hydragnn_tpu.ops.spmm import gather_nodes

        msg = gather_nodes(node_feat, senders, perm_by_sender)
    else:
        msg = node_feat[senders]
    if edge_weight is not None:
        msg = msg * edge_weight.reshape((-1,) + (1,) * (msg.ndim - 1))
    if edge_mask is not None:
        msg = msg * edge_mask.astype(msg.dtype).reshape(
            (-1,) + (1,) * (msg.ndim - 1)
        )
    return segment_sum(msg, receivers, num_nodes,
                       indices_are_sorted=edges_receiver_sorted)


def gather_scatter_mean(
    node_feat: jnp.ndarray,
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    num_nodes: int,
    edge_mask: Optional[jnp.ndarray] = None,
    perm_by_sender: Optional[jnp.ndarray] = None,
    adjacency: Optional[jnp.ndarray] = None,
    gp: Optional[tuple] = None,
    window_hint: Optional[int] = None,
    bcsr=None,
    edges_receiver_sorted: bool = True,
) -> jnp.ndarray:
    """Mean-aggregated SpMM: gather_scatter_sum / in-degree (fused-kernel
    eligible, unlike gathering then segment_mean)."""
    s = gather_scatter_sum(
        node_feat, senders, receivers, num_nodes,
        edge_mask=edge_mask, perm_by_sender=perm_by_sender,
        adjacency=adjacency, gp=gp, window_hint=window_hint, bcsr=bcsr,
        edges_receiver_sorted=edges_receiver_sorted,
    )
    cnt = degree(receivers, num_nodes, edge_mask,
                 indices_are_sorted=edges_receiver_sorted)
    cnt = jnp.maximum(cnt, 1.0).reshape(
        (-1,) + (1,) * (node_feat.ndim - 1)
    )
    return s / cnt.astype(s.dtype)
