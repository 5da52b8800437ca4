"""Pallas TPU kernel: FUSED SpMM — out[i] = sum_e w_e * x[senders_e] — as
adjacency-block matmuls on the MXU, with no [E, F] intermediate in HBM.

This fuses the two halves of the message-aggregation hot path (the gather and
the segment reduction of PyG's ``MessagePassing.propagate`` contract — ref:
hydragnn/models/Base.py conv loop, torch_scatter at Base.py:18) into ONE
kernel. The unfused pipeline (ops/pallas_gather.py + ops/pallas_segment.py)
moves the [E, F] message array through HBM twice (write after gather, read
before reduce) and spends 2*E*max(R,W)*F MXU FLOPs per one-hot matmul. The
fused form exploits that both one-hots are contracted over the same edge
axis:

    out[rows R] += OneHotRecv[R, T] @ (w ⊙ OneHotSend)[T, W] @ x_window[W, F]
                 = A[R, W] @ x_window[W, F]        per edge tile T

where A is the (weighted) adjacency block between the tile's receiver rows
and its sender window — tiny (R_SUB x W), computed on the MXU from the two
one-hots at 2*R_SUB*T*W FLOPs, then applied to the node-feature window at
2*R_SUB*W*F. For avg-degree-16 molecular batches this is ~4x fewer MXU FLOPs
and ~10x less HBM traffic than gather+reduce (node windows stream once
instead of E message rows twice).

Locality contract (same as pallas_gather.py): collate assigns each graph a
contiguous node-id range and sorts edges by receiver, so any T-edge tile's
senders span a bounded node window. Window bases are computed per tile on
device; one predicate checks every tile fits and falls back to the unfused
XLA path otherwise (``lax.cond``) — the kernel is always correct, locality
only affects speed.

Precision: one-hots are exact in bf16; A is accumulated in fp32 on the MXU.
A itself and x are then split into bf16 mantissa chunks (A: 2 chunks — exact
for edge-multiplicity counts < 2^16 and for 16-bit-split weights; x: 3 chunks
= exact fp32), giving products bit-equivalent to an fp32 matmul with fp32
accumulation. Weights (edge masks are weights ∈ {0,1}) multiply into the
receiver one-hot per bf16 chunk; ``weight_passes=2`` reconstructs fp32
weights exactly, ``1`` suffices for 0/1 masks.

Backward: dx[s] = sum_e w_e g[recv_e] is the same fused op with the edge
roles swapped and edges re-sorted by sender (host-precomputed
``edge_perm_by_sender``); dw_e = <g[r_e], x[s_e]> is an SDDMM evaluated with
plain gathers (only when weights require gradients).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
# defaults from the on-chip sweep (bench/fused_spmm_sweep.py, v5e, E=2.1M
# F=128 deg-16 batched graphs): T=1024 beats 2048/512 (3.46 ms vs 3.9/4.0);
# kernel cost scales ~linearly with the window width (the A-build matmul and
# the one-hot construction are both ∝ W·E), so the default is a runtime
# CASCADE over window widths: W=160 (covers graphs to ~128 nodes) → W=256
# (graphs to ~224 nodes) → unfused XLA fallback. One predicate per width
# checks every edge tile's sender span; `lax.cond` dispatches to the
# tightest kernel that fits. For mask/unit weights (w_passes=1) the A-build
# runs in int8 on the MXU (2x bf16 rate, int32 accumulation — exact edge
# multiplicities): W=160 2.65 ms vs 3.07 bf16, W=256 2.88 vs 3.47 —
# 784 Medges/s = 0.529 of HBM speed-of-light end-to-end (bench.py).
ROW_BLOCK = 1024  # output rows per program
EDGE_TILE = 1024  # edges per inner tile
WINDOW = (160, 256)  # sender-window cascade (int = single fixed window)
R_SUB = 64  # receiver-window rows per adjacency block
ALIGN = 32  # window base alignment (covers f32 [8,128] and bf16 [16,128])
X_PASSES = 3  # bf16 split terms for x (3 = exact fp32)
A_PASSES = 2  # bf16 split terms for the adjacency block
NBUF = 4  # DMA pipeline depth
F_CHUNK = 256  # max feature width per pallas call (bounds VMEM scratch)


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


# widths collate may pin via GraphBatch.spmm_window: the default cascade plus
# wide single-window variants for RCM-ordered giant graphs (data/ordering.py).
# Periodic lattices need ~2x the RCM bandwidth (senders of a receiver run
# reach both directions): 2D Moore lattices land at 4096. Wide windows drop
# the DMA pipeline depth to 2, chunk the window in 1024-row pieces inside
# the kernel (one-hot temporaries stay narrow-window sized), and cap the
# feature chunk at 128 so VMEM holds. Measured v5e (bench/giant_graph_spmm
# .py, 131k-node 2D Moore lattice, RCM-ordered): W=4096 fused 11.0 ms vs
# 15.4 ms unfused (1.4x). W=8192 compiles and is correct but the A-build
# cost (∝ W) loses ~2x to the unfused pipeline (13k-node 3D Moore), so the
# hint table stops at 4096 — wider graphs take the unfused path.
HINT_WIDTHS = (160, 256, 512, 1024, 2048, 4096)
WIDE_WINDOW = 2048  # >= this: NBUF=2, window chunking, F chunk 128


def required_window(
    senders: "np.ndarray",
    num_nodes: int,
    widths: tuple = HINT_WIDTHS,
    edge_tile: int = EDGE_TILE,
    row_block: int = ROW_BLOCK,
    align: int = ALIGN,
) -> int:
    """Host-side: smallest cascade width whose sender window covers every
    edge tile of this (receiver-sorted) edge list, or -1 when none fits.

    Replicates the kernel's own padding/alignment arithmetic
    (``_spmm_fused_impl``) so a positive answer guarantees the runtime
    predicate passes and the single pinned-window kernel never falls back.
    Called by ``graph.collate`` to set the static ``GraphBatch.spmm_window``
    hint (bounded retrace: at most ``len(widths)+2`` variants).
    """
    s = np.asarray(senders, dtype=np.int64)
    E = int(s.shape[0])
    if E == 0:
        return int(widths[0])
    E_pad = _round_up(E, edge_tile)
    if E_pad != E:
        s = np.concatenate([s, np.broadcast_to(s[-1:], (E_pad - E,))])
    st = s.reshape(-1, edge_tile)
    mn = st.min(axis=1)
    mx = st.max(axis=1)
    for w in widths:
        n_pad = _round_up(max(_round_up(num_nodes, row_block), w), row_block)
        base = np.clip((mn // align) * align, 0, max(n_pad - w, 0))
        if (mx - base < w).all():
            return int(w)
    return -1


def _split_bf16(v, passes):
    """Exact bf16 mantissa-chunk decomposition of an fp32 array."""
    terms = []
    rem = v
    for _ in range(passes):
        t = rem.astype(jnp.bfloat16)
        rem = rem - t.astype(jnp.float32)
        terms.append(t)
    return terms


def _fused_kernel(
    row_ptr_ref,  # scalar prefetch: [num_blocks + 1] edge offsets per block
    sbase_ref,  # scalar prefetch: [num_tiles] sender-window base per tile
    send_ref,  # [E_pad // 128, 128] int32 (HBM)
    recv_ref,  # [E_pad // 128, 128] int32 (HBM)
    w_ref,  # [E_pad // 128, 128] f32 (HBM)
    x_ref,  # [N_pad, F] float (HBM)
    out_ref,  # [row_block, F] (VMEM)
    acc_ref,  # [row_block, F] f32 VMEM scratch
    x_scratch,  # [NBUF, window, F] VMEM
    send_scratch,  # [NBUF, sub, 128] VMEM
    recv_scratch,  # [NBUF, sub, 128] VMEM
    w_scratch,  # [NBUF, sub, 128] VMEM
    sems,  # DMA sems [NBUF, 4]
    *,
    row_block: int,
    edge_tile: int,
    window: int,
    x_passes: int,
    a_passes: int,
    w_passes: int,
    r_sub: int = R_SUB,
    a_int8: bool = False,
    nbuf: int = NBUF,
):
    sub = edge_tile // LANES
    b = pl.program_id(0)
    start = row_ptr_ref[b]
    end = row_ptr_ref[b + 1]
    row_base = b * row_block
    t0 = start // edge_tile
    t1 = jnp.maximum(pl.cdiv(end, edge_tile), t0)

    def get_dma(slot, t):
        base = pl.multiple_of(sbase_ref[t], ALIGN)
        return (
            pltpu.make_async_copy(
                x_ref.at[pl.ds(base, window), :],
                x_scratch.at[slot],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                send_ref.at[pl.ds(t * sub, sub), :],
                send_scratch.at[slot],
                sems.at[slot, 1],
            ),
            pltpu.make_async_copy(
                recv_ref.at[pl.ds(t * sub, sub), :],
                recv_scratch.at[slot],
                sems.at[slot, 2],
            ),
            pltpu.make_async_copy(
                w_ref.at[pl.ds(t * sub, sub), :],
                w_scratch.at[slot],
                sems.at[slot, 3],
            ),
        )

    for k in range(nbuf - 1):
        @pl.when(t0 + k < t1)
        def _(k=k):
            for d in get_dma(k, t0 + k):
                d.start()

    acc_ref[:] = jnp.zeros((row_block, out_ref.shape[1]), jnp.float32)
    # wide windows are processed in 1024-row chunks so the one-hot / x-split
    # temporaries stay at narrow-window size (whole-window [W, T] one-hots at
    # W=4096 overflow the scoped VMEM stack)
    w_chunk = min(window, 1024)
    n_chunks = window // w_chunk
    assert window % w_chunk == 0
    win_rows = jax.lax.broadcasted_iota(jnp.int32, (r_sub, LANES), 0)
    send_rows = jax.lax.broadcasted_iota(jnp.int32, (w_chunk, LANES), 0)
    fp32_in = x_ref.dtype == jnp.float32
    # int8 A-build: one-hots and 0/1 mask weights are exact in int8; the MXU
    # runs int8 matmuls at 2x bf16 throughput and accumulates in int32, so
    # the adjacency block (integer edge multiplicities) is exact. Only valid
    # for w_passes == 1 with integer-valued weights (masks / unit weights).
    oh_dtype = jnp.int8 if a_int8 else jnp.bfloat16

    def body(t, _):
        slot = jax.lax.rem(t - t0, nbuf)
        nxt = jax.lax.rem(t - t0 + nbuf - 1, nbuf)

        @pl.when(t + nbuf - 1 < t1)
        def _():
            for d in get_dma(nxt, t + nbuf - 1):
                d.start()

        for d in get_dma(slot, t):
            d.wait()

        send_tile = send_scratch[slot]  # [sub, 128]
        recv_tile = recv_scratch[slot]
        w_tile = w_scratch[slot]  # [sub, 128] f32
        sbase = sbase_ref[t]

        def build_oh_s(wbase):
            # sender one-hot [w_chunk, T]: column e is 1 at row
            # senders[e] - sbase - wbase (if it lands in this chunk)
            return jnp.concatenate(
                [
                    (
                        send_rows + (sbase + wbase)
                        == send_tile[si : si + 1, :]
                    ).astype(oh_dtype)
                    for si in range(sub)
                ],
                axis=1,
            )

        def x_chunk_terms(wc):
            if n_chunks == 1:
                xw = x_scratch[slot]
            else:
                xw = x_scratch[slot, wc * w_chunk : (wc + 1) * w_chunk, :]
            if fp32_in and x_passes > 1:
                return _split_bf16(xw, x_passes)
            return [xw.astype(jnp.bfloat16)]

        if w_passes > 1:
            w_terms = _split_bf16(w_tile, w_passes)
        elif a_int8:
            # weights stay int32: Mosaic has no i8 multiply, so the weight
            # folds into the one-hot via an i32 select, then casts to i8
            w_terms = [w_tile.astype(jnp.int32)]
        else:
            w_terms = [w_tile.astype(oh_dtype)]

        # narrow windows: hoist the single sender one-hot / x split out of
        # the receiver-window loop (built once per edge tile)
        if n_chunks == 1:
            oh_s_hoisted = build_oh_s(0)
            x_terms_hoisted = x_chunk_terms(0)

        # this tile's receiver row span within the block (sorted receivers)
        lo = jnp.clip(recv_tile[0, 0] - row_base, 0, row_block - r_sub)
        hi = jnp.clip(
            recv_tile[sub - 1, LANES - 1] - row_base, 0, row_block - 1
        )
        lo = (lo // r_sub) * r_sub
        n_win = jnp.clip((hi - lo) // r_sub + 1, 1, row_block // r_sub)
        acc_dt = jnp.int32 if a_int8 else jnp.float32

        def win_body(wi, _):
            off = lo + wi * r_sub
            # weighted receiver one-hots [r_sub, T]: chunk-independent
            oh_rs = []
            for wt in w_terms:
                if a_int8:
                    oh_r = jnp.concatenate(
                        [
                            jnp.where(
                                win_rows + row_base + off
                                == recv_tile[si : si + 1, :],
                                wt[si : si + 1, :],
                                0,
                            ).astype(jnp.int8)
                            for si in range(sub)
                        ],
                        axis=1,
                    )
                else:
                    oh_r = jnp.concatenate(
                        [
                            (
                                win_rows + row_base + off
                                == recv_tile[si : si + 1, :]
                            ).astype(oh_dtype)
                            * wt[si : si + 1, :]
                            for si in range(sub)
                        ],
                        axis=1,
                    )
                oh_rs.append(oh_r)

            part = jnp.zeros((r_sub, out_ref.shape[1]), jnp.float32)
            for wc in range(n_chunks):
                oh_s = oh_s_hoisted if n_chunks == 1 else build_oh_s(
                    wc * w_chunk
                )
                a = jnp.zeros((r_sub, w_chunk), acc_dt)
                for oh_r in oh_rs:
                    # adjacency block A[r_sub, Wc]: contract over edge axis
                    a = a + jax.lax.dot_general(
                        oh_r,
                        oh_s,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=acc_dt,
                    )
                # int32 multiplicities are exact in one bf16 term below 256
                a_terms = _split_bf16(a.astype(jnp.float32), a_passes)
                x_terms = (
                    x_terms_hoisted if n_chunks == 1 else x_chunk_terms(wc)
                )
                for at in a_terms:
                    for xt in x_terms:
                        part = part + jax.lax.dot_general(
                            at,
                            xt,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
            acc_ref[pl.ds(off, r_sub), :] = (
                acc_ref[pl.ds(off, r_sub), :] + part
            )
            return 0

        jax.lax.fori_loop(0, n_win, win_body, 0)
        return 0

    jax.lax.fori_loop(t0, t1, body, 0)
    out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _spmm_pallas(
    x_pad, send_pad, recv_pad, w_pad, sbases, num_blocks,
    row_block, edge_tile, window, x_passes, a_passes, w_passes,
    r_sub=R_SUB, a_int8=False,
):
    # wide windows (RCM-ordered giant graphs): shallower DMA pipeline so the
    # x-window scratch stays within VMEM
    nbuf = 2 if window >= WIDE_WINDOW else NBUF
    E_pad = send_pad.shape[0]
    F = x_pad.shape[1]
    N_pad = num_blocks * row_block

    block_rows = jnp.arange(num_blocks + 1, dtype=jnp.int32) * row_block
    row_ptr = jnp.searchsorted(recv_pad, block_rows, side="left").astype(
        jnp.int32
    )
    row_ptr = jnp.minimum(row_ptr, E_pad)

    send2d = send_pad.reshape(E_pad // LANES, LANES)
    recv2d = recv_pad.reshape(E_pad // LANES, LANES)
    w2d = w_pad.reshape(E_pad // LANES, LANES)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # send
            pl.BlockSpec(memory_space=pl.ANY),  # recv
            pl.BlockSpec(memory_space=pl.ANY),  # w
            pl.BlockSpec(memory_space=pl.ANY),  # x
        ],
        out_specs=pl.BlockSpec(
            (row_block, F), lambda b, *_: (b, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((row_block, F), jnp.float32),
            pltpu.VMEM((nbuf, window, F), x_pad.dtype),
            pltpu.VMEM((nbuf, edge_tile // LANES, LANES), jnp.int32),
            pltpu.VMEM((nbuf, edge_tile // LANES, LANES), jnp.int32),
            pltpu.VMEM((nbuf, edge_tile // LANES, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((nbuf, 4)),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _fused_kernel,
            row_block=row_block,
            edge_tile=edge_tile,
            window=window,
            x_passes=x_passes,
            a_passes=a_passes,
            w_passes=w_passes,
            r_sub=r_sub,
            a_int8=a_int8,
            nbuf=nbuf,
        ),
        out_shape=jax.ShapeDtypeStruct((N_pad, F), x_pad.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * E_pad * (window + F) * R_SUB // 16,
            bytes_accessed=N_pad * F * 8 + E_pad * 12,
            transcendentals=0,
        ),
    )(row_ptr, sbases, send2d, recv2d, w2d, x_pad)


def _spmm_fused_impl(
    x: jnp.ndarray,
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    weights: jnp.ndarray,
    num_nodes: int,
    row_block: int = ROW_BLOCK,
    edge_tile: int = EDGE_TILE,
    window: int = WINDOW,
    x_passes: int = X_PASSES,
    a_passes: int = A_PASSES,
    w_passes: int = 1,
    r_sub: int = R_SUB,
    a_int8: bool = False,
):
    """out[i] = sum_{e: receivers[e]==i} weights[e] * x[senders[e]].

    ``receivers`` sorted ascending. ``window`` is an int (single fixed
    sender-window width) or a tuple of ascending widths: a runtime cascade
    dispatches to the tightest kernel whose window covers every edge tile's
    sender span. Falls back to XLA gather+segment_sum when no width fits.
    """
    E = senders.shape[0]
    N, F = x.shape
    windows = (window,) if isinstance(window, int) else tuple(window)
    # wide windows: narrower feature chunks keep the x-window VMEM scratch
    # bounded (nbuf * window * f_chunk * 4B)
    f_chunk = 128 if max(windows) >= WIDE_WINDOW else F_CHUNK
    if F > f_chunk:
        parts = [
            _spmm_fused_impl(
                x[:, i : i + f_chunk], senders, receivers, weights, num_nodes,
                row_block, edge_tile, windows, x_passes, a_passes, w_passes,
                r_sub=r_sub, a_int8=a_int8,
            )
            for i in range(0, F, f_chunk)
        ]
        return jnp.concatenate(parts, axis=-1)

    N_pad = max(_round_up(num_nodes, row_block), max(windows))
    N_pad = _round_up(N_pad, row_block)
    E_pad = _round_up(E, edge_tile)
    num_blocks = N_pad // row_block

    x_pad = jnp.pad(x, ((0, N_pad - N), (0, 0))) if N_pad != N else x
    if E_pad != E:
        # pad senders with the last real sender (keeps windows tight),
        # receivers with an out-of-range sentinel, weights with 0
        send_pad = jnp.concatenate(
            [senders, jnp.broadcast_to(senders[-1:], (E_pad - E,))]
        ).astype(jnp.int32)
        recv_pad = jnp.pad(
            receivers, (0, E_pad - E), constant_values=np.int32(2**31 - 2)
        ).astype(jnp.int32)
        w_pad = jnp.pad(weights.astype(jnp.float32), (0, E_pad - E))
    else:
        send_pad = senders.astype(jnp.int32)
        recv_pad = receivers.astype(jnp.int32)
        w_pad = weights.astype(jnp.float32)

    st = send_pad.reshape(E_pad // edge_tile, edge_tile)
    mn = jnp.min(st, axis=1)
    mx = jnp.max(st, axis=1)

    def fallback():
        # sender locality violated (e.g. one giant graph): the adjacency
        # block would be too wide to pay off, so run the unfused pipeline —
        # XLA gather + the CSR segment-sum kernel (ops/pallas_segment.py)
        from hydragnn_tpu.ops.pallas_segment import segment_sum_auto

        msgs = x_pad[send_pad] * w_pad[:, None].astype(x_pad.dtype)
        return segment_sum_auto(msgs, recv_pad, N_pad)

    out = fallback
    for w_width in reversed(windows):
        sbases = jnp.clip(
            (mn // ALIGN) * ALIGN, 0, max(N_pad - w_width, 0)
        ).astype(jnp.int32)
        ok = jnp.all(mx - sbases < w_width)
        out = functools.partial(
            jax.lax.cond,
            ok,
            lambda sb=sbases, ww=w_width: _spmm_pallas(
                x_pad, send_pad, recv_pad, w_pad, sb, num_blocks,
                row_block, edge_tile, ww, x_passes, a_passes, w_passes,
                r_sub=r_sub, a_int8=a_int8,
            ),
            out,
        )
    return out()[:num_nodes]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def spmm_onehot(
    x: jnp.ndarray,
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    weights: jnp.ndarray,
    perm_by_sender: jnp.ndarray,
    num_nodes: int,
    diff_weights: bool = False,
    w_passes: int = 1,
    windows: Optional[tuple] = None,
):
    """Fused weighted SpMM with kernel-fast backward.

    out[i] = sum_{e: receivers[e]==i} weights[e] * x[senders[e]].
    ``receivers`` must be sorted ascending; ``perm_by_sender`` sorts edges by
    sender (GraphBatch.edge_perm_by_sender) so the backward runs the same
    fused kernel. Set ``diff_weights=True`` to also get d/d(weights) (SDDMM);
    leave False for masks. ``w_passes=1`` is exact for 0/1 masks; use 2 for
    real-valued fp32 weights. ``windows`` overrides the sender-window
    cascade (e.g. the single collate-pinned width from
    ``GraphBatch.spmm_window``); None = module default.
    """
    # mask/unit weights (w_passes=1): A holds integer multiplicities, exact
    # in ONE bf16 term for multiplicity < 256; fp32 weights need 2 terms
    return _spmm_fused_impl(
        x, senders, receivers, weights, num_nodes, w_passes=w_passes,
        a_passes=1 if w_passes == 1 else A_PASSES, a_int8=w_passes == 1,
        window=windows or WINDOW,
    )


def _fwd(x, senders, receivers, weights, perm, num_nodes, diff_weights,
         w_passes, windows):
    # re-entrant (see pallas_segment._fwd note): keeps the pallas_call
    # custom_vjp-protected when an outer AD trace replays this rule
    out = spmm_onehot(
        x, senders, receivers, weights, perm, num_nodes, diff_weights,
        w_passes, windows,
    )
    res = (x if diff_weights else None, senders, receivers, weights, perm)
    return out, res


def _bwd(num_nodes, diff_weights, w_passes, windows, res, g):
    x, senders, receivers, weights, perm = res
    # dx[s] = sum over outgoing edges of w_e * g[r]: the same fused op with
    # the edge direction flipped, edges sorted by sender. A collate-pinned
    # window covers BOTH directions (required_window is checked on the
    # receiver-sorted and sender-sorted lists); the runtime predicate still
    # guards correctness regardless.
    dx = _spmm_fused_impl(
        g, receivers[perm], senders[perm], weights[perm], num_nodes,
        w_passes=w_passes, a_passes=1 if w_passes == 1 else A_PASSES,
        a_int8=w_passes == 1, window=windows or WINDOW,
    )
    if diff_weights:
        dw = jnp.sum(g[receivers] * x[senders], axis=-1)
    else:
        dw = jnp.zeros_like(weights)
    return (dx, None, None, dw, None)


spmm_onehot.defvjp(_fwd, _bwd)


def spmm_fused_auto(
    x: jnp.ndarray,
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    num_nodes: int,
    weights: Optional[jnp.ndarray] = None,
    edge_mask: Optional[jnp.ndarray] = None,
    perm_by_sender: Optional[jnp.ndarray] = None,
    window_hint: Optional[int] = None,
) -> Optional[jnp.ndarray]:
    """Route an SpMM through the fused adjacency kernel when eligible;
    returns None when the unfused path should be used instead.
    ``window_hint`` (GraphBatch.spmm_window, set by collate): a positive
    width pins a single verified sender window (giant RCM-ordered graphs use
    512/1024 instead of falling back); -1 means no width fits, skip the
    kernel entirely. ``HYDRAGNN_TPU_FUSED_SPMM=0`` disables the route (A/B +
    debugging)."""
    import os

    if os.environ.get("HYDRAGNN_TPU_FUSED_SPMM", "1") == "0":
        return None
    if window_hint is not None and window_hint < 0:
        return None
    eligible = (
        x.ndim == 2
        and x.shape[1] % LANES == 0
        and x.dtype in (jnp.float32, jnp.bfloat16)
        and perm_by_sender is not None
        and senders.shape[0] >= 2 * EDGE_TILE
        and jax.default_backend() not in ("cpu", "gpu")
    )
    if not eligible:
        return None
    w = None
    diff_weights = False
    w_passes = 1
    if weights is not None:
        w = weights.astype(jnp.float32)
        diff_weights = True
        w_passes = 2
    if edge_mask is not None:
        m = edge_mask.astype(jnp.float32)
        w = m if w is None else w * m
    if w is None:
        w = jnp.ones(senders.shape, jnp.float32)
    windows = (int(window_hint),) if window_hint else None
    return spmm_onehot(
        x, senders, receivers, w, perm_by_sender, num_nodes, diff_weights,
        w_passes, windows,
    )
