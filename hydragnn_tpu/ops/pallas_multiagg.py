"""Pallas TPU kernel: fused multi-aggregator segment reduction.

THE hot path of PNA-family stacks: PyG's ``DegreeScalerAggregation`` with
aggregators [mean, min, max, std] (ref: hydragnn/models/PNAPlusStack.py:
144-304, PNAEqStack.py:103 — both delegate to torch_scatter's four separate
scatter kernels). The unfused jax path costs FIVE passes over the [E, F]
edge messages (sum, count, min, max, sum-of-squares — the last with an
extra [E, F] ``h*h`` HBM materialization) of which min/max lower to XLA's
~6%-of-SoL scatter; at the GFM shape ([132k, 866]) that is the 0.08-MFU
bottleneck of round 4 (bench/results/train_step_r4.md).

This kernel computes per-segment (sum, sum_sq, max, min) in ONE read of the
messages:

- sum / sum_sq: windowed one-hot MXU matmuls (the v2 design of
  ops/pallas_segment.py), with ``h*h`` formed in VMEM — never in HBM.
- max / min: a flag-based segmented Hillis-Steele scan along the
  (receiver-sorted) edge axis — ``ceil(log2(max_run))`` shifted-select
  steps, the step count gated at runtime by the prefetched max segment
  length — followed by a "select the last edge of each segment" one-hot
  matmul: after an inclusive prefix-max, the value at a segment's last
  edge IS the segment max, and the last-edge one-hot has exactly one 1
  per row, so a SUM matmul performs the selection on the MXU. Runs
  crossing edge-tile boundaries are stitched with a [1, F] carry merged
  into row 0 of the next tile before its scan.

Layout note: the scan runs in the message layout ([T, F] with the edge
axis on sublanes), but the segment-head flags are naturally computed in
the id layout ([T/128, 128] with edges along lanes). Mosaic cannot
relayout lanes->sublanes directly; since the flags are 0/1 they are moved
EXACTLY with two small bf16 one-hot matmuls (sublane-group select
[T, sub] @ [sub, 128], then lane select + ones-matmul lane broadcast) —
~0.1% of the kernel's MXU work.

Precision: fp32 inputs split into 3 bf16 mantissa terms per matmul operand
(exact fp32, see ops/pallas_segment.py); the scans compare/select in fp32
(exact for both input dtypes). bf16 inputs select exactly and accumulate
sums in fp32.

Contract: ``segment_ids`` ascending; masked/padded edges carry an
out-of-range sentinel id (the wrapper in ops/segment.pna_aggregate remaps
them) and their data rows must be FINITE (they ride through matmuls
multiplied by a 0 one-hot).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
NBUF = 4
R_SUB = 64
PASSES = 3
F_CHUNK = 256  # feature tile per grid step (wider DMA rows; VMEM-bounded)
MAX_SCAN_STEPS = 11  # supports runs (segment lengths) up to 2**11 per tile


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _split_terms(tile, passes):
    if tile.dtype == jnp.float32 and passes > 1:
        terms = []
        rem = tile
        for _ in range(passes):
            t_ = rem.astype(jnp.bfloat16)
            rem = rem - t_.astype(jnp.float32)
            terms.append(t_)
        return terms
    return [tile.astype(jnp.bfloat16)]


def _multiagg_kernel(
    row_ptr_ref,  # scalar prefetch: [nb + 1] first edge per row block
    maxrun_ref,  # scalar prefetch: [1] max segment length (scan step gate)
    tile_first_ref,  # scalar prefetch: [nt + 1] first id of each edge tile
    recv_ref,  # [E_pad // 128, 128] int32 (HBM)
    msgs_ref,  # [E_pad, F] float (HBM)
    sum_ref,  # [row_block, F] out
    sq_ref,
    mx_ref,
    mn_ref,
    asum_ref,  # [row_block, F] f32 scratch accumulators
    asq_ref,
    amx_ref,
    amn_ref,
    vmax_ref,  # [edge_tile, F] scan values
    vmin_ref,
    fscan_ref,  # [edge_tile, F] scan head flags (0/1 f32)
    cmax_ref,  # [1, F] cross-tile run carry
    cmin_ref,
    msg_scratch,  # [NBUF, edge_tile, F]
    recv_scratch,  # [NBUF, sub, 128]
    sems,  # DMA sems [NBUF, 2]
    *,
    row_block: int,
    edge_tile: int,
    passes: int,
    col0: int = 0,
):
    sub = edge_tile // LANES
    j = pl.program_id(0)  # feature chunk (in-kernel strided column DMA —
    # no [E, F_CHUNK] slice copies in HBM)
    b = pl.program_id(1)  # row block
    start = row_ptr_ref[b]
    end = row_ptr_ref[b + 1]
    row_base = b * row_block
    t0 = start // edge_tile
    t1 = jnp.maximum(pl.cdiv(end, edge_tile), t0)
    maxrun = maxrun_ref[0]
    F = sum_ref.shape[1]
    T = edge_tile

    def get_dma(slot, t):
        off = pl.multiple_of(t * edge_tile, edge_tile)
        return (
            pltpu.make_async_copy(
                msgs_ref.at[pl.ds(off, edge_tile), pl.ds(col0 + j * F, F)],
                msg_scratch.at[slot],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                recv_ref.at[pl.ds(t * sub, sub), :],
                recv_scratch.at[slot],
                sems.at[slot, 1],
            ),
        )

    for k in range(NBUF - 1):
        @pl.when(t0 + k < t1)
        def _(k=k):
            for d in get_dma(k, t0 + k):
                d.start()

    for ref in (asum_ref, asq_ref, amx_ref, amn_ref):
        ref[:] = jnp.zeros((row_block, F), jnp.float32)
    cmax_ref[:] = jnp.zeros((1, F), cmax_ref.dtype)
    cmin_ref[:] = jnp.zeros((1, F), cmin_ref.dtype)

    win_rows = jax.lax.broadcasted_iota(jnp.int32, (R_SUB, LANES), 0)
    # static one-hots for the 0/1-exact lanes->sublanes flag relayout
    rowsel = (
        jax.lax.broadcasted_iota(jnp.int32, (T, sub), 0) // LANES
        == jax.lax.broadcasted_iota(jnp.int32, (T, sub), 1)
    ).astype(jnp.bfloat16)  # [T, sub]
    lanesel = (
        jax.lax.broadcasted_iota(jnp.int32, (T, LANES), 0) % LANES
        == jax.lax.broadcasted_iota(jnp.int32, (T, LANES), 1)
    ).astype(jnp.bfloat16)  # [T, 128]
    ones128 = jnp.ones((LANES, F), jnp.bfloat16)

    def body(t, carry_id):
        slot = jax.lax.rem(t - t0, NBUF)
        nxt = jax.lax.rem(t - t0 + NBUF - 1, NBUF)

        @pl.when(t + NBUF - 1 < t1)
        def _():
            for d in get_dma(nxt, t + NBUF - 1):
                d.start()

        for d in get_dma(slot, t):
            d.wait()

        recv_tile = recv_scratch[slot]  # [sub, 128]
        msgs_tile = msg_scratch[slot]  # [T, F]
        sdt = jnp.float32

        # ---- segment-head flags, id layout ----
        # prev id in edge order via rolls + iota masks (Mosaic cannot
        # concat offset-layout [., 1] slices): lane-roll wraps within a
        # sublane row; lane 0 instead takes the previous row's lane 127
        # (sublane-rolled), and position (0, 0) takes the cross-tile carry
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (sub, LANES), 1)
        sub_i = jax.lax.broadcasted_iota(jnp.int32, (sub, LANES), 0)
        r1 = pltpu.roll(recv_tile, 1, axis=1)  # [si, 0] = id[si, 127]
        r1s = pltpu.roll(r1, 1, axis=0)  # [si, 0] = id[si-1, 127]
        prev_ids = jnp.where(lane_i == 0, r1s, r1)
        prev_ids = jnp.where(
            (lane_i == 0) & (sub_i == 0), carry_id, prev_ids
        )
        heads_sub = (recv_tile != prev_ids).astype(jnp.bfloat16)

        # relayout heads to the value layout [T, F]: row-group select then
        # lane select + lane-broadcast (exact for 0/1 in one bf16 pass)
        grp = jax.lax.dot_general(
            rowsel, heads_sub,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [T, 128]: row p holds heads_sub[p//128, :]
        heads_val = jax.lax.dot_general(
            (grp * lanesel).astype(jnp.bfloat16), ones128,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [T, F]: every lane of row p = head flag of edge p

        # ---- segmented scans (max / min) ----
        # scans run in f32 regardless of input dtype (bf16 compare/select
        # vectors are not supported by Mosaic; f32 is selection-exact for
        # both input dtypes)
        vmax_ref[:] = msgs_tile.astype(jnp.float32)
        vmin_ref[:] = msgs_tile.astype(jnp.float32)
        fscan_ref[:] = heads_val
        # merge the cross-tile carry into row 0 (the scan propagates it
        # through the rest of the first run)
        first_id = recv_tile[0, 0]

        @pl.when(first_id == carry_id)
        def _():
            vmax_ref[0:1, :] = jnp.maximum(vmax_ref[0:1, :], cmax_ref[:])
            vmin_ref[0:1, :] = jnp.minimum(vmin_ref[0:1, :], cmin_ref[:])

        for k in range(MAX_SCAN_STEPS):
            d = 1 << k
            if d >= edge_tile:
                break

            @pl.when(d < maxrun)
            def _(d=d):
                notseg = fscan_ref[:] == 0.0  # no head in (p-d, p]
                # +-inf fills are safe: they only appear inside max/min
                # (max(v, -inf) = v), never in a stored value or matmul
                shx = jnp.concatenate(
                    [
                        jnp.full((d, F), -jnp.inf, sdt),
                        vmax_ref[: T - d, :],
                    ],
                    axis=0,
                )
                vmax_ref[:] = jnp.where(
                    notseg, jnp.maximum(vmax_ref[:], shx), vmax_ref[:]
                )
                shn = jnp.concatenate(
                    [
                        jnp.full((d, F), jnp.inf, sdt),
                        vmin_ref[: T - d, :],
                    ],
                    axis=0,
                )
                vmin_ref[:] = jnp.where(
                    notseg, jnp.minimum(vmin_ref[:], shn), vmin_ref[:]
                )
                fsh = jnp.concatenate(
                    [
                        jnp.ones((d, F), fscan_ref.dtype),
                        fscan_ref[: T - d, :],
                    ],
                    axis=0,
                )
                fscan_ref[:] = jnp.maximum(fscan_ref[:], fsh)

        # update carry for the next tile
        cmax_ref[:] = vmax_ref[T - 1 : T, :]
        cmin_ref[:] = vmin_ref[T - 1 : T, :]
        new_carry = recv_tile[sub - 1, LANES - 1]

        # ---- last-edge flags in id layout (same roll construction) ----
        # negative shifts are disallowed: roll by size-1 instead
        n1 = pltpu.roll(recv_tile, LANES - 1, axis=1)  # [si,127] = id[si,0]
        n1s = pltpu.roll(n1, sub - 1, axis=0)  # [si, 127] = id[si+1, 0]
        nxt_ids = jnp.where(lane_i == LANES - 1, n1s, n1)
        nxt_ids = jnp.where(
            (lane_i == LANES - 1) & (sub_i == sub - 1),
            tile_first_ref[t + 1],
            nxt_ids,
        )
        is_last = recv_tile != nxt_ids  # [sub, 128]

        # ---- per-tile matmul operand splits ----
        sum_terms = _split_terms(msgs_tile, passes)
        hh = msgs_tile.astype(jnp.float32)
        hh = hh * hh
        if msgs_tile.dtype != jnp.float32:
            hh = hh.astype(msgs_tile.dtype)
        sq_terms = _split_terms(hh, passes)
        # scans ran in f32; for bf16 inputs the scanned values are exactly
        # representable in bf16, one selection pass suffices
        if msgs_tile.dtype == jnp.float32:
            mx_terms = _split_terms(vmax_ref[:], passes)
            mn_terms = _split_terms(vmin_ref[:], passes)
        else:
            mx_terms = [vmax_ref[:].astype(jnp.bfloat16)]
            mn_terms = [vmin_ref[:].astype(jnp.bfloat16)]

        # ---- windowed one-hot matmuls ----
        lo = jnp.clip(recv_tile[0, 0] - row_base, 0, row_block - R_SUB)
        hi = jnp.clip(
            recv_tile[sub - 1, LANES - 1] - row_base, 0, row_block - 1
        )
        lo = (lo // R_SUB) * R_SUB
        n_win = jnp.clip((hi - lo) // R_SUB + 1, 1, row_block // R_SUB)

        def win_body(w, _):
            off = lo + w * R_SUB
            oh_pieces = []
            ohl_pieces = []
            for si in range(sub):
                m = win_rows + row_base + off == recv_tile[si : si + 1, :]
                oh_pieces.append(m.astype(jnp.bfloat16))
                ohl_pieces.append(
                    (m & is_last[si : si + 1, :]).astype(jnp.bfloat16)
                )
            onehot = jnp.concatenate(oh_pieces, axis=1)  # [R_SUB, T]
            onehot_l = jnp.concatenate(ohl_pieces, axis=1)

            def mm(oh, terms):
                part = jnp.zeros((R_SUB, F), jnp.float32)
                for term in terms:
                    part = part + jax.lax.dot_general(
                        oh,
                        term,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                return part

            sl = pl.ds(off, R_SUB)
            asum_ref[sl, :] = asum_ref[sl, :] + mm(onehot, sum_terms)
            asq_ref[sl, :] = asq_ref[sl, :] + mm(onehot, sq_terms)
            # a row's last edge lives in exactly one tile: contributions
            # across tiles are disjoint, so += performs the selection
            amx_ref[sl, :] = amx_ref[sl, :] + mm(onehot_l, mx_terms)
            amn_ref[sl, :] = amn_ref[sl, :] + mm(onehot_l, mn_terms)
            return 0

        jax.lax.fori_loop(0, n_win, win_body, 0)
        return new_carry

    jax.lax.fori_loop(t0, t1, body, jnp.int32(-1))
    sum_ref[:] = asum_ref[:].astype(sum_ref.dtype)
    sq_ref[:] = asq_ref[:].astype(sq_ref.dtype)
    mx_ref[:] = amx_ref[:].astype(mx_ref.dtype)
    mn_ref[:] = amn_ref[:].astype(mn_ref.dtype)


def _multiagg_impl(
    msgs,
    receivers,
    num_nodes,
    max_run,
    row_block: int = 512,
    edge_tile: int = 2048,
    passes: int = PASSES,
    col0: int = 0,
    width: int = 0,
    fc: int = F_CHUNK,
):
    E, F_all = msgs.shape
    width = width or F_all
    F = width
    fc = min(fc, F)
    assert F % fc == 0, (F, fc)
    # f32 scan scratches + split-term temporaries bound VMEM
    edge_tile = max(256, edge_tile // (2 * (fc // 128)))
    nf = F // fc
    N_pad = _round_up(num_nodes, row_block)
    E_pad = _round_up(E, edge_tile)
    num_blocks = N_pad // row_block
    if E_pad != E:
        msgs = jnp.pad(msgs, ((0, E_pad - E), (0, 0)))
        receivers = jnp.pad(
            receivers, (0, E_pad - E), constant_values=np.int32(2**31 - 2)
        )
    receivers = receivers.astype(jnp.int32)
    block_rows = jnp.arange(num_blocks + 1, dtype=jnp.int32) * row_block
    row_ptr = jnp.searchsorted(receivers, block_rows, side="left").astype(
        jnp.int32
    )
    row_ptr = jnp.minimum(row_ptr, E_pad)
    recv2d = receivers.reshape(E_pad // LANES, LANES)
    tile_first = jnp.concatenate(
        [
            receivers[:: edge_tile],
            jnp.full((1,), np.int32(2**31 - 2), jnp.int32),
        ]
    )
    maxrun = jnp.minimum(max_run, edge_tile).astype(jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nf, num_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # recv2d
            pl.BlockSpec(memory_space=pl.ANY),  # msgs
        ],
        out_specs=[
            pl.BlockSpec(
                (row_block, fc), lambda j, b, *_: (b, j),
                memory_space=pltpu.VMEM,
            )
        ]
        * 4,
        scratch_shapes=[
            pltpu.VMEM((row_block, fc), jnp.float32),  # asum
            pltpu.VMEM((row_block, fc), jnp.float32),  # asq
            pltpu.VMEM((row_block, fc), jnp.float32),  # amx
            pltpu.VMEM((row_block, fc), jnp.float32),  # amn
            pltpu.VMEM((edge_tile, fc), jnp.float32),  # vmax
            pltpu.VMEM((edge_tile, fc), jnp.float32),  # vmin
            pltpu.VMEM((edge_tile, fc), jnp.float32),  # fscan
            pltpu.VMEM((1, fc), jnp.float32),  # cmax
            pltpu.VMEM((1, fc), jnp.float32),  # cmin
            pltpu.VMEM((NBUF, edge_tile, fc), msgs.dtype),
            pltpu.VMEM((NBUF, edge_tile // LANES, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((NBUF, 2)),
        ],
    )
    shp = jax.ShapeDtypeStruct((N_pad, F), msgs.dtype)
    out = pl.pallas_call(
        functools.partial(
            _multiagg_kernel,
            row_block=row_block,
            edge_tile=edge_tile,
            passes=passes,
            col0=col0,
        ),
        out_shape=[shp, shp, shp, shp],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 4 * E_pad * R_SUB * F * max(passes, 1),
            bytes_accessed=E_pad * F * msgs.dtype.itemsize
            + 4 * N_pad * F * 4
            + E_pad * 4 * nf,
            transcendentals=0,
        ),
    )(row_ptr, maxrun, tile_first, recv2d, msgs)
    return tuple(o[:num_nodes] for o in out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def segment_multiagg(msgs, receivers, num_nodes, max_run):
    """(sum, sum_sq, max, min) per segment in one fused pass.

    ``receivers`` ascending; out-of-range ids (>= num_nodes) are dropped
    from every aggregate. ``max_run`` is the (traced) max segment length —
    it gates the scan depth; overestimates are safe. Empty segments yield
    0 in all four outputs (PyG empty-segment convention).

    F must be a 128-multiple. 256-wide feature tiles halve the per-row
    DMA overhead (~1.35x fwd, measured); a 128 remainder runs as a second
    call on the SAME array via a static column offset — no slice copies.
    """
    E, F = msgs.shape
    E_pad = _round_up(E, 2048)  # covers both feature-tile edge tilings
    if E_pad != E:
        msgs = jnp.pad(msgs, ((0, E_pad - E), (0, 0)))
        receivers = jnp.pad(
            receivers, (0, E_pad - E), constant_values=np.int32(2**31 - 2)
        )
    main = (F // (2 * LANES)) * (2 * LANES)
    parts = []
    if main:
        parts.append(_multiagg_impl(
            msgs, receivers, num_nodes, max_run,
            col0=0, width=main, fc=2 * LANES,
        ))
    if F - main:
        parts.append(_multiagg_impl(
            msgs, receivers, num_nodes, max_run,
            col0=main, width=F - main, fc=LANES,
        ))
    if len(parts) == 1:
        return parts[0]
    return tuple(
        jnp.concatenate([p[i] for p in parts], axis=-1) for i in range(4)
    )


def _fwd(msgs, receivers, num_nodes, max_run):
    out = segment_multiagg(msgs, receivers, num_nodes, max_run)
    s, ss, mx, mn = out
    return out, (msgs, receivers, mx, mn)


def _tie_split_cotangents(msgs, receivers, num_nodes, gmx, gmn, mx, mn):
    """Divide the max/min cotangents by the per-segment TIE counts.

    Duplicate edges (same sender->receiver pair — common in padded
    synthetic batches, possible with PBC images) produce identical
    message values; routing the full cotangent to every tied edge
    overcounts (NOT a valid subgradient: a joint perturbation of all
    tied edges moves the max once but would receive k x the gradient).
    jax.ops.segment_max splits equally among ties — match it. One extra
    segment-sum pass over the [E, 2F] tie indicators (Pallas CSR when
    2F is a lane multiple)."""
    valid = (receivers >= 0) & (receivers < num_nodes)
    ids = jnp.clip(receivers, 0, num_nodes - 1)
    vm = valid[:, None]
    # both indicators packed in ONE fp32 array (counts < 2^16 each, sums
    # exact below 2^24) — one segment pass instead of an [E, 2F] concat
    ind = (
        ((msgs == mx[ids]) & vm).astype(jnp.float32)
        + 65536.0 * ((msgs == mn[ids]) & vm).astype(jnp.float32)
    )
    from hydragnn_tpu.ops.pallas_segment import segment_sum_auto

    cnts = segment_sum_auto(
        ind, receivers, num_nodes, indices_are_sorted=True
    )
    cmn = jnp.floor(cnts / 65536.0)
    cmx = jnp.maximum(cnts - 65536.0 * cmn, 1.0)
    cmn = jnp.maximum(cmn, 1.0)
    return (gmx / cmx).astype(gmx.dtype), (gmn / cmn).astype(gmn.dtype)


def _bwd(num_nodes, res, g):
    msgs, receivers, mx, mn = res
    gs, gss, gmx, gmn = g
    gmx, gmn = _tie_split_cotangents(
        msgs, receivers, num_nodes, gmx, gmn, mx, mn
    )
    if jax.default_backend() not in ("cpu", "gpu"):
        return (
            _multiagg_bwd_impl(
                msgs, receivers, num_nodes, gs, gss, gmx, gmn, mx, mn
            ),
            None,
            None,
        )
    valid = (receivers >= 0) & (receivers < num_nodes)
    ids = jnp.clip(receivers, 0, num_nodes - 1)
    d = (
        gs[ids]
        + 2.0 * msgs * gss[ids]
        + jnp.where(msgs == mx[ids], gmx[ids], 0.0)
        + jnp.where(msgs == mn[ids], gmn[ids], 0.0)
    )
    d = jnp.where(valid[:, None], d, 0.0).astype(msgs.dtype)
    return (d, None, None)


segment_multiagg.defvjp(_fwd, _bwd)


# --------------------------------------------------------------------------
# Fused backward. The XLA formula above pays four [N, F] -> [E, F] row
# gathers plus their materializations (~18 ms at the GFM shape — heavier
# than the forward). This kernel computes the whole cotangent in one pass
# over the message tiles: the six node-side arrays (4 cotangents + saved
# max/min) ride as ONE stacked [N, 6, F] buffer whose row window per edge
# tile is DMA'd once (double-buffered across grid steps), and the
# node->edge expansion is the aggregation one-hot applied backwards —
# dot_general contracting the ROW axis of the [R_SUB, T] one-hot, so each
# edge row selects exactly one node row (bf16-exact selection for bf16,
# 3-term split for fp32).

WROW = 512  # node rows DMA'd per window (tiles spanning more rows — degree
# < 2 regions — stream extra windows serially)


def _multiagg_bwd_kernel(
    tlo_ref,  # scalar prefetch: [nt + 1] first (min) id of each tile
    thi_ref,  # scalar prefetch: [nt] last (max) id of each tile
    recv_ref,  # [E_pad // 128, 128] int32 (HBM)
    gstk_ref,  # [6, N_alloc, F] (HBM): gs, gss, gmx, gmn, mx, mn
    msgs_ref,  # [E_pad, F] (HBM)
    dmsgs_ref,  # out [edge_tile, fc] (VMEM, BlockSpec-pipelined)
    msg_scratch,  # [NBUF, edge_tile, fc]
    recv_scratch,  # [NBUF, sub, 128]
    gwin,  # [2, 6, WROW, fc]
    gxwin,  # [6, WROW, fc] overflow windows (rare)
    sems,  # DMA sems [NBUF, 2]
    gsems,  # DMA sems [2]
    gxsem,  # DMA sem
    *,
    edge_tile: int,
    passes: int,
    nt: int,
    col0: int = 0,
    wrow: int = WROW,
):
    sub = edge_tile // LANES
    j = pl.program_id(0)
    t = pl.program_id(1)
    T = edge_tile
    fc = dmsgs_ref.shape[1]

    def base_of(tt):
        return (tlo_ref[tt] // LANES) * LANES

    def win_dma(slot, tt):
        return pltpu.make_async_copy(
            gstk_ref.at[
                slice(None), pl.ds(base_of(tt), wrow),
                pl.ds(col0 + j * fc, fc),
            ],
            gwin.at[slot],
            gsems.at[slot],
        )

    def tile_dma(slot, tt):
        off = pl.multiple_of(tt * edge_tile, edge_tile)
        return (
            pltpu.make_async_copy(
                msgs_ref.at[
                    pl.ds(off, edge_tile), pl.ds(col0 + j * fc, fc)
                ],
                msg_scratch.at[slot],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                recv_ref.at[pl.ds(tt * sub, sub), :],
                recv_scratch.at[slot],
                sems.at[slot, 1],
            ),
        )

    @pl.when(t == 0)
    def _():
        win_dma(0, 0).start()
        for d in tile_dma(0, 0):
            d.start()

    @pl.when(t + 1 < nt)
    def _():
        win_dma((t + 1) % 2, t + 1).start()
        for d in tile_dma((t + 1) % NBUF, t + 1):
            d.start()

    slot = jax.lax.rem(t, NBUF)
    for d in tile_dma(slot, t):
        d.wait()
    wslot = jax.lax.rem(t, 2)
    win_dma(wslot, t).wait()

    recv_tile = recv_scratch[slot]
    msgs_tile = msg_scratch[slot]
    msgs_f32 = msgs_tile.astype(jnp.float32)
    win_rows = jax.lax.broadcasted_iota(jnp.int32, (R_SUB, LANES), 0)

    tlo = tlo_ref[t]
    thi = thi_ref[t]
    w0 = (tlo // LANES) * LANES

    def window_contrib(g_ref, wbase, d_acc):
        """Add the contribution of node rows [wbase, wbase + wrow)."""
        lo = jnp.clip(tlo - wbase, 0, wrow - R_SUB)
        lo = (lo // R_SUB) * R_SUB
        hi = jnp.clip(thi - wbase, 0, wrow - 1)
        n_sw = jnp.clip((hi - lo) // R_SUB + 1, 1, wrow // R_SUB)

        def sw_body(w, acc):
            off = lo + w * R_SUB
            oh = jnp.concatenate(
                [
                    (
                        win_rows + wbase + off
                        == recv_tile[si : si + 1, :]
                    ).astype(jnp.bfloat16)
                    for si in range(sub)
                ],
                axis=1,
            )  # [R_SUB, T]

            def expand(k):
                gsl = g_ref[k, pl.ds(off, R_SUB), :]  # [R_SUB, fc]
                part = jnp.zeros((T, fc), jnp.float32)
                for term in _split_terms(gsl, passes):
                    part = part + jax.lax.dot_general(
                        oh,
                        term,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                return part

            gsE = expand(0)
            gssE = expand(1)
            gmxE = expand(2)
            gmnE = expand(3)
            mxE = expand(4)
            mnE = expand(5)
            contrib = (
                gsE
                + 2.0 * msgs_f32 * gssE
                + jnp.where(msgs_f32 == mxE, gmxE, 0.0)
                + jnp.where(msgs_f32 == mnE, gmnE, 0.0)
            )
            return acc + contrib

        return jax.lax.fori_loop(0, n_sw, sw_body, d_acc)

    d_acc = jnp.zeros((T, fc), jnp.float32)
    d_acc = window_contrib(gwin.at[wslot], w0, d_acc)

    # overflow windows: tiles whose row span exceeds WROW (degree < 1
    # regions) stream extra windows serially — rare by construction
    n_extra = jnp.maximum((thi - w0) // wrow, 0)

    def extra_body(wx, acc):
        wbase = w0 + wx * wrow
        cp = pltpu.make_async_copy(
            gstk_ref.at[
                slice(None), pl.ds(wbase, wrow),
                pl.ds(col0 + j * fc, fc),
            ],
            gxwin,
            gxsem,
        )
        cp.start()
        cp.wait()
        return window_contrib(gxwin, wbase, acc)

    d_acc = jax.lax.fori_loop(1, n_extra + 1, extra_body, d_acc)
    dmsgs_ref[:] = d_acc.astype(dmsgs_ref.dtype)


def _multiagg_bwd_impl(
    msgs,
    receivers,
    num_nodes,
    gs,
    gss,
    gmx,
    gmn,
    mx,
    mn,
    edge_tile: int = 1024,
    passes: int = PASSES,
):
    """Split like the forward: 256-wide tiles + a 128 remainder, both
    reading the SAME msgs/gstk arrays via static column offsets."""
    E, F = msgs.shape
    main = (F // (2 * LANES)) * (2 * LANES)
    parts = []
    if main:
        parts.append(_multiagg_bwd_part(
            msgs, receivers, num_nodes, gs, gss, gmx, gmn, mx, mn,
            edge_tile, passes, col0=0, width=main, fc=2 * LANES,
        ))
    if F - main:
        parts.append(_multiagg_bwd_part(
            msgs, receivers, num_nodes, gs, gss, gmx, gmn, mx, mn,
            edge_tile, passes, col0=main, width=F - main, fc=LANES,
        ))
    if len(parts) == 1:
        return parts[0]
    return jnp.concatenate(parts, axis=-1)


def _multiagg_bwd_part(
    msgs,
    receivers,
    num_nodes,
    gs,
    gss,
    gmx,
    gmn,
    mx,
    mn,
    edge_tile: int = 1024,
    passes: int = PASSES,
    col0: int = 0,
    width: int = 0,
    fc: int = F_CHUNK,
):
    E, F_all = msgs.shape
    F = width or F_all
    fc = min(fc, F)
    assert F % fc == 0, (F, fc)
    edge_tile = max(256, (2 * edge_tile) // (2 * (fc // 128)))
    wrow = max(256, WROW // (fc // 128))  # node-window rows (VMEM bound)
    nf = F // fc
    E_pad = _round_up(E, edge_tile)
    if E_pad != E:
        msgs = jnp.pad(msgs, ((0, E_pad - E), (0, 0)))
        receivers = jnp.pad(
            receivers, (0, E_pad - E), constant_values=np.int32(2**31 - 2)
        )
    receivers = receivers.astype(jnp.int32)
    nt = E_pad // edge_tile
    recv2d = receivers.reshape(E_pad // LANES, LANES)
    # sorted ids: each tile's min/max are its first/last entries, clamped
    # to the real node range (sentinel ids would otherwise blow up the
    # window span; their one-hot never matches any window row anyway).
    # The stacked node array is padded so every [WROW] window starting at
    # an in-range 128-aligned base stays in bounds.
    n_alloc = _round_up(num_nodes, LANES) + wrow
    tlo = jnp.minimum(receivers[::edge_tile], num_nodes - 1).astype(
        jnp.int32
    )
    thi = jnp.minimum(
        receivers[edge_tile - 1 :: edge_tile], num_nodes - 1
    ).astype(jnp.int32)
    # [6, N, F]: the stack axis LEADS so HBM tiling (last two dims) stays
    # row/lane aligned for the window DMA slices
    gstk = jnp.stack([gs, gss, gmx, gmn, mx, mn], axis=0)
    gstk = jnp.pad(
        gstk.astype(msgs.dtype),
        ((0, 0), (0, n_alloc - num_nodes), (0, 0)),
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nf, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # recv2d
            pl.BlockSpec(memory_space=pl.ANY),  # gstk
            pl.BlockSpec(memory_space=pl.ANY),  # msgs
        ],
        out_specs=pl.BlockSpec(
            (edge_tile, fc), lambda j, t, *_: (t, j),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((NBUF, edge_tile, fc), msgs.dtype),
            pltpu.VMEM((NBUF, edge_tile // LANES, LANES), jnp.int32),
            pltpu.VMEM((2, 6, wrow, fc), msgs.dtype),
            pltpu.VMEM((6, wrow, fc), msgs.dtype),
            pltpu.SemaphoreType.DMA((NBUF, 2)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _multiagg_bwd_kernel,
            edge_tile=edge_tile,
            passes=passes,
            nt=nt,
            col0=col0,
            wrow=wrow,
        ),
        out_shape=jax.ShapeDtypeStruct((E_pad, F), msgs.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 6 * E_pad * R_SUB * F * max(passes, 1),
            bytes_accessed=E_pad * F * msgs.dtype.itemsize * 2
            + nt * WROW * 6 * F * 4 // max(nf, 1),
            transcendentals=0,
        ),
    )(tlo, thi, recv2d, gstk, msgs)
    return out[:E]
