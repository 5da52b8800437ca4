"""Block-sparse (BCSR) adjacency SpMM for GIANT graphs.

The message-aggregation contract — out[r] = sum_{e: recv_e = r} x[send_e]
(ref: hydragnn/models/Base.py conv loop, torch_scatter at Base.py:18) — on a
single band-ordered giant graph (``data/ordering.band_order`` scores
candidate orderings under this module's cost model). The fused one-hot kernel
(ops/pallas_spmm.py) rebuilds the adjacency block from the edge list EVERY
layer: one-hot construction + the A-build matmul are both ∝ window width, so
wide windows (W >= 4096, any graph over ~4k nodes) made it compute-starved
(~0.07 of the scatter roofline, round-1 VERDICT weak #1).

This module removes the per-layer A-build entirely. The adjacency of a batch
is STATIC: collate builds it ONCE on the host as a flat RAGGED list of dense
[B, C] tiles — block-compressed sparse rows:

  - rows grouped in blocks of B (default 512): out rows [i*B, (i+1)*B)
  - sender columns grouped in aligned chunks of C (default 128)
  - one tile per (row block, chunk) pair that contains at least one edge,
    tiles sorted by row block; per-tile ``blk_of``/``chunk_of`` ids are
    scalar-prefetched so the Pallas grid streams them with zero padding
    (a max-K padded layout wastes 20-40% on band-width variance)
  - tile entries are int8 edge multiplicities (exact, counts < 128)

Because the ordering bounds the band, the tile count tracks the graph's
actual band (~2 sqrt-N for lattices), not the global window that defeated
the one-hot kernel. The default direction structure is the band-aligned
``BandDir`` (one [B, W] tile per row block at a robustly chosen column
offset + ragged outlier tiles); the grid-aligned ``BCSRDir`` below remains
the fallback when no uniform window pays off.

The per-layer device op is a pure banded matmul streamed by the Pallas grid
pipeline: out[blk_of[t]] += a[t] @ x[chunk_of[t]] with the fp32 accumulator
living in VMEM across the tiles of a block (tiles of one block are
consecutive in the grid). Per-layer HBM traffic = tiles (int8, once) +
x chunks (~band/B re-reads) + out: ~0.64 GB for the 131k-node/1M-edge 2D
Moore lattice vs 1.7 GB for gather+scatter. The MXU does all the math; the
VPU only upcasts int8 tiles.

Exactness: int8 multiplicities are exact in one bf16 term; x splits into 3
bf16 mantissa chunks (exact fp32, same scheme as ops/pallas_spmm.py), so
results are bit-comparable to an fp32 matmul with fp32 accumulation.

Backward: dx[s] = sum_{e from s} g[recv_e] is the SAME banded matmul with
the transposed tile set (built at collate alongside the forward tiles).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 512  # output rows per tile (v5e sweet spot, bench/giant_graph r2)
CHUNK = 512  # sender columns per tile (r4 sweep, 131k/1M lattice: 1.70 ms
# bf16 / 2.31 ms fp32x2 vs 1.86 / 2.41 at 256 — fewer tiles amortize
# per-tile control/DMA; 1024 is flat; pre-splitting x into stacked bf16
# terms measured WORSE (strided P-major DMA), bench/bcsr_sweep.py)
X_PASSES = 3  # bf16 mantissa terms for fp32 x (3 = exact)
F_TILE_MAX = 512  # widest feature tile per grid step (VMEM bound)


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


RING = 32  # default x-chunk ring slots; adaptive: max(4, 8192 // chunk)
# so the [ring, C, ft] VMEM buffer stays ~4 MB while covering >= 8192
# sender rows (well past any RCM band this kernel targets)


def _ring_slots(chunk: int) -> int:
    return max(4, min(RING, 8192 // max(chunk, 1)))


@struct.dataclass
class BCSRDir:
    """One direction's ragged tile list.

    ``a`` is either dense int8 [T, B, C] (multiplicities) or — when every
    multiplicity is 1 (``packed``) — bit-planes [T, B//8, C]: byte row i,
    bit k holds dense row k*(B//8)+i, so the in-kernel unpack
    (concatenating the 8 bit planes along sublanes) reproduces dense rows
    in natural order with no permutation.

    ``dma_flag`` drives the x-chunk ring cache: 0 = chunk already resident
    in its ring slot (chunk % RING), 1 = miss, prefetchable one tile ahead,
    2 = miss whose prefetch would clobber the slot the previous tile is
    still reading (DMA'd synchronously instead)."""

    a: jnp.ndarray  # [T, B, C] int8 or [T, B//8, C] bit-planes
    blk_of: jnp.ndarray  # [T] int32 destination row block per tile (sorted)
    chunk_of: jnp.ndarray  # [T] int32 sender chunk per tile
    row_ptr: jnp.ndarray  # [NB+1] int32 tile offsets per row block
    dma_flag: jnp.ndarray  # [T] int32 ring-cache miss flags (see above)
    num_blocks: int = struct.field(pytree_node=False)  # static padded rows/B
    block: int = struct.field(pytree_node=False)  # B (dense tile rows)
    packed: bool = struct.field(pytree_node=False)  # a is bit-planes
    # ring slots the dma_flag simulation assumed (kernel must match)
    ring: int = struct.field(pytree_node=False, default=RING)


@struct.dataclass
class BandDir:
    """Band-aligned variant of ``BCSRDir``: ONE [B, W] tile per row block,
    whose sender-column window starts at a per-block 128-aligned offset
    ``col0`` instead of a fixed global chunk grid. For an RCM-ordered band
    of width ``w`` this removes the partial-chunk waste of grid-aligned
    tiles (a block spanning ``w + B`` columns touches ceil((w+B)/C)+1 grid
    chunks but exactly one band tile), cutting MXU work and int8-unpack VPU
    work by ~1.4x on the 131k/1M lattice (round-3 VERDICT weak #1 lever).

    ``a`` is [NB, B, W] int8 multiplicities or [NB, B//8, W] bit planes
    (same packing scheme as BCSRDir). ``col0`` is scalar-prefetched so the
    kernel DMAs x[col0[i] : col0[i]+W] per block, double-buffered across
    grid steps.

    The window width is chosen ROBUSTLY (minimum total dense elements over
    span quantiles, ``_choose_window``): edges outside their block's best
    window — e.g. the wrap edges of a periodic lattice under natural raster
    order, whose full span would otherwise force W toward N — spill into
    ragged per-block OUTLIER tiles ``oa`` ([To, B, OUT_W] at 128-aligned
    starts ``ostart``, block offsets ``orow_ptr``), accumulated by a
    usually-empty inner loop in the kernel."""

    a: jnp.ndarray  # [NB, B or B//8, W] int8
    col0: jnp.ndarray  # [NB] int32, aligned first sender column
    oa: jnp.ndarray  # [To, B or B//8, OUT_W] int8 outlier tiles
    ostart: jnp.ndarray  # [To] int32, 128-aligned outlier window starts
    orow_ptr: jnp.ndarray  # [NB+1] int32 outlier tile offsets per block
    num_blocks: int = struct.field(pytree_node=False)
    block: int = struct.field(pytree_node=False)
    width: int = struct.field(pytree_node=False)  # W (multiple of 128)
    packed: bool = struct.field(pytree_node=False)
    # x-chunk ring (round-4 lever: the whole-window x DMA re-reads ~W/512
    # per block; with col0 512-aligned and W a 512-multiple, x moves in
    # XCHUNK-row pieces cached in a VMEM ring across blocks — each chunk
    # DMA'd ~once per layer). xflags [NB * (W // XCHUNK)] int32: 0 chunk
    # resident, 1 prefetchable during the previous block, 2 synchronous
    # (its prefetch would clobber a slot the previous block still reads).
    xflags: Optional[jnp.ndarray] = None
    chunked: bool = struct.field(pytree_node=False, default=False)


@struct.dataclass
class BCSR:
    """Static block-sparse adjacency of one batch (host-built, device-held).

    ``fwd``: rows = receivers (the aggregation); ``bwd``: rows = senders
    (the transpose, used by the custom VJP). Each direction is either a
    band-aligned ``BandDir`` (preferred when the RCM band is narrow enough)
    or a grid-aligned ``BCSRDir``; ``bcsr_matmul`` dispatches on type."""

    fwd: "BCSRDir | BandDir"
    bwd: "BCSRDir | BandDir"


def _build_one_direction(
    rows, cols, num_nodes, block, chunk, pack=True
) -> BCSRDir:
    """Flat ragged [B, C] tiles, sorted by row block; every row block gets
    at least one tile (empty blocks get a zero tile so the kernel always
    writes their output rows)."""
    nb = _round_up(num_nodes, block) // block
    nc = _round_up(num_nodes, chunk) // chunk
    rb = rows // block
    cb = cols // chunk
    key = rb.astype(np.int64) * nc + cb
    uniq, inv = np.unique(key, return_inverse=True)
    urb = (uniq // nc).astype(np.int64)
    ucb = (uniq % nc).astype(np.int64)
    # pad: one zero tile for any row block with no edges
    missing = np.setdiff1d(np.arange(nb, dtype=np.int64), urb)
    if missing.size:
        order = np.argsort(
            np.concatenate([urb, missing]), kind="stable"
        )
        all_rb = np.concatenate([urb, missing])[order]
        all_cb = np.concatenate([ucb, np.zeros_like(missing)])[order]
        # tile slot of each original unique entry after the merge-sort
        pos = np.empty(all_rb.shape[0], np.int64)
        pos[order] = np.arange(all_rb.shape[0])
        tile_of_uniq = pos[: uniq.shape[0]]
    else:
        all_rb, all_cb = urb, ucb
        tile_of_uniq = np.arange(uniq.shape[0], dtype=np.int64)

    t = all_rb.shape[0]
    # duplicate-edge multiplicities via unique-with-counts (np.add.at into
    # the tile array is ~10x slower at 1M edges)
    flat = (
        tile_of_uniq[inv] * block + (rows - rb * block)
    ) * chunk + (cols - cb * chunk)
    upos, cnt = np.unique(flat, return_counts=True)
    mx = int(cnt.max()) if cnt.size else 0
    if mx > 127:
        raise ValueError(f"edge multiplicity {mx} exceeds int8 BCSR tiles")

    packed = pack and mx <= 1 and block % 8 == 0
    if packed:
        # 1-bit planes: bit k of byte row i <- dense row k*(B//8)+i, so the
        # kernel's 8-plane sublane concat restores natural row order
        sub = block // 8
        a = np.zeros((t, sub, chunk), np.uint8)
        ti = upos // (block * chunk)
        rr = (upos // chunk) % block
        cc = upos % chunk
        np.bitwise_or.at(
            a, (ti, rr % sub, cc), (1 << (rr // sub)).astype(np.uint8)
        )
        a = a.view(np.int8)
    else:
        a = np.zeros(t * block * chunk, np.int8)
        a[upos] = cnt.astype(np.int8)
        a = a.reshape(t, block, chunk)

    row_ptr = np.searchsorted(all_rb, np.arange(nb + 1)).astype(np.int32)

    # x-chunk ring-cache miss flags (host simulation of the kernel's ring)
    ring = _ring_slots(chunk)
    flags = np.zeros(t, np.int32)
    owner = np.full(ring, -1, np.int64)
    for i in range(t):
        c = int(all_cb[i])
        sl = c % ring
        if owner[sl] != c:
            flags[i] = 1
            owner[sl] = c
            # prefetch at tile i-1 would clobber the slot tile i-1 reads
            if i > 0 and all_cb[i - 1] % ring == sl and all_cb[i - 1] != c:
                flags[i] = 2
            # first tile of a block is DMA'd at block entry, never early
    return BCSRDir(
        a=jnp.asarray(a),
        blk_of=jnp.asarray(all_rb.astype(np.int32)),
        chunk_of=jnp.asarray(all_cb.astype(np.int32)),
        row_ptr=jnp.asarray(row_ptr),
        dma_flag=jnp.asarray(flags),
        num_blocks=nb,
        block=block,
        packed=packed,
        ring=ring,
    )


BAND_W_CAP = 8192  # widest per-block column window (VMEM: 2 x W x ft x 4
# double-buffered fp32 x windows = 8 MB at the cap with ft=128; band_matmul
# bounds W*ft <= BAND_W_CAP*128 by shrinking the feature tile)
BAND_ALIGN = 128  # outlier-window alignment (lane-width DMA offsets)
XCHUNK = 256  # band col0/width alignment = x-ring chunk rows


OUT_W = 256  # outlier tile lane width (one 128-col bucket + clamp slack)


def _choose_window(rows, cols, num_nodes, block, align=None):
    """Uniform window width W + per-block aligned starts minimizing
    total dense elements (band tiles + OUT_W-wide outlier tiles).

    For each candidate W (span quantiles), every block picks the aligned
    start covering the most of its edges (two-pointer over its sorted
    sender columns); edges left outside are costed as outlier chunks.
    ``align`` (default XCHUNK) aligns starts AND widths so the kernel's
    x-chunk ring applies. Returns (width, col0[nb], in_window_mask,
    cost_elems) or None."""
    align = align or XCHUNK
    nb = _round_up(num_nodes, block) // block
    n_cap = _round_up(num_nodes, align)
    rb = rows // block
    order = np.lexsort((cols, rb))
    rs, cs = rb[order], cols[order]
    bounds = np.searchsorted(rs, np.arange(nb + 1))
    a0 = (cs // align) * align  # aligned start candidates
    spans = [
        cs[hi - 1] - a0[lo] + 1
        for lo, hi in zip(bounds[:-1], bounds[1:])
        if hi > lo
    ]
    if not spans:
        return None
    spans = np.asarray(spans)
    cands = np.unique(np.concatenate([
        np.percentile(spans, [50, 75, 90, 95, 99], method="lower"),
        [spans.max()],
    ]))
    w_cap = min(BAND_W_CAP, _round_up(n_cap, align))
    cands = np.unique(
        np.minimum((cands + align - 1) // align * align, w_cap)
    )
    best = None
    for w in cands:
        w = int(w)
        col0 = np.zeros(nb, np.int64)
        in_mask_s = np.zeros(cs.shape[0], bool)  # in sorted order
        for b in range(nb):
            lo, hi = bounds[b], bounds[b + 1]
            if hi <= lo:
                continue
            cb, ab = cs[lo:hi], a0[lo:hi]
            starts = np.unique(ab)
            cover = (
                np.searchsorted(cb, starts + w, side="left")
                - np.searchsorted(cb, starts, side="left")
            )
            start = int(starts[int(np.argmax(cover))])
            start = min(start, n_cap - w)
            col0[b] = start
            in_mask_s[lo:hi] = (cb >= start) & (cb < start + w)
        # outlier chunk count: unique (block, col bucket) among outliers
        om = ~in_mask_s
        n_chunks = np.unique(
            rs[om].astype(np.int64) * (n_cap // BAND_ALIGN + 1)
            + cs[om] // BAND_ALIGN
        ).shape[0]
        cost = nb * block * w + n_chunks * block * OUT_W
        if best is None or cost < best[3]:
            in_mask = np.zeros(cs.shape[0], bool)
            in_mask[order] = in_mask_s
            best = (w, col0.copy(), in_mask, cost)
    return best


def _pack_tiles(ti, rr, cc, cnt, n_tiles, block, width, pack, mx):
    """Scatter per-entry multiplicities into [n_tiles, B, W] int8 tiles
    (bit-planes [n_tiles, B//8, W] when every multiplicity is 1)."""
    packed = pack and mx <= 1 and block % 8 == 0
    if packed:
        sub = block // 8
        a = np.zeros((n_tiles, sub, width), np.uint8)
        np.bitwise_or.at(
            a, (ti, rr % sub, cc), (1 << (rr // sub)).astype(np.uint8)
        )
        a = a.view(np.int8)
    else:
        a = np.zeros((n_tiles, block, width), np.int8)
        a[ti, rr, cc] = cnt.astype(np.int8)
    return a, packed


def _build_band_direction(
    rows, cols, num_nodes, block, pack=True, chunk=CHUNK, x_ring=True
) -> Optional[BandDir]:
    """One [B, W] tile per row block at a robustly-chosen 128-aligned
    column offset, plus ragged outlier tiles for out-of-window edges.

    Returns None when no candidate window fits ``BAND_W_CAP`` / the node
    array, a multiplicity overflows int8, or grid-aligned ragged tiles
    (``_build_one_direction``) would move fewer dense elements."""
    nb = _round_up(num_nodes, block) // block
    align = XCHUNK if x_ring else BAND_ALIGN
    n_cap = _round_up(num_nodes, align)
    sel = _choose_window(rows, cols, num_nodes, block, align=align)
    if sel is None:
        return None
    width, col0, in_mask, cost = sel
    if n_cap < width or (not in_mask.all() and n_cap < OUT_W):
        return None
    # grid-cost comparison: decline when ragged CHUNK-aligned tiles are
    # clearly cheaper (no band locality to exploit). The 1.25 slack
    # reflects the band kernel's lower control cost per dense element
    # (1 tile/block vs ~3-6 ragged tiles: measured bf16 win at equal or
    # slightly higher element count, bench/results/train_step_r4.md)
    grid_tiles = np.unique(
        (rows // block).astype(np.int64) * (num_nodes // chunk + 2)
        + cols // chunk
    ).shape[0]
    if cost > 1.25 * max(grid_tiles, nb) * block * chunk:
        return None

    rb = rows // block
    # ---- band tiles ----
    bi, bc_ = rows[in_mask], cols[in_mask]
    brb = bi // block
    flat = (brb * block + (bi - brb * block)) * width + (bc_ - col0[brb])
    upos, cnt = np.unique(flat, return_counts=True)
    mx = int(cnt.max()) if cnt.size else 0
    # ---- outlier tiles ----
    oi, oc_ = rows[~in_mask], cols[~in_mask]
    orb = oi // block
    nck = n_cap // BAND_ALIGN + 1
    okey = orb * nck + oc_ // BAND_ALIGN
    ouniq, oinv = np.unique(okey, return_inverse=True)
    to = max(ouniq.shape[0], 1)
    ostart = np.zeros(to, np.int64)
    if ouniq.shape[0]:
        ostart[: ouniq.shape[0]] = np.minimum(
            (ouniq % nck) * BAND_ALIGN, n_cap - OUT_W
        )
        occ = oc_ - ostart[oinv]
        if occ.size and (occ.min() < 0 or occ.max() >= OUT_W):
            return None  # cannot happen for 128-bucketed outliers; guard
        oflat = (oinv * block + (oi - orb * block)) * OUT_W + occ
        oupos, ocnt = np.unique(oflat, return_counts=True)
        mx = max(mx, int(ocnt.max()))
        orow_ptr = np.searchsorted(
            ouniq // nck, np.arange(nb + 1)
        ).astype(np.int32)
    else:
        oupos = np.zeros(0, np.int64)
        ocnt = np.zeros(0, np.int64)
        orow_ptr = np.zeros(nb + 1, np.int32)
    if mx > 127:
        return None

    a, packed = _pack_tiles(
        upos // (block * width), (upos // width) % block, upos % width,
        cnt, nb, block, width, pack, mx,
    )
    oa, opacked = _pack_tiles(
        oupos // (block * OUT_W), (oupos // OUT_W) % block, oupos % OUT_W,
        ocnt, to, block, OUT_W, pack, mx,
    )
    assert packed == opacked
    if not x_ring:
        return BandDir(
            a=jnp.asarray(a),
            col0=jnp.asarray(col0.astype(np.int32)),
            oa=jnp.asarray(oa),
            ostart=jnp.asarray(ostart.astype(np.int32)),
            orow_ptr=jnp.asarray(orow_ptr),
            num_blocks=nb,
            block=block,
            width=width,
            packed=packed,
        )
    # host simulation of the kernel's x-chunk ring (deterministic block
    # order) -> per-(block, chunk) miss flags; ring size nC + 2 guarantees
    # a straight one-chunk band advance prefetches collision-free
    nC = width // XCHUNK
    ring = nC + 2
    col0c = (col0 // XCHUNK).astype(np.int64)
    xflags = np.zeros((nb, nC), np.int32)
    owner = np.full(ring, -1, np.int64)
    prev_slots = {}
    for i in range(nb):
        cur_slots = {}
        for k in range(nC):
            cid = col0c[i] + k
            sl = int(cid % ring)
            cur_slots[sl] = cid
            if owner[sl] != cid:
                # prefetch during block i-1 unless it would clobber a slot
                # block i-1 still reads (or there is no previous block)
                hazard = i == 0 or (
                    sl in prev_slots and prev_slots[sl] != cid
                )
                xflags[i, k] = 2 if hazard else 1
                owner[sl] = cid
        prev_slots = cur_slots
    return BandDir(
        a=jnp.asarray(a),
        col0=jnp.asarray(col0.astype(np.int32)),
        oa=jnp.asarray(oa),
        ostart=jnp.asarray(ostart.astype(np.int32)),
        orow_ptr=jnp.asarray(orow_ptr),
        num_blocks=nb,
        block=block,
        width=width,
        packed=packed,
        xflags=jnp.asarray(xflags.reshape(-1)),
        chunked=True,
    )


def build_bcsr(
    senders: np.ndarray,
    receivers: np.ndarray,
    edge_mask: Optional[np.ndarray],
    num_nodes: int,
    block: int = BLOCK,
    chunk: int = CHUNK,
    pack: bool = True,
    band: bool = True,
) -> Optional[BCSR]:
    """Host-side tile build (collate time, off the device critical path).

    Returns None when the tiles would be denser than the graph itself
    (band as wide as the node array — the dense/one-hot paths win there)."""
    s = np.asarray(senders, np.int64)
    r = np.asarray(receivers, np.int64)
    if edge_mask is not None:
        m = np.asarray(edge_mask, bool)
        s, r = s[m], r[m]
    if s.size == 0:
        return None

    import os

    # x-chunk ring: measured a WASH on the 131k/1M lattice (round 5 A/B,
    # fp32x2 1.90 vs 1.92 ms at XCHUNK=256; 2.12 vs 2.01 at 512) — the
    # saved x re-reads are offset by the chunk-aligned window growth, i.e.
    # the kernel is not x-bandwidth-bound at these widths. Default stays
    # the round-4 whole-window band; the ring remains available for wider
    # bands where the re-read factor is larger.
    x_ring = os.environ.get("HYDRAGNN_TPU_BCSR_XRING", "0") == "1"

    def _dir(rows, cols):
        if band:
            bd = _build_band_direction(
                rows, cols, num_nodes, block, pack, chunk, x_ring=x_ring
            )
            if bd is not None:
                return bd
        return _build_one_direction(rows, cols, num_nodes, block, chunk, pack)

    try:
        fwd = _dir(r, s)
        bwd = _dir(s, r)
    except ValueError:
        return None
    # pay-off cap: the tiles must move fewer bytes than the gather+scatter
    # they replace (~E*F*8 with typical F=128 -> 1 KB/edge; keep 2x margin
    # at 512 B/edge). A giant graph with no locality (random senders)
    # scatters one edge per tile and fails this; an 8 MB floor keeps small
    # graphs usable in tests regardless.

    def _dense_elems(d):
        if isinstance(d, BandDir):
            return d.num_blocks * d.block * d.width
        return d.a.shape[0] * d.block * d.a.shape[2]

    worst = max(_dense_elems(fwd), _dense_elems(bwd))
    if worst > max(s.size * 512, 8 << 20):
        return None
    return BCSR(fwd=fwd, bwd=bwd)


def _unpack_a(a_raw, packed):
    """int8 tile -> bf16 dense [B, C]; packed tiles expand 8 bit planes
    along sublanes (host packed them so plane order = natural row order)."""
    if not packed:
        return a_raw.astype(jnp.bfloat16)
    au = a_raw.astype(jnp.int32) & 0xFF
    planes = [((au >> k) & 1) for k in range(8)]
    return jnp.concatenate(planes, axis=0).astype(jnp.bfloat16)


def _x_terms(xw, x_passes):
    if xw.dtype == jnp.float32 and x_passes > 1:
        terms = []
        rem = xw
        for _ in range(x_passes):
            tt = rem.astype(jnp.bfloat16)
            rem = rem - tt.astype(jnp.float32)
            terms.append(tt)
        return terms
    return [xw.astype(jnp.bfloat16)]


def _bcsr_ring_kernel(
    row_ptr_ref,  # scalar prefetch: [NB+1] tile offsets per row block
    chunk_ref,  # scalar prefetch: [T] sender chunk per tile
    flag_ref,  # scalar prefetch: [T] ring miss flags (0/1/2)
    a_ref,  # [T, B or B//8, C] int8 (HBM)
    x_ref,  # [N_pad, F] float (HBM)
    o_ref,  # [B, ft] (VMEM)
    acc_ref,  # [B, ft] f32 scratch
    a_scratch,  # [NBUF, B or B//8, C] int8
    x_ring,  # [RING, C, ft] — persistent across grid steps
    a_sems,  # DMA sems [NBUF]
    x_sems,  # DMA sems [RING]
    *,
    x_passes: int,
    nbuf: int,
    packed: bool,
    n_t: int,
    ring: int = RING,
):
    """Ring-cached variant: x chunks live in a VMEM ring (slot = chunk %
    ring) persisting across row blocks, so each chunk is DMA'd ~once per
    layer instead of once per referencing tile. Misses are host-precomputed
    (dma_flag): flag 1 prefetches one tile ahead, flag 2 DMAs synchronously
    (its prefetch would clobber the slot the previous tile still reads)."""
    i = pl.program_id(0)
    t0 = row_ptr_ref[i]
    t1 = row_ptr_ref[i + 1]
    c = x_ring.shape[1]

    def a_dma(slot, t):
        return pltpu.make_async_copy(
            a_ref.at[t], a_scratch.at[slot], a_sems.at[slot]
        )

    def x_dma(t):
        sl = jax.lax.rem(chunk_ref[t], ring)
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(chunk_ref[t] * c, c), :],
            x_ring.at[sl],
            x_sems.at[sl],
        )

    for k in range(nbuf - 1):
        @pl.when(t0 + k < t1)
        def _(k=k):
            a_dma(k, t0 + k).start()

    @pl.when(flag_ref[t0] >= 1)
    def _():
        x_dma(t0).start()

    acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(t, _):
        slot = jax.lax.rem(t - t0, nbuf)
        nxt = jax.lax.rem(t - t0 + nbuf - 1, nbuf)

        @pl.when(t + nbuf - 1 < t1)
        def _():
            a_dma(nxt, t + nbuf - 1).start()

        # clamp: the predicate's flag read is evaluated eagerly and t+1
        # runs off the array on the last tile of the last block
        nxt_flag = flag_ref[jnp.minimum(t + 1, n_t - 1)]

        @pl.when(jnp.logical_and(t + 1 < t1, nxt_flag == 1))
        def _():
            x_dma(t + 1).start()

        @pl.when(jnp.logical_and(t > t0, flag_ref[t] == 2))
        def _():
            x_dma(t).start()

        a_dma(slot, t).wait()
        sl = jax.lax.rem(chunk_ref[t], ring)

        @pl.when(flag_ref[t] >= 1)
        def _():
            x_dma(t).wait()

        a = _unpack_a(a_scratch[slot], packed)
        part = acc_ref[...]
        for term in _x_terms(x_ring[sl], x_passes):
            part = part + jax.lax.dot_general(
                a, term,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        acc_ref[:] = part
        return 0

    jax.lax.fori_loop(t0, t1, body, 0)
    o_ref[:] = acc_ref[...].astype(o_ref.dtype)


def _bcsr_block_kernel(
    row_ptr_ref,  # scalar prefetch: [NB+1] tile offsets per row block
    chunk_ref,  # scalar prefetch: [T] sender chunk per tile
    a_ref,  # [T, B, C] int8 (HBM)
    x_ref,  # [N_pad, F] float (HBM)
    o_ref,  # [B, ft] (VMEM)
    acc_ref,  # [B, ft] f32 scratch
    a_scratch,  # [NBUF, B, C] int8
    x_scratch,  # [NBUF, C, ft]
    sems,  # DMA sems [NBUF, 2]
    *,
    x_passes: int,
    ft: int,
    nbuf: int,
    packed: bool,
):
    """One grid step per output row block; the block's tiles stream through
    a manual double-buffered DMA pipeline (one pallas grid step per TILE
    costs ~750 ns of fixed overhead on v5e — 3.4x the tile's own work)."""
    j = pl.program_id(0)  # feature tile
    i = pl.program_id(1)  # row block
    t0 = row_ptr_ref[i]
    t1 = row_ptr_ref[i + 1]
    c = x_scratch.shape[1]

    def get_dma(slot, t):
        return (
            pltpu.make_async_copy(
                a_ref.at[t], a_scratch.at[slot], sems.at[slot, 0]
            ),
            pltpu.make_async_copy(
                x_ref.at[pl.ds(chunk_ref[t] * c, c), pl.ds(j * ft, ft)],
                x_scratch.at[slot],
                sems.at[slot, 1],
            ),
        )

    for k in range(nbuf - 1):
        @pl.when(t0 + k < t1)
        def _(k=k):
            for d in get_dma(k, t0 + k):
                d.start()

    acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(t, _):
        slot = jax.lax.rem(t - t0, nbuf)
        nxt = jax.lax.rem(t - t0 + nbuf - 1, nbuf)

        @pl.when(t + nbuf - 1 < t1)
        def _():
            for d in get_dma(nxt, t + nbuf - 1):
                d.start()

        for d in get_dma(slot, t):
            d.wait()

        a = _unpack_a(a_scratch[slot], packed)
        part = acc_ref[...]
        for term in _x_terms(x_scratch[slot], x_passes):
            part = part + jax.lax.dot_general(
                a, term, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        acc_ref[:] = part
        return 0

    jax.lax.fori_loop(t0, t1, body, 0)
    o_ref[:] = acc_ref[...].astype(o_ref.dtype)


def _bcsr_kernel(
    blk_ref, chunk_ref, a_ref, x_ref, o_ref, acc_ref, *, n_t, x_passes
):
    t = pl.program_id(1)
    blk = blk_ref[t]
    first = jnp.logical_or(t == 0, blk_ref[jnp.maximum(t - 1, 0)] != blk)
    last = jnp.logical_or(
        t == n_t - 1, blk_ref[jnp.minimum(t + 1, n_t - 1)] != blk
    )

    @pl.when(first)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    a = a_ref[0].astype(jnp.bfloat16)  # [B, C] int8 -> bf16 exact
    xw = x_ref[...]
    if xw.dtype == jnp.float32 and x_passes > 1:
        terms = []
        rem = xw
        for _ in range(x_passes):
            tt = rem.astype(jnp.bfloat16)
            rem = rem - tt.astype(jnp.float32)
            terms.append(tt)
    else:
        terms = [xw.astype(jnp.bfloat16)]
    part = acc_ref[...]
    for term in terms:
        part = part + jax.lax.dot_general(
            a, term, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc_ref[:] = part

    @pl.when(last)
    def _():
        o_ref[:] = acc_ref[...].astype(o_ref.dtype)


def _common_shapes(d: BCSRDir, x: jnp.ndarray):
    t = d.a.shape[0]
    c = d.a.shape[2]
    b = d.block
    n, f = x.shape
    ncols = _round_up(n, c)
    if ncols != n:
        x = jnp.pad(x, ((0, ncols - n), (0, 0)))
    assert f % 128 == 0, f
    ft = f if f <= F_TILE_MAX else F_TILE_MAX
    while f % ft:
        ft //= 2
    return x, t, b, c, f, ft, f // ft


def bcsr_matmul(
    d: BCSRDir,
    x: jnp.ndarray,
    x_passes: int = X_PASSES,
    nbuf: int = 4,
) -> jnp.ndarray:
    """out[i*B : +B] = sum_{t in block i} a[t] @ x[chunk_of[t]*C : +C].

    One grid step per output row block; its tiles stream through the manual
    DMA pipeline in the kernel. Single-feature-tile calls (F <= 256) route
    through the ring-cached kernel (x chunks DMA'd ~once per layer).
    Band-aligned directions dispatch to ``band_matmul``.
    Returns [NB*B, F]; the caller slices to its node count."""
    if isinstance(d, BandDir):
        return band_matmul(d, x, x_passes)
    x, t, b, c, f, ft, nf = _common_shapes(d, x)
    if nf == 1 and ft <= 256:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(d.num_blocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # a tiles
                pl.BlockSpec(memory_space=pl.ANY),  # x
            ],
            out_specs=pl.BlockSpec((b, ft), lambda i, rp, ch, fl: (i, 0)),
            scratch_shapes=[
                pltpu.VMEM((b, ft), jnp.float32),
                pltpu.VMEM((nbuf,) + d.a.shape[1:], d.a.dtype),
                pltpu.VMEM((d.ring, c, ft), x.dtype),
                pltpu.SemaphoreType.DMA((nbuf,)),
                pltpu.SemaphoreType.DMA((d.ring,)),
            ],
        )
        return pl.pallas_call(
            functools.partial(
                _bcsr_ring_kernel, x_passes=x_passes, nbuf=nbuf,
                packed=d.packed, n_t=t, ring=d.ring,
            ),
            out_shape=jax.ShapeDtypeStruct((d.num_blocks * b, f), x.dtype),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * t * b * c * f * max(x_passes, 1),
                bytes_accessed=int(d.a.size) + x.shape[0] * f * 4
                + d.num_blocks * b * f * 4,
                transcendentals=0,
            ),
        )(d.row_ptr, d.chunk_of, d.dma_flag, d.a, x)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nf, d.num_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # a tiles
            pl.BlockSpec(memory_space=pl.ANY),  # x
        ],
        out_specs=pl.BlockSpec((b, ft), lambda j, i, rp, ch: (i, j)),
        scratch_shapes=[
            pltpu.VMEM((b, ft), jnp.float32),
            pltpu.VMEM((nbuf,) + d.a.shape[1:], d.a.dtype),
            pltpu.VMEM((nbuf, c, ft), x.dtype),
            pltpu.SemaphoreType.DMA((nbuf, 2)),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _bcsr_block_kernel, x_passes=x_passes, ft=ft, nbuf=nbuf,
            packed=d.packed,
        ),
        out_shape=jax.ShapeDtypeStruct((d.num_blocks * b, f), x.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * t * b * c * f * max(x_passes, 1),
            bytes_accessed=int(d.a.size) * (f // ft)
            + t * c * f * 4 + d.num_blocks * b * f * 4,
            transcendentals=0,
        ),
    )(d.row_ptr, d.chunk_of, d.a, x)


def _band_kernel(
    col0_ref,  # scalar prefetch: [NB] first sender column per block
    ostart_ref,  # scalar prefetch: [To] outlier window starts
    orow_ptr_ref,  # scalar prefetch: [NB+1] outlier tile offsets per block
    a_ref,  # [NB, B or B//8, W] int8 (HBM)
    oa_ref,  # [To, B or B//8, OUT_W] int8 (HBM)
    x_ref,  # [N_pad, F] float (HBM)
    o_ref,  # [B, ft] (VMEM)
    a_buf,  # [2, B or B//8, W] int8
    x_buf,  # [2, W, ft]
    oa_buf,  # [2, B or B//8, OUT_W] int8
    ox_buf,  # [2, OUT_W, ft]
    sems,  # DMA sems [2, 2]
    osems,  # DMA sems [2, 2]
    *,
    x_passes: int,
    ft: int,
    packed: bool,
    nb: int,
):
    """One grid step per row block; its single [B, W] band tile and the
    x[col0 : col0+W] window double-buffer across grid steps (block i+1's
    DMAs are issued before block i's dot, so the ~330 KB/block of traffic
    hides under the ~B*W*F MACs). The block's outlier tiles — empty for
    all but e.g. the wrap-edge blocks of a periodic lattice — stream
    through their own small double-buffered loop after the band dot."""
    j = pl.program_id(0)  # feature tile
    i = pl.program_id(1)  # row block
    w = x_buf.shape[1]
    ow = ox_buf.shape[1]

    def dmas(slot, blk):
        return (
            pltpu.make_async_copy(
                a_ref.at[blk], a_buf.at[slot], sems.at[slot, 0]
            ),
            pltpu.make_async_copy(
                x_ref.at[
                    pl.ds(pl.multiple_of(col0_ref[blk], BAND_ALIGN), w),
                    pl.ds(j * ft, ft),
                ],
                x_buf.at[slot],
                sems.at[slot, 1],
            ),
        )

    def odmas(slot, t):
        return (
            pltpu.make_async_copy(
                oa_ref.at[t], oa_buf.at[slot], osems.at[slot, 0]
            ),
            pltpu.make_async_copy(
                x_ref.at[
                    pl.ds(pl.multiple_of(ostart_ref[t], BAND_ALIGN), ow),
                    pl.ds(j * ft, ft),
                ],
                ox_buf.at[slot],
                osems.at[slot, 1],
            ),
        )

    t0 = orow_ptr_ref[i]
    t1 = orow_ptr_ref[i + 1]

    @pl.when(i == 0)
    def _():
        for d in dmas(0, 0):
            d.start()

    @pl.when(i + 1 < nb)
    def _():
        for d in dmas((i + 1) % 2, i + 1):
            d.start()

    @pl.when(t0 < t1)
    def _():
        for d in odmas(0, t0):
            d.start()

    slot = jax.lax.rem(i, 2)
    for d in dmas(slot, i):
        d.wait()

    a = _unpack_a(a_buf[slot], packed)
    acc = None
    for term in _x_terms(x_buf[slot], x_passes):
        part = jax.lax.dot_general(
            a, term,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = part if acc is None else acc + part

    def obody(t, acc):
        sl = jax.lax.rem(t - t0, 2)

        @pl.when(t + 1 < t1)
        def _():
            for d in odmas(1 - sl, t + 1):
                d.start()

        for d in odmas(sl, t):
            d.wait()
        ao = _unpack_a(oa_buf[sl], packed)
        for term in _x_terms(ox_buf[sl], x_passes):
            acc = acc + jax.lax.dot_general(
                ao, term,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return acc

    acc = jax.lax.fori_loop(t0, t1, obody, acc)
    o_ref[:] = acc.astype(o_ref.dtype)


def _band_ring_kernel(
    col0c_ref,  # scalar prefetch: [NB] first x-chunk id per block
    xflags_ref,  # scalar prefetch: [NB * nC] ring miss flags (0/1/2)
    ostart_ref,  # scalar prefetch: [To] outlier window starts
    orow_ptr_ref,  # scalar prefetch: [NB+1] outlier tile offsets per block
    a_ref,  # [NB, B or B//8, W] int8 (HBM)
    oa_ref,  # [To, B or B//8, OUT_W] int8 (HBM)
    x_ref,  # [N_pad, F] float (HBM)
    o_ref,  # [B, ft] (VMEM)
    a_buf,  # [2, B or B//8, W] int8
    x_ring,  # [R, XCHUNK, ft] — persistent across grid steps
    oa_buf,  # [2, B or B//8, OUT_W] int8
    ox_buf,  # [2, OUT_W, ft]
    a_sems,  # DMA sems [2]
    x_sems,  # DMA sems [R]
    osems,  # DMA sems [2, 2]
    *,
    x_passes: int,
    ft: int,
    packed: bool,
    nb: int,
    n_chunks: int,
    ring: int,
):
    """Band kernel with an x-chunk ring: the [B, W] band tile dots against
    W // XCHUNK ring-resident x chunks instead of a freshly-DMA'd whole
    window — under a one-chunk-per-block band advance, each x chunk moves
    from HBM ~once per layer instead of ~W/XCHUNK times (the round-4 fp32
    re-read factor). Misses are host-precomputed (BandDir.xflags): flag 1
    prefetches during the previous block, flag 2 DMAs at block entry."""
    j = pl.program_id(0)
    i = pl.program_id(1)

    def a_dma(slot, blk):
        return pltpu.make_async_copy(
            a_ref.at[blk], a_buf.at[slot], a_sems.at[slot]
        )

    def x_dma(cid):
        sl = jax.lax.rem(cid, ring)
        return pltpu.make_async_copy(
            x_ref.at[
                pl.ds(pl.multiple_of(cid * XCHUNK, XCHUNK), XCHUNK),
                pl.ds(j * ft, ft),
            ],
            x_ring.at[sl],
            x_sems.at[sl],
        )

    def odmas(slot, t):
        return (
            pltpu.make_async_copy(
                oa_ref.at[t], oa_buf.at[slot], osems.at[slot, 0]
            ),
            pltpu.make_async_copy(
                x_ref.at[
                    pl.ds(pl.multiple_of(ostart_ref[t], BAND_ALIGN),
                          ox_buf.shape[1]),
                    pl.ds(j * ft, ft),
                ],
                ox_buf.at[slot],
                osems.at[slot, 1],
            ),
        )

    t0 = orow_ptr_ref[i]
    t1 = orow_ptr_ref[i + 1]

    @pl.when(i == 0)
    def _():
        a_dma(0, 0).start()

    @pl.when(i + 1 < nb)
    def _():
        a_dma((i + 1) % 2, i + 1).start()

    @pl.when(t0 < t1)
    def _():
        for dd in odmas(0, t0):
            dd.start()

    # synchronous misses (block 0, or collisions with the previous block)
    for k in range(n_chunks):
        @pl.when(xflags_ref[i * n_chunks + k] == 2)
        def _(k=k):
            x_dma(col0c_ref[i] + k).start()

    for k in range(n_chunks):
        @pl.when(xflags_ref[i * n_chunks + k] >= 1)
        def _(k=k):
            x_dma(col0c_ref[i] + k).wait()

    # prefetch the NEXT block's misses (their slots are provably not read
    # by this block — host flag discipline)
    @pl.when(i + 1 < nb)
    def _():
        for k in range(n_chunks):
            @pl.when(xflags_ref[jnp.minimum(i + 1, nb - 1) * n_chunks + k]
                     == 1)
            def _(k=k):
                x_dma(col0c_ref[jnp.minimum(i + 1, nb - 1)] + k).start()

    slot = jax.lax.rem(i, 2)
    a_dma(slot, i).wait()
    a = _unpack_a(a_buf[slot], packed)

    acc = None
    for k in range(n_chunks):
        sl = jax.lax.rem(col0c_ref[i] + k, ring)
        ak = a[:, k * XCHUNK : (k + 1) * XCHUNK]
        for term in _x_terms(x_ring[sl], x_passes):
            part = jax.lax.dot_general(
                ak, term,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part

    def obody(t, acc):
        sl = jax.lax.rem(t - t0, 2)

        @pl.when(t + 1 < t1)
        def _():
            for dd in odmas(1 - sl, t + 1):
                dd.start()

        for dd in odmas(sl, t):
            dd.wait()
        ao = _unpack_a(oa_buf[sl], packed)
        for term in _x_terms(ox_buf[sl], x_passes):
            acc = acc + jax.lax.dot_general(
                ao, term,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return acc

    acc = jax.lax.fori_loop(t0, t1, obody, acc)
    o_ref[:] = acc.astype(o_ref.dtype)


def band_matmul(
    d: BandDir,
    x: jnp.ndarray,
    x_passes: int = X_PASSES,
) -> jnp.ndarray:
    """out[i*B : +B] = a[i] @ x[col0[i] : col0[i]+W] — the band-aligned
    one-tile-per-block variant of ``bcsr_matmul``. Chunk-aligned
    directions (BandDir.chunked) route through the x-ring kernel.
    Returns [NB*B, F]."""
    n, f = x.shape
    n_cap = _round_up(n, XCHUNK if d.chunked else BAND_ALIGN)
    if n_cap != n:
        x = jnp.pad(x, ((0, n_cap - n), (0, 0)))
    assert f % 128 == 0, f
    assert n_cap >= d.width, (n_cap, d.width)
    ft = f if f <= F_TILE_MAX else F_TILE_MAX
    while f % ft:
        ft //= 2
    # VMEM bound couples the window width to the feature tile: the
    # double-buffered x window (or (W/XCHUNK + 2)-slot ring) is
    # ~2*W*ft*itemsize bytes, budgeted as 8 MB fp32 at (W=BAND_W_CAP,
    # ft=128). Wide bands with wide features must shrink ft jointly or
    # Mosaic overflows VMEM (advisor r4 finding).
    while ft > 128 and d.width * ft > BAND_W_CAP * 128:
        ft //= 2
    nf = f // ft
    b = d.block
    if d.chunked:
        n_chunks = d.width // XCHUNK
        ring = n_chunks + 2
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(nf, d.num_blocks),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # band tiles
                pl.BlockSpec(memory_space=pl.ANY),  # outlier tiles
                pl.BlockSpec(memory_space=pl.ANY),  # x
            ],
            out_specs=pl.BlockSpec(
                (b, ft), lambda j, i, c0, xf, os, rp: (i, j)
            ),
            scratch_shapes=[
                pltpu.VMEM((2,) + d.a.shape[1:], d.a.dtype),
                pltpu.VMEM((ring, XCHUNK, ft), x.dtype),
                pltpu.VMEM((2,) + d.oa.shape[1:], d.oa.dtype),
                pltpu.VMEM((2, OUT_W, ft), x.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((ring,)),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        )
        return pl.pallas_call(
            functools.partial(
                _band_ring_kernel, x_passes=x_passes, ft=ft,
                packed=d.packed, nb=d.num_blocks, n_chunks=n_chunks,
                ring=ring,
            ),
            out_shape=jax.ShapeDtypeStruct((d.num_blocks * b, f), x.dtype),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * (d.num_blocks * d.width + d.oa.shape[0] * OUT_W)
                * b * f * max(x_passes, 1),
                bytes_accessed=(int(d.a.size) + int(d.oa.size)) * nf
                + n_cap * f * x.dtype.itemsize
                + d.num_blocks * b * f * 4,
                transcendentals=0,
            ),
        )(
            d.col0 // XCHUNK, d.xflags, d.ostart, d.orow_ptr,
            d.a, d.oa, x,
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nf, d.num_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # band tiles
            pl.BlockSpec(memory_space=pl.ANY),  # outlier tiles
            pl.BlockSpec(memory_space=pl.ANY),  # x
        ],
        out_specs=pl.BlockSpec((b, ft), lambda j, i, c0, os, rp: (i, j)),
        scratch_shapes=[
            pltpu.VMEM((2,) + d.a.shape[1:], d.a.dtype),
            pltpu.VMEM((2, d.width, ft), x.dtype),
            pltpu.VMEM((2,) + d.oa.shape[1:], d.oa.dtype),
            pltpu.VMEM((2, OUT_W, ft), x.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _band_kernel, x_passes=x_passes, ft=ft, packed=d.packed,
            nb=d.num_blocks,
        ),
        out_shape=jax.ShapeDtypeStruct((d.num_blocks * b, f), x.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (d.num_blocks * d.width + d.oa.shape[0] * OUT_W)
            * b * f * max(x_passes, 1),
            bytes_accessed=(int(d.a.size) + int(d.oa.size)) * nf
            + d.num_blocks * (d.width + OUT_W) * f * x.dtype.itemsize
            + d.num_blocks * b * f * 4,
            transcendentals=0,
        ),
    )(d.col0, d.ostart, d.orow_ptr, d.a, d.oa, x)


def bcsr_matmul_tilegrid(
    d: BCSRDir,
    x: jnp.ndarray,
    x_passes: int = X_PASSES,
) -> jnp.ndarray:
    """A/B variant: one pallas grid step per TILE with BlockSpec-driven
    pipelining (measured ~750 ns fixed cost per grid step on v5e — the
    block-pipelined ``bcsr_matmul`` amortizes that over a block's tiles).
    Dense int8 tiles only (build with pack=False)."""
    assert not d.packed, "tilegrid variant takes dense tiles (pack=False)"
    x, t, b, c, f, ft, nf = _common_shapes(d, x)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nf, t),
        in_specs=[
            pl.BlockSpec((1, b, c), lambda j, tt, blk, ch: (tt, 0, 0)),
            pl.BlockSpec((c, ft), lambda j, tt, blk, ch: (ch[tt], j)),
        ],
        out_specs=pl.BlockSpec(
            (b, ft), lambda j, tt, blk, ch: (blk[tt], j)
        ),
        scratch_shapes=[pltpu.VMEM((b, ft), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_bcsr_kernel, n_t=t, x_passes=x_passes),
        out_shape=jax.ShapeDtypeStruct((d.num_blocks * b, f), x.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * t * b * c * f * max(x_passes, 1),
            bytes_accessed=t * (b * c + c * f * 4) + d.num_blocks * b * f * 4,
            transcendentals=0,
        ),
    )(d.blk_of, d.chunk_of, d.a, x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def bcsr_spmm(x: jnp.ndarray, bcsr: BCSR, x_passes: int = X_PASSES):
    """out[r] = sum_{e: recv_e = r} x[send_e] via static BCSR tiles.

    Gradient flows to x only (the adjacency is batch data). Exact fp32 with
    the default 3-term x split."""
    n = x.shape[0]
    return bcsr_matmul(bcsr.fwd, x, x_passes)[:n]


def _fwd(x, bcsr, x_passes):
    return bcsr_spmm(x, bcsr, x_passes), (bcsr, x.shape[0])


def _bwd(x_passes, res, g):
    bcsr, n = res
    dx = bcsr_matmul(bcsr.bwd, g, x_passes)[:n]
    return (dx, None)


bcsr_spmm.defvjp(_fwd, _bwd)
