"""Block-sparse (BCSR) adjacency SpMM for GIANT graphs.

The message-aggregation contract — out[r] = sum_{e: recv_e = r} x[send_e]
(ref: hydragnn/models/Base.py conv loop, torch_scatter at Base.py:18) — on a
single RCM-ordered giant graph. The fused one-hot kernel
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

Because RCM bounds the true bandwidth, the tile count tracks the graph's
actual band (~2 sqrt-N for lattices), not the global window that defeated
the one-hot kernel.

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
class BCSR:
    """Static block-sparse adjacency of one batch (host-built, device-held).

    ``fwd``: rows = receivers (the aggregation); ``bwd``: rows = senders
    (the transpose, used by the custom VJP)."""

    fwd: BCSRDir
    bwd: BCSRDir


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


def build_bcsr(
    senders: np.ndarray,
    receivers: np.ndarray,
    edge_mask: Optional[np.ndarray],
    num_nodes: int,
    block: int = BLOCK,
    chunk: int = CHUNK,
    pack: bool = True,
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
    try:
        fwd = _build_one_direction(r, s, num_nodes, block, chunk, pack)
        bwd = _build_one_direction(s, r, num_nodes, block, chunk, pack)
    except ValueError:
        return None
    # pay-off cap: the tiles must move fewer bytes than the gather+scatter
    # they replace (~E*F*8 with typical F=128 -> 1 KB/edge; keep 2x margin
    # at 512 B/edge). A giant graph with no locality (random senders)
    # scatters one edge per tile and fails this; an 8 MB floor keeps small
    # graphs usable in tests regardless.
    worst = max(fwd.a.shape[0], bwd.a.shape[0]) * block * chunk
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
    Returns [NB*B, F]; the caller slices to its node count."""
    x, t, b, c, f, ft, nf = _common_shapes(d, x)
    if nf == 1 and ft <= 256:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(d.num_blocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),  # a tiles
                pl.BlockSpec(memory_space=pltpu.ANY),  # x
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
            pl.BlockSpec(memory_space=pltpu.ANY),  # a tiles
            pl.BlockSpec(memory_space=pltpu.ANY),  # x
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
