"""Pallas TPU kernel: windowed one-hot row gather (``x[ids]``) on the MXU.

Motivation: XLA lowers a random row gather to a serial dynamic-slice loop on
TPU; for the message-gather of a GNN conv (E=2.1M rows of F=128 from a 128k
node table) it measures ~46 ms on v5e — 8x the cost of the Pallas segment
reduction and the dominant term of the SpMM hot path (reference contract:
the gather half of PyG's gather→message→scatter ``MessagePassing.propagate``,
hydragnn/models/Base.py conv loop).

Key observation: batched molecular graphs have *local* indices. Collate
assigns each graph a contiguous node-id range, and every edge's endpoints lie
in the same graph — so any contiguous tile of edges (sorted by receiver or by
sender) touches a node window no wider than the tile's own row span plus one
graph. The gather then becomes a dense one-hot matmul against that window:

    out[tile T, F] = OneHot^T[W, T] @ x_window[W, F]

which runs on the MXU at ~passes * T*W*F FLOPs/tile instead of E serial
dynamic slices. Window bases are computed on device per tile (min id, aligned
down); a single predicate checks every tile fits its window and falls back to
the XLA gather otherwise (``lax.cond``), so the kernel is *always correct* —
locality only affects speed.

Precision: the one-hot is exact in bf16 and each output element is a sum of
exactly one product per pass, so splitting fp32 ``x`` into 3 bf16 mantissa
chunks (hi/mid/lo) reconstructs the fp32 value bit-exactly with fp32 MXU
accumulation (same scheme as pallas_segment.py).
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
WINDOW = 1024  # x rows per tile window
TILE = 1024  # edges (output rows) per program
ALIGN = 32  # window base alignment (covers f32 [8,128] and bf16 [16,128])
PASSES = 3  # bf16 split terms for x (3 = exact fp32)
NBUF = 4  # cross-program DMA pipeline depth
F_CHUNK = 256  # max feature width per pallas call (bounds VMEM scratch)


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _gather_kernel(
    base_ref,  # scalar prefetch: [nt] window base row per tile
    ids_ref,  # [E_pad // 128, 128] int32 absolute row ids (HBM)
    x_ref,  # [N_pad, F] float (HBM)
    out_ref,  # [tile, F] VMEM block for this program
    x_scratch,  # [NBUF, window, F] VMEM
    ids_scratch,  # [NBUF, tile // 128, 128] VMEM
    sems,  # DMA sems [NBUF, 2]
    *,
    window: int,
    tile: int,
    passes: int,
):
    sub = tile // LANES
    t = pl.program_id(0)
    nt = pl.num_programs(0)

    def get_dma(slot, tt):
        base = pl.multiple_of(base_ref[tt], ALIGN)
        return (
            pltpu.make_async_copy(
                x_ref.at[pl.ds(base, window), :],
                x_scratch.at[slot],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                ids_ref.at[pl.ds(tt * sub, sub), :],
                ids_scratch.at[slot],
                sems.at[slot, 1],
            ),
        )

    # scratch persists across the sequential TPU grid: program 0 warms the
    # pipeline NBUF tiles deep, each later program prefetches tile t+NBUF-1
    @pl.when(t == 0)
    def _():
        for k in range(NBUF):
            @pl.when(k < nt)
            def _(k=k):
                for d in get_dma(k, k):
                    d.start()

    @pl.when((t > 0) & (t + NBUF - 1 < nt))
    def _():
        for d in get_dma(jax.lax.rem(t + NBUF - 1, NBUF), t + NBUF - 1):
            d.start()

    slot = jax.lax.rem(t, NBUF)
    for d in get_dma(slot, t):
        d.wait()

    x_win = x_scratch[slot]  # [window, F]
    ids_tile = ids_scratch[slot]  # [sub, 128]
    base = base_ref[t]
    win_iota = jax.lax.broadcasted_iota(jnp.int32, (window, LANES), 0)
    # transposed one-hot [window, tile]: column j is 1 at row ids[j] - base
    # (built lane-chunk-wise against the natural [sub, 128] id layout — no
    # relayout; ids outside the window produce all-zero columns)
    oh_t = jnp.concatenate(
        [
            (win_iota + base == ids_tile[si : si + 1, :]).astype(jnp.bfloat16)
            for si in range(sub)
        ],
        axis=1,
    )  # [window, tile]

    if x_ref.dtype == jnp.float32 and passes > 1:
        terms = []
        rem = x_win
        for _ in range(passes):
            t_ = rem.astype(jnp.bfloat16)
            rem = rem - t_.astype(jnp.float32)
            terms.append(t_)
    else:
        terms = [x_win.astype(jnp.bfloat16)]

    acc = jnp.zeros((tile, out_ref.shape[1]), jnp.float32)
    for term in terms:
        acc = acc + jax.lax.dot_general(
            oh_t,
            term,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[:] = acc.astype(out_ref.dtype)


def _gather_pallas(x_pad, ids_pad, bases, tile, window, passes):
    E_pad = ids_pad.shape[0]
    F = x_pad.shape[1]
    nt = E_pad // tile
    ids2d = ids_pad.reshape(E_pad // LANES, LANES)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # ids
            pl.BlockSpec(memory_space=pl.ANY),  # x
        ],
        out_specs=pl.BlockSpec(
            (tile, F), lambda t, *_: (t, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((NBUF, window, F), x_pad.dtype),
            pltpu.VMEM((NBUF, tile // LANES, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((NBUF, 2)),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _gather_kernel, window=window, tile=tile, passes=passes
        ),
        out_shape=jax.ShapeDtypeStruct((E_pad, F), x_pad.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * E_pad * window * F * max(passes, 1),
            bytes_accessed=E_pad * F * 4 + E_pad * window // tile * F * 4,
            transcendentals=0,
        ),
    )(bases, ids2d, x_pad)


def gather_rows_windowed(
    x: jnp.ndarray,
    ids: jnp.ndarray,
    tile: int = TILE,
    window: int = WINDOW,
    passes: int = PASSES,
    f_chunk: Optional[int] = None,
) -> jnp.ndarray:
    """``x[ids]`` via the windowed one-hot MXU kernel; exact for any ids
    (tiles whose id span exceeds ``window`` trigger a whole-call XLA
    fallback selected at runtime).

    ``f_chunk``: feature width per pallas call. Default sizes it to the
    WHOLE feature dim when the VMEM scratch allows — chunking re-reads ids
    and rebuilds the one-hot per chunk, which dominated at wide F (the
    one-hot build is ∝ window*tile regardless of F)."""
    E = ids.shape[0]
    N, F = x.shape
    if f_chunk is None:
        # budget ~10 MB of VMEM scratch: NBUF x-windows + f32 acc + out tile
        itemsize = 2 if x.dtype == jnp.bfloat16 else 4
        budget = 10 * 1024 * 1024
        per_col = NBUF * window * itemsize + tile * (4 + itemsize)
        f_chunk = max(128, (budget // per_col) // 128 * 128)
    if F > f_chunk:
        parts = [
            gather_rows_windowed(
                x[:, i : i + f_chunk], ids, tile, window, passes, f_chunk
            )
            for i in range(0, F, f_chunk)
        ]
        return jnp.concatenate(parts, axis=-1)

    E_pad = _round_up(max(E, tile), tile)
    N_pad = max(_round_up(N, ALIGN), window)
    x_pad = jnp.pad(x, ((0, N_pad - N), (0, 0))) if N_pad != N else x
    if E_pad != E:
        # pad with the last real id to keep the final tile's span tight
        ids_pad = jnp.concatenate(
            [ids, jnp.broadcast_to(ids[-1:], (E_pad - E,))]
        ).astype(jnp.int32)
    else:
        ids_pad = ids.astype(jnp.int32)

    ids2 = ids_pad.reshape(E_pad // tile, tile)
    mn = jnp.min(ids2, axis=1)
    mx = jnp.max(ids2, axis=1)
    bases = jnp.clip(
        (mn // ALIGN) * ALIGN, 0, max(N_pad - window, 0)
    ).astype(jnp.int32)
    ok = jnp.all(mx - bases < window)

    out = jax.lax.cond(
        ok,
        lambda: _gather_pallas(x_pad, ids_pad, bases, tile, window, passes),
        lambda: x_pad[ids_pad],
    )
    return out[:E]


USE_WINDOWED_GATHER = False
# Measured (v5e, E=2.1M F=128, batched 128-node graphs, scan-timed): XLA's
# row gather is locality-sensitive — 5.3 ms when ids are graph-local (the
# collate guarantee) vs ~46 ms for global-random ids. The windowed kernel's
# best config (T=1024/W=512/p3) lands at 6.6 ms, p1-bf16 at 5.4 ms: it only
# TIES XLA on the workloads where its locality precondition holds, so it
# stays off by default and exists as infrastructure (and as the measurement
# that settled where the SpMM time actually goes — see bench.py).


def gather_rows_auto(x: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Row gather with an optional windowed-Pallas path (off by default —
    XLA's gather already runs at the same speed on graph-local ids)."""
    use_pallas = (
        USE_WINDOWED_GATHER
        and x.ndim == 2
        and ids.ndim == 1
        and x.shape[1] % LANES == 0
        and x.dtype in (jnp.float32, jnp.bfloat16)
        and ids.shape[0] >= 4 * TILE
        and jax.default_backend() not in ("cpu", "gpu")
    )
    if use_pallas:
        return gather_rows_windowed(x, ids)
    return x[ids]
