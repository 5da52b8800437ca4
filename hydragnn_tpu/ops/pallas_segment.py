"""Pallas TPU kernel: CSR segment-sum (message aggregation) on the MXU.

Motivation: XLA's scatter-add lowering for ``jax.ops.segment_sum`` achieves
~5% of HBM speed-of-light on TPU for typical GNN workloads (measured on
v5e: ~37 GB/s). This kernel reformulates the sorted-edge segment reduction as
a sequence of one-hot × message matmuls on the MXU:

    out[rows R_b] = OneHot[R_b, E_b] @ msgs[E_b, F]

Edges are pre-sorted by receiver (done at collate; ref contract:
torch_scatter segment ops over PyG's sorted edge_index — hydragnn/models/
Base.py:18). Per row-block edge ranges come from a prefetched CSR row_ptr;
message tiles are double-buffered HBM->VMEM DMA.

The backward of segment-sum is a plain gather (fast on TPU), provided via
custom VJP. For full SpMM (gather+scatter) use ``ops.spmm.spmm`` which routes
the backward scatter through this kernel with a sender-sorted permutation.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows per program; edges per DMA tile
ROW_BLOCK = 256
EDGE_TILE = 512


def _csr_kernel(
    row_ptr_ref,  # scalar prefetch: [num_blocks + 1] edge offsets per row block
    recv_ref,  # [E_pad, 1] int32 receivers (HBM)
    msgs_ref,  # [E_pad, F] float (HBM)
    out_ref,  # [ROW_BLOCK, F] (VMEM)
    msg_scratch,  # [2, EDGE_TILE, F] VMEM
    recv_scratch,  # [2, EDGE_TILE, 1] VMEM
    sems,  # DMA sems [2, 2]
    *,
    acc_dtype,
):
    b = pl.program_id(0)
    start = row_ptr_ref[b]
    end = row_ptr_ref[b + 1]
    row_base = b * ROW_BLOCK
    # DMA whole aligned tiles covering [start, end); edges outside the block
    # in boundary tiles are masked out by the one-hot row match (their sorted
    # receivers fall outside [row_base, row_base+R)).
    t0 = start // EDGE_TILE
    t1 = jnp.maximum(pl.cdiv(end, EDGE_TILE), t0)

    def get_dma(slot, t):
        off = pl.multiple_of(t * EDGE_TILE, EDGE_TILE)
        return (
            pltpu.make_async_copy(
                msgs_ref.at[pl.ds(off, EDGE_TILE), :],
                msg_scratch.at[slot],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                recv_ref.at[pl.ds(off, EDGE_TILE), :],
                recv_scratch.at[slot],
                sems.at[slot, 1],
            ),
        )

    @pl.when(t1 > t0)
    def _():
        for d in get_dma(0, t0):
            d.start()

    def body(t, acc):
        slot = jax.lax.rem(t - t0, 2)
        nxt = jax.lax.rem(t - t0 + 1, 2)

        @pl.when(t + 1 < t1)
        def _():
            for d in get_dma(nxt, t + 1):
                d.start()

        for d in get_dma(slot, t):
            d.wait()

        recv = recv_scratch[slot]  # [T, 1]
        msgs = msg_scratch[slot]  # [T, F]
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (EDGE_TILE, ROW_BLOCK), 1
        ) + row_base
        onehot = (recv == rows).astype(msgs.dtype)
        # MXU: [R, T] @ [T, F]
        acc = acc + jax.lax.dot_general(
            onehot,
            msgs,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=acc_dtype,
        )
        return acc

    acc = jnp.zeros((ROW_BLOCK, out_ref.shape[1]), acc_dtype)
    acc = jax.lax.fori_loop(t0, t1, body, acc)
    out_ref[:] = acc.astype(out_ref.dtype)


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def segment_sum_csr(msgs: jnp.ndarray, receivers: jnp.ndarray, num_nodes: int):
    """out[i] = sum over edges e with receivers[e]==i of msgs[e].

    ``receivers`` MUST be sorted ascending (padding edges point at
    num_nodes-1). Shapes: msgs [E, F], receivers [E]; returns [num_nodes, F].
    """
    return _segment_sum_csr_impl(msgs, receivers, num_nodes)


def _segment_sum_csr_impl(msgs, receivers, num_nodes):
    E, F = msgs.shape
    N_pad = _round_up(num_nodes, ROW_BLOCK)
    E_pad = _round_up(E, EDGE_TILE)
    num_blocks = N_pad // ROW_BLOCK

    if E_pad != E:
        msgs = jnp.pad(msgs, ((0, E_pad - E), (0, 0)))
        # padding edges target an out-of-range row -> contribute nowhere
        receivers = jnp.pad(
            receivers, (0, E_pad - E), constant_values=np.int32(2**31 - 2)
        )

    # CSR row offsets at block granularity: first edge of each row block
    block_rows = jnp.arange(num_blocks + 1, dtype=jnp.int32) * ROW_BLOCK
    row_ptr = jnp.searchsorted(receivers, block_rows, side="left").astype(jnp.int32)
    # clamp to the real edge count: padded tail must still be DMA-safe
    row_ptr = jnp.minimum(row_ptr, E_pad)

    recv2d = receivers.reshape(E_pad, 1).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # recv
            pl.BlockSpec(memory_space=pltpu.ANY),  # msgs
        ],
        out_specs=pl.BlockSpec(
            (ROW_BLOCK, F), lambda b, *_: (b, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, EDGE_TILE, F), msgs.dtype),
            pltpu.VMEM((2, EDGE_TILE, 1), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_csr_kernel, acc_dtype=jnp.float32),
        out_shape=jax.ShapeDtypeStruct((N_pad, F), msgs.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * E_pad * ROW_BLOCK * F,
            bytes_accessed=E_pad * F * 4 + N_pad * F * 4 + E_pad * 4,
            transcendentals=0,
        ),
    )(row_ptr, recv2d, msgs)
    return out[:num_nodes]


def _fwd(msgs, receivers, num_nodes):
    return _segment_sum_csr_impl(msgs, receivers, num_nodes), receivers


def _bwd(num_nodes, receivers, g):
    # d(segment_sum)/d(msgs) = gather of cotangent rows
    return (g[receivers], None)


segment_sum_csr.defvjp(_fwd, _bwd)


def segment_sum_auto(
    msgs: jnp.ndarray,
    receivers: jnp.ndarray,
    num_nodes: int,
    indices_are_sorted: bool = True,
) -> jnp.ndarray:
    """Pallas CSR kernel on TPU for 2-D float messages; XLA fallback elsewhere."""
    use_pallas = (
        indices_are_sorted
        and msgs.ndim == 2
        and msgs.shape[1] % 128 == 0
        and jax.default_backend() not in ("cpu", "gpu")
    )
    if use_pallas:
        return segment_sum_csr(msgs, receivers, num_nodes)
    return jax.ops.segment_sum(
        msgs, receivers, num_nodes, indices_are_sorted=indices_are_sorted
    )
