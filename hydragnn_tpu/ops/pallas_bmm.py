"""Pallas block-diagonal batched matmul for the dense-adjacency SpMM.

``adjacency_spmm`` (ops/segment.py) computes out[g] = A[g] @ x[g] over
[G, S, S] x [G, S, F] — G thousands of tiny per-graph matmuls. XLA's
generic batched-GEMM schedule reaches only ~100 GB/s of the v5e's
~350 GB/s measured stream on this shape (1.65 ms for a 168 MB workload);
this kernel streams GB-graph blocks through VMEM and issues one MXU dot
per graph, hitting the memory bound.

Exactness: A is exact in bf16 (integer multiplicities < 256). For fp32 x
the kernel uses a 3-term bf16 mantissa split of x (error ~2^-24, matching
the XLA Precision.HIGHEST path it replaces); bf16 x runs single-pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(a_ref, x_ref, o_ref, *, GB: int, passes: int):
    fp32 = x_ref.dtype == jnp.float32
    xb = x_ref[:]
    if fp32 and passes > 1:
        terms = []
        rem = xb
        for _ in range(passes):
            t = rem.astype(jnp.bfloat16)
            rem = rem - t.astype(jnp.float32)
            terms.append(t)
    else:
        terms = [xb.astype(jnp.bfloat16)]
    for b in range(GB):
        A = a_ref[b]
        acc = None
        for t in terms:
            d = jnp.dot(A, t[b], preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        o_ref[b] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("graphs_per_block", "passes"))
def bmm_blockdiag(
    adj: jnp.ndarray,   # [G, S, S] bf16 (or castable)
    xg: jnp.ndarray,    # [G, S, F]
    graphs_per_block: int = 8,
    passes: int = 3,
) -> jnp.ndarray:
    """einsum('gij,gjf->gif') with A exact-bf16; returns xg.dtype."""
    G, S, _ = adj.shape
    F = xg.shape[-1]
    GB = graphs_per_block
    while G % GB:
        GB //= 2
    a16 = adj if adj.dtype == jnp.bfloat16 else adj.astype(jnp.bfloat16)
    out = pl.pallas_call(
        functools.partial(_kernel, GB=GB, passes=passes),
        grid=(G // GB,),
        in_specs=[
            pl.BlockSpec((GB, S, S), lambda g: (g, 0, 0)),
            pl.BlockSpec((GB, S, F), lambda g: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((GB, S, F), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((G, S, F), xg.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * G * S * S * F * (passes if xg.dtype == jnp.float32
                                       else 1),
            bytes_accessed=G * S * S * 2 + 2 * G * S * F * xg.dtype.itemsize,
            transcendentals=0,
        ),
    )(a16, xg)
    return out
