"""Fused slotted EGNN edge-chain kernel (Pallas, TPU).

The EGNN conv's hot chain is gather(pre_s) + gather(pre_d) + geom ->
relu -> edge MLP matmul -> relu -> mask -> segment-sum-by-sender
(models/egnn.py E_GCL; ref: hydragnn/models/EGCLStack.py:273-298). Run
unfused, every stage materializes an [E, H] tensor in HBM (~227 MB each at
the GFM shape E=131k, H=866 bf16) and the step is HBM-bound at ~22% MFU
(bench/results/train_step_r2.md). This kernel runs the WHOLE chain
per-graph-block inside VMEM:

  grid (G, K): one graph slot x one edge chunk per step
  gathers + the sender segment-sum are one-hot MXU matmuls against the
  slot-local [S, ET] match matrix (same idiom as ops/pallas_segment.py)
  the [E, H] intermediates never touch HBM; per-layer HBM traffic drops
  from ~GBs to reads of pre_s/pre_d [N, Hp] + the weight + writes of
  agg [N, Hp]

Layout contract (collate(node_slot=S, edge_slot=Eg)): graph g owns node
rows [g*S, (g+1)*S) and edge rows [g*Eg, (g+1)*Eg); every edge of graph g
has both endpoints inside its slot; padding edges point at node N-1 which
matches no row of a real graph's slot -> their one-hot rows/columns are
zero and they are excluded from gathers AND the scatter by construction
(the trailing padding-graph block aggregates garbage that downstream masks
discard, same contract as the unfused path).

Backward (custom VJP) recomputes the forward per chunk (remat: ~33% extra
MXU FLOPs instead of [E, H] residual traffic) and accumulates dW/db/dWg in
VMEM across the sequential TPU grid.

Hidden width is padded to a 128-lane multiple internally (866 -> 896): pad
columns of pre/W/b are exact zeros through relu, so results equal the
unpadded math; XLA's own relayout of misaligned [E, 866] tensors is what
made the unfused path slow.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _onehot(ids, s_rows: int, row_base, et: int, dtype):
    """[S, ET] match matrix: one[n, e] = (ids[e] == row_base + n).

    ids is an [ET//LANES, LANES] int32 array of global node ids."""
    rowids = (
        jax.lax.broadcasted_iota(jnp.int32, (s_rows, LANES), 0) + row_base
    )
    sub = et // LANES
    return jnp.concatenate(
        [
            (rowids == ids[si : si + 1, :]).astype(dtype)
            for si in range(sub)
        ],
        axis=1,
    )


def scale_edge_tile(
    et: int, width: int, itemsize: int, n_live: int,
    budget: int = 15 * 2**20, floor: int = 128, fixed: int = 0,
) -> int:
    """Largest power-of-two edge tile <= ``et`` whose ~``n_live`` live
    [ET, width] intermediates fit the 16 MB scoped VMEM limit after the
    ``fixed`` block costs (weight matrices + node blocks resident for the
    whole kernel). Cost model ``width * n_live * (2 + itemsize)`` bytes
    per edge-row (≈half the lives f32, half compute-dtype, plus pipeline
    double-buffering), calibrated on three measurements at Hp=896: the
    bf16 fwd/bwd pair fits at ET=512 (round 3), the fp32 bwd OOMs there
    at 29.4 MB, and the bf16 SECOND-ORDER kernel (3 resident [Hp, Hp]
    blocks) overflows by 0.5 MB at ET=256 — only ET=128 fits."""
    budget = max(budget - fixed, 0)
    while et > floor and et * width * n_live * (2 + itemsize) > budget:
        et //= 2
    return et


def pick_edge_tiles(Hp: int, itemsize: int):
    """Empirical (ET, ET2) edge-tile table for the [Hp, Hp]-weight edge-
    chain kernels (EGNN / SchNet). Calibration points on v5e (16 MB scoped
    VMEM): bf16 fwd/bwd fits Hp=896 at ET=512 (round 3); fp32 bwd OOMs
    there at 29.4 MB (needs 256); the bf16 second-order kernel — three
    resident [Hp, Hp] blocks + ~13 edge lives — overflows Hp=896 by
    0.5 MB at ET2=256, so 128."""
    if itemsize <= 2:
        et = 512
        et2 = 512 if Hp <= 256 else (256 if Hp <= 512 else 128)
    else:
        et = 512 if Hp <= 512 else 256
        et2 = 256 if Hp <= 512 else 128
    return et, et2


def second_order_supported(hidden: int, dtype) -> bool:
    """Whether the fused chain's second-order kernel fits VMEM at this
    width: the bwd2 kernel holds THREE resident [Hp, Hp] weight blocks
    (w1, its cotangent, and the accumulator) plus ~13 live [ET, Hp] edge
    tensors, and ET cannot go below one lane tile (128). bf16 fits up to
    Hp=1024 at ET2=128; fp32's resident blocks alone reach ~12 MB past
    Hp=640, leaving no room for even one 128-row tile. Callers fall back
    to the unfused XLA path when this returns False."""
    Hp = _round_up(hidden, LANES)
    if jnp.dtype(dtype).itemsize <= 2:
        return Hp <= 1024
    return Hp <= 512


def _rechunk_ids(a, G: int, sub: int, sub_pad: int, et_new: int):
    """Re-chunk a [G*K, sub_pad, LANES] id array (pad rows sentinel-filled
    at each chunk tail) to a new edge tile — used by the second-order
    kernels, which need smaller tiles than the fwd/bwd pair."""
    K = a.shape[0] // G
    flat = a[:, :sub, :].reshape(G, K * sub, LANES)
    sub2 = et_new // LANES
    K2 = (K * sub) // sub2
    b = flat.reshape(G * K2, sub2, LANES)
    sub2_pad = _round_up(sub2, 8)
    if sub2_pad != sub2:
        b = jnp.pad(
            b, ((0, 0), (0, sub2_pad - sub2), (0, 0)),
            constant_values=np.int32(2**31 - 2),
        )
    return b


def _chunk_ids(ids_ref, k, sub: int):
    """Chunk k's [sub, LANES] id rows. The index array is laid out
    [G*K, sub_pad, LANES] with sub_pad = roundup(sub, 8) (Mosaic needs
    8-divisible sublane blocks) and sentinel-filled pad rows; the block
    index_map already selected chunk (g, k), so only a STATIC row slice
    remains (Mosaic cannot lower dynamic_slice on values)."""
    del k
    return ids_ref[0][:sub]


def _fwd_kernel(
    s_ref,      # [1, Eg//LANES, LANES] int32 senders (global ids)
    r_ref,      # [1, Eg//LANES, LANES] int32 receivers
    geo_ref,    # [ET, GD] geom features
    pre_s_ref,  # [S, Hp]
    pre_d_ref,  # [S, Hp]
    wg_ref,     # [GD, Hp]
    w1_ref,     # [Hp, Hp]
    b1_ref,     # [1, Hp]
    agg_ref,    # [S, Hp] f32 out (accumulated over k)
    *,
    S: int,
    ET: int,
    GD: int,
):
    g = pl.program_id(0)
    k = pl.program_id(1)
    dt = pre_s_ref.dtype
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)
    sub = ET // LANES
    oh_s = _onehot(_chunk_ids(s_ref, k, sub), S, g * S, ET, dt)  # [S, ET]
    oh_r = _onehot(_chunk_ids(r_ref, k, sub), S, g * S, ET, dt)
    cdims = (((0,), (0,)), ((), ()))
    z0 = jax.lax.dot_general(
        oh_s, pre_s_ref[:], cdims, preferred_element_type=jnp.float32, precision=prec
    ) + jax.lax.dot_general(
        oh_r, pre_d_ref[:], cdims, preferred_element_type=jnp.float32,
        precision=prec,
    )
    geo = geo_ref[:].astype(jnp.float32)
    for d in range(GD):
        z0 = z0 + geo[:, d : d + 1] * wg_ref[d : d + 1, :].astype(
            jnp.float32
        )
    m1 = jnp.maximum(z0, 0.0).astype(dt)  # [ET, Hp]
    z2 = (
        jnp.dot(m1, w1_ref[:], preferred_element_type=jnp.float32,
                precision=prec)
        + b1_ref[:].astype(jnp.float32)
    )
    m2 = jnp.maximum(z2, 0.0).astype(dt)
    part = jax.lax.dot_general(
        oh_s, m2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )  # [S, Hp]

    @pl.when(k == 0)
    def _():
        agg_ref[:] = jnp.zeros_like(agg_ref)

    agg_ref[:] += part


def _bwd2_kernel(
    s_ref, r_ref, geo_ref, pre_s_ref, pre_d_ref, wg_ref, w1_ref, b1_ref,
    u_ref,        # [S, Hp] dagg (the first-order cotangent seed, f32)
    vps_ref,      # [S, Hp] cotangent of dpre_s (f32)
    vpd_ref,      # [S, Hp] cotangent of dpre_d
    vgeo_ref,     # [ET, GD] cotangent of dgeo
    vwg_ref,      # [GD, Hp] cotangent of dwg
    vw1_ref,      # [Hp, Hp] cotangent of dw1
    vb1_ref,      # [1, Hp] cotangent of db1
    cps_ref,      # [S, Hp] f32 out: cotangent of pre_s (acc over k)
    cpd_ref,      # [S, Hp] f32 out: cotangent of pre_d
    cgeo_ref,     # [ET, GD] f32 out: cotangent of geom
    cwg_ref,      # [GD, Hp] f32 out: cotangent of wg (acc over all)
    cw1_ref,      # [Hp, Hp] f32 out: cotangent of w1 (acc over all)
    cu_ref,       # [S, Hp] f32 out: cotangent of dagg (acc over k)
    *,
    S: int,
    ET: int,
    GD: int,
):
    """VJP of the backward map B (``_bwd_kernel``) — the second-order kernel
    that makes the fused chain differentiable under grad-of-grad (energy-
    force training). ReLU gates are a.e.-constant, so this equals XLA's own
    reverse-over-reverse of the unfused chain exactly (relu'' = 0 a.e.;
    b1's cotangent is identically 0 since b1 enters B only through gates).

    Adjoint algebra (per chunk; OHs/OHr the [S, ET] one-hot match matrices,
    G1 = [z0>0], G2 = [z2>0], dz2/dz0 the recomputed first-order adjoints):
      a_dz0 = OHs^T vps + OHr^T vpd + vgeo wg + geo vwg
      a_dm1 = G1 . a_dz0
      a_dz2 = a_dm1 w1 + m1 vw1 + 1 vb1
      a_dm2 = G2 . a_dz2          ->  c_u   = OHs a_dm2
      c_w1  = a_dm1^T dz2
      c_m1  = dz2 vw1^T;  c_z0 = G1 . c_m1
      c_ps  = OHs c_z0;  c_pd = OHr c_z0
      c_geo = c_z0 wg^T + dz0 vwg^T
      c_wg  = geo^T c_z0 + vgeo^T dz0
    """
    g = pl.program_id(0)
    k = pl.program_id(1)
    dt = pre_s_ref.dtype
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)
    sub = ET // LANES
    oh_s = _onehot(_chunk_ids(s_ref, k, sub), S, g * S, ET, dt)
    oh_r = _onehot(_chunk_ids(r_ref, k, sub), S, g * S, ET, dt)
    cdims = (((0,), (0,)), ((), ()))
    scatter = (((1,), (0,)), ((), ()))

    # ---- recompute the forward chunk (z0 gates, m1, z2 gates)
    z0 = jax.lax.dot_general(
        oh_s, pre_s_ref[:], cdims, preferred_element_type=jnp.float32,
        precision=prec,
    ) + jax.lax.dot_general(
        oh_r, pre_d_ref[:], cdims, preferred_element_type=jnp.float32,
        precision=prec,
    )
    geo = geo_ref[:].astype(jnp.float32)
    for d in range(GD):
        z0 = z0 + geo[:, d : d + 1] * wg_ref[d : d + 1, :].astype(
            jnp.float32
        )
    m1 = jnp.maximum(z0, 0.0).astype(dt)
    z2 = (
        jnp.dot(m1, w1_ref[:], preferred_element_type=jnp.float32,
                precision=prec)
        + b1_ref[:].astype(jnp.float32)
    )

    # ---- recompute the first-order adjoints dz2, dz0 (needed as VALUES)
    dm2 = jax.lax.dot_general(
        oh_s, u_ref[:].astype(dt), cdims,
        preferred_element_type=jnp.float32, precision=prec,
    )
    dz2 = jnp.where(z2 > 0.0, dm2, 0.0).astype(dt)
    dm1 = jax.lax.dot_general(
        dz2, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    dz0 = jnp.where(z0 > 0.0, dm1, 0.0).astype(dt)

    # ---- adjoints of the backward map
    a_dz0 = jax.lax.dot_general(
        oh_s, vps_ref[:].astype(dt), cdims,
        preferred_element_type=jnp.float32, precision=prec,
    ) + jax.lax.dot_general(
        oh_r, vpd_ref[:].astype(dt), cdims,
        preferred_element_type=jnp.float32, precision=prec,
    )
    vgeo = vgeo_ref[:].astype(jnp.float32)
    for d in range(GD):
        a_dz0 = a_dz0 + vgeo[:, d : d + 1] * wg_ref[d : d + 1, :].astype(
            jnp.float32
        )
        a_dz0 = a_dz0 + geo[:, d : d + 1] * vwg_ref[d : d + 1, :].astype(
            jnp.float32
        )
    a_dm1 = jnp.where(z0 > 0.0, a_dz0, 0.0).astype(dt)
    a_dz2 = (
        jnp.dot(a_dm1, w1_ref[:], preferred_element_type=jnp.float32,
                precision=prec)
        + jnp.dot(m1, vw1_ref[:], preferred_element_type=jnp.float32,
                  precision=prec)
        + vb1_ref[:].astype(jnp.float32)
    )
    a_dm2 = jnp.where(z2 > 0.0, a_dz2, 0.0).astype(dt)
    cu = jax.lax.dot_general(
        oh_s, a_dm2, scatter, preferred_element_type=jnp.float32,
        precision=prec,
    )  # [S, Hp]

    cw1_part = jax.lax.dot_general(
        a_dm1, dz2, cdims, preferred_element_type=jnp.float32,
        precision=prec,
    )  # [Hp, Hp]
    cm1 = jax.lax.dot_general(
        dz2, vw1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    cz0 = jnp.where(z0 > 0.0, cm1, 0.0).astype(dt)
    cps = jax.lax.dot_general(
        oh_s, cz0, scatter, preferred_element_type=jnp.float32,
        precision=prec,
    )
    cpd = jax.lax.dot_general(
        oh_r, cz0, scatter, preferred_element_type=jnp.float32,
        precision=prec,
    )
    cz0f = cz0.astype(jnp.float32)
    dz0f = dz0.astype(jnp.float32)
    cgeo_cols = [
        jnp.sum(cz0f * wg_ref[d : d + 1, :].astype(jnp.float32), axis=1,
                keepdims=True)
        + jnp.sum(dz0f * vwg_ref[d : d + 1, :].astype(jnp.float32), axis=1,
                  keepdims=True)
        for d in range(GD)
    ]
    cgeo_ref[:] = jnp.concatenate(cgeo_cols, axis=1)
    cwg_part = jax.lax.dot_general(
        geo.astype(dt), cz0, cdims, preferred_element_type=jnp.float32,
        precision=prec,
    ) + jax.lax.dot_general(
        vgeo.astype(dt), dz0, cdims, preferred_element_type=jnp.float32,
        precision=prec,
    )

    first = jnp.logical_and(g == 0, k == 0)

    @pl.when(k == 0)
    def _():
        cps_ref[:] = jnp.zeros_like(cps_ref)
        cpd_ref[:] = jnp.zeros_like(cpd_ref)
        cu_ref[:] = jnp.zeros_like(cu_ref)

    cps_ref[:] += cps
    cpd_ref[:] += cpd
    cu_ref[:] += cu

    @pl.when(first)
    def _():
        cw1_ref[:] = jnp.zeros_like(cw1_ref)
        cwg_ref[:] = jnp.zeros_like(cwg_ref)

    cw1_ref[:] += cw1_part
    cwg_ref[:] += cwg_part


def _bwd_kernel(
    s_ref, r_ref, geo_ref, pre_s_ref, pre_d_ref, wg_ref, w1_ref, b1_ref,
    dagg_ref,     # [S, Hp] cotangent of agg (f32)
    dpre_s_ref,   # [S, Hp] f32 out (acc over k)
    dpre_d_ref,   # [S, Hp] f32 out
    dgeo_ref,     # [ET, GD] f32 out
    dwg_ref,      # [GD, Hp] f32 out (acc over all)
    dw1_ref,      # [Hp, Hp] f32 out (acc over all)
    db1_ref,      # [1, Hp] f32 out (acc over all)
    *,
    S: int,
    ET: int,
    GD: int,
):
    g = pl.program_id(0)
    k = pl.program_id(1)
    dt = pre_s_ref.dtype
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)
    sub = ET // LANES
    oh_s = _onehot(_chunk_ids(s_ref, k, sub), S, g * S, ET, dt)
    oh_r = _onehot(_chunk_ids(r_ref, k, sub), S, g * S, ET, dt)
    cdims = (((0,), (0,)), ((), ()))
    # ---- recompute forward chunk
    z0 = jax.lax.dot_general(
        oh_s, pre_s_ref[:], cdims, preferred_element_type=jnp.float32, precision=prec
    ) + jax.lax.dot_general(
        oh_r, pre_d_ref[:], cdims, preferred_element_type=jnp.float32,
        precision=prec,
    )
    geo = geo_ref[:].astype(jnp.float32)
    for d in range(GD):
        z0 = z0 + geo[:, d : d + 1] * wg_ref[d : d + 1, :].astype(
            jnp.float32
        )
    m1 = jnp.maximum(z0, 0.0).astype(dt)
    z2 = (
        jnp.dot(m1, w1_ref[:], preferred_element_type=jnp.float32,
                precision=prec)
        + b1_ref[:].astype(jnp.float32)
    )
    # ---- backward
    dm2 = jax.lax.dot_general(
        oh_s, dagg_ref[:].astype(dt), cdims,
        preferred_element_type=jnp.float32, precision=prec,
    )  # [ET, Hp]
    dz2 = jnp.where(z2 > 0.0, dm2, 0.0).astype(dt)
    # dm1 = dz2 @ W1^T (contract last-last: no transpose materialized)
    dm1 = jax.lax.dot_general(
        dz2, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    dz0 = jnp.where(z0 > 0.0, dm1, 0.0).astype(dt)
    dps = jax.lax.dot_general(
        oh_s, dz0, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )  # [S, Hp]
    dpd = jax.lax.dot_general(
        oh_r, dz0, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    # dgeom[e, d] = sum_h dz0[e, h] wg[d, h]
    dz0f = dz0.astype(jnp.float32)
    dgeo_cols = [
        jnp.sum(dz0f * wg_ref[d : d + 1, :].astype(jnp.float32), axis=1,
                keepdims=True)
        for d in range(GD)
    ]
    dgeo_ref[:] = jnp.concatenate(dgeo_cols, axis=1)
    dw1_part = jax.lax.dot_general(
        m1, dz2, cdims, preferred_element_type=jnp.float32, precision=prec
    )  # [Hp, Hp]
    db1_part = jnp.sum(dz2.astype(jnp.float32), axis=0, keepdims=True)
    dwg_part = jax.lax.dot_general(
        geo.astype(dt), dz0, cdims, preferred_element_type=jnp.float32,
        precision=prec,
    )  # [GD, Hp]

    first = jnp.logical_and(g == 0, k == 0)

    @pl.when(k == 0)
    def _():
        dpre_s_ref[:] = jnp.zeros_like(dpre_s_ref)
        dpre_d_ref[:] = jnp.zeros_like(dpre_d_ref)

    dpre_s_ref[:] += dps
    dpre_d_ref[:] += dpd

    @pl.when(first)
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dwg_ref[:] = jnp.zeros_like(dwg_ref)

    dw1_ref[:] += dw1_part
    db1_ref[:] += db1_part
    dwg_ref[:] += dwg_part


@functools.lru_cache(maxsize=None)
def _make_core(G: int, S: int, Eg: int, ET: int, Hp: int, GD: int,
               ET2: Optional[int] = None):
    """custom-VJP fused edge-chain over padded/slotted arrays.

    Shapes: pre_s/pre_d [G*S, Hp], geom [G*Eg, GD], w1 [Hp, Hp], b1 [1, Hp],
    wg [GD, Hp], senders/receivers [G*Eg//LANES, LANES] int32 ->
    agg [G*S, Hp] f32. ``ET2``: the (smaller) edge tile of the second-order
    kernel, which holds ~1.5x more live [ET, Hp] intermediates.
    """
    ET2 = ET2 or ET
    K = Eg // ET
    sub_pad = _round_up(ET // LANES, 8)

    idx_spec = pl.BlockSpec((1, sub_pad, LANES), lambda g, k: (g * K + k, 0, 0))
    geo_spec = pl.BlockSpec((ET, GD), lambda g, k: (g * K + k, 0))
    node_spec = pl.BlockSpec((S, Hp), lambda g, k: (g, 0))
    wg_spec = pl.BlockSpec((GD, Hp), lambda g, k: (0, 0))
    w1_spec = pl.BlockSpec((Hp, Hp), lambda g, k: (0, 0))
    b1_spec = pl.BlockSpec((1, Hp), lambda g, k: (0, 0))

    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, S=S, ET=ET, GD=GD),
        grid=(G, K),
        in_specs=[idx_spec, idx_spec, geo_spec, node_spec, node_spec,
                  wg_spec, w1_spec, b1_spec],
        out_specs=pl.BlockSpec((S, Hp), lambda g, k: (g, 0)),
        out_shape=jax.ShapeDtypeStruct((G * S, Hp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * G * Eg * Hp * (Hp + 3 * S),
            bytes_accessed=G * (2 * S * Hp + Eg * GD) * 4 + Hp * Hp * 4,
            transcendentals=0,
        ),
    )

    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel, S=S, ET=ET, GD=GD),
        grid=(G, K),
        in_specs=[idx_spec, idx_spec, geo_spec, node_spec, node_spec,
                  wg_spec, w1_spec, b1_spec,
                  pl.BlockSpec((S, Hp), lambda g, k: (g, 0))],
        out_specs=[
            pl.BlockSpec((S, Hp), lambda g, k: (g, 0)),
            pl.BlockSpec((S, Hp), lambda g, k: (g, 0)),
            geo_spec,
            wg_spec,
            w1_spec,
            b1_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G * S, Hp), jnp.float32),
            jax.ShapeDtypeStruct((G * S, Hp), jnp.float32),
            jax.ShapeDtypeStruct((G * Eg, GD), jnp.float32),
            jax.ShapeDtypeStruct((GD, Hp), jnp.float32),
            jax.ShapeDtypeStruct((Hp, Hp), jnp.float32),
            jax.ShapeDtypeStruct((1, Hp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * G * Eg * Hp * (Hp + 2 * S),
            bytes_accessed=G * (5 * S * Hp + 2 * Eg * GD) * 4
            + 2 * Hp * Hp * 4,
            transcendentals=0,
        ),
    )

    K2 = Eg // ET2
    sub2_pad = _round_up(ET2 // LANES, 8)
    idx2_spec = pl.BlockSpec(
        (1, sub2_pad, LANES), lambda g, k: (g * K2 + k, 0, 0)
    )
    geo2_spec = pl.BlockSpec((ET2, GD), lambda g, k: (g * K2 + k, 0))
    bwd2_call = pl.pallas_call(
        functools.partial(_bwd2_kernel, S=S, ET=ET2, GD=GD),
        grid=(G, K2),
        in_specs=[idx2_spec, idx2_spec, geo2_spec, node_spec, node_spec,
                  wg_spec, w1_spec, b1_spec,
                  pl.BlockSpec((S, Hp), lambda g, k: (g, 0)),   # u (dagg)
                  pl.BlockSpec((S, Hp), lambda g, k: (g, 0)),   # vps
                  pl.BlockSpec((S, Hp), lambda g, k: (g, 0)),   # vpd
                  geo2_spec,                                     # vgeo
                  wg_spec,                                       # vwg
                  w1_spec,                                       # vw1
                  b1_spec],                                      # vb1
        out_specs=[
            pl.BlockSpec((S, Hp), lambda g, k: (g, 0)),  # c_pre_s
            pl.BlockSpec((S, Hp), lambda g, k: (g, 0)),  # c_pre_d
            geo2_spec,                                    # c_geom
            wg_spec,                                      # c_wg
            w1_spec,                                      # c_w1
            pl.BlockSpec((S, Hp), lambda g, k: (g, 0)),  # c_dagg
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G * S, Hp), jnp.float32),
            jax.ShapeDtypeStruct((G * S, Hp), jnp.float32),
            jax.ShapeDtypeStruct((G * Eg, GD), jnp.float32),
            jax.ShapeDtypeStruct((GD, Hp), jnp.float32),
            jax.ShapeDtypeStruct((Hp, Hp), jnp.float32),
            jax.ShapeDtypeStruct((G * S, Hp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * G * Eg * Hp * (Hp + 2 * S),
            bytes_accessed=G * (9 * S * Hp + 3 * Eg * GD) * 4
            + 4 * Hp * Hp * 4,
            transcendentals=0,
        ),
    )

    # The backward map B is ITSELF a differentiable op: grad-of-grad
    # (energy-force training differentiates the inner pos-VJP w.r.t.
    # params) reverse-differentiates B, which routes through B's own
    # custom VJP = the second-order kernel above. Same composition
    # pattern as ops/spmm.py's gather/segment custom VJPs.
    @jax.custom_vjp
    def bwd_op(pre_s, pre_d, geom, w1, b1, wg, dagg, s2d, r2d):
        return bwd_call(s2d, r2d, geom, pre_s, pre_d, wg, w1, b1, dagg)

    def bwd_op_fwd(pre_s, pre_d, geom, w1, b1, wg, dagg, s2d, r2d):
        # NOTE: deliberately re-enter the custom_vjp-wrapped bwd_op (not
        # the raw bwd_call): under an outer AD trace the fwd rule's body is
        # traced with that trace's tracers, and only the custom_vjp wrapper
        # keeps the pallas_call out of forward-mode (pallas kernels using
        # program_id cannot be jvp'd)
        out = bwd_op(pre_s, pre_d, geom, w1, b1, wg, dagg, s2d, r2d)
        return out, (pre_s, pre_d, geom, w1, b1, wg, dagg, s2d, r2d)

    def bwd_op_bwd(res, cots):
        pre_s, pre_d, geom, w1, b1, wg, dagg, s2d, r2d = res
        vps, vpd, vgeo, vwg, vw1, vb1 = cots
        dt = pre_s.dtype
        if ET2 != ET:
            sub = ET // LANES
            s2d = _rechunk_ids(s2d, G, sub, sub_pad, ET2)
            r2d = _rechunk_ids(r2d, G, sub, sub_pad, ET2)
        cps, cpd, cgeo, cwg, cw1, cu = bwd2_call(
            s2d, r2d, geom, pre_s, pre_d, wg, w1, b1,
            dagg.astype(jnp.float32),
            vps.astype(jnp.float32), vpd.astype(jnp.float32),
            vgeo.astype(jnp.float32), vwg.astype(jnp.float32),
            vw1.astype(jnp.float32), vb1.astype(jnp.float32),
        )
        return (
            cps.astype(dt), cpd.astype(dt), cgeo.astype(geom.dtype),
            cw1.astype(w1.dtype),
            # b1 enters B only through the z2 gates -> 0 a.e. (equals
            # XLA's relu second-order treatment)
            jnp.zeros_like(b1),
            cwg.astype(wg.dtype), cu.astype(jnp.float32), None, None,
        )

    bwd_op.defvjp(bwd_op_fwd, bwd_op_bwd)

    @jax.custom_vjp
    def core(pre_s, pre_d, geom, w1, b1, wg, s2d, r2d):
        return fwd_call(s2d, r2d, geom, pre_s, pre_d, wg, w1, b1)

    def core_fwd(pre_s, pre_d, geom, w1, b1, wg, s2d, r2d):
        # re-enter core (see bwd_op_fwd note): keeps the pallas_call
        # custom_vjp-protected when an outer AD trace replays this fwd rule
        out = core(pre_s, pre_d, geom, w1, b1, wg, s2d, r2d)
        return out, (pre_s, pre_d, geom, w1, b1, wg, s2d, r2d)

    def core_bwd(res, dagg):
        pre_s, pre_d, geom, w1, b1, wg, s2d, r2d = res
        dps, dpd, dgeo, dwg, dw1, db1 = bwd_op(
            pre_s, pre_d, geom, w1, b1, wg, dagg.astype(jnp.float32),
            s2d, r2d,
        )
        dt = pre_s.dtype
        return (
            dps.astype(dt), dpd.astype(dt), dgeo.astype(geom.dtype),
            dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dwg.astype(wg.dtype), None, None,
        )

    core.defvjp(core_fwd, core_bwd)
    return core


def egnn_edge_fused(
    pre_s: jnp.ndarray,     # [N, H] (N = G*S slotted)
    pre_d: jnp.ndarray,     # [N, H]
    geom: jnp.ndarray,      # [E, GD] (E = G*Eg slotted)
    w1: jnp.ndarray,        # [H, H] edge_mlp_1 kernel
    b1: jnp.ndarray,        # [H]
    wg: jnp.ndarray,        # [GD, H] geom kernel
    senders: jnp.ndarray,   # [E] int32 global node ids
    receivers: jnp.ndarray, # [E] int32
    node_slot: int,
    edge_slot: int,
    edge_tile: Optional[int] = None,
) -> jnp.ndarray:
    """agg[n] = sum over edges e with senders[e]==n of
    relu(relu(pre_s[s_e] + pre_d[r_e] + geom_e @ wg) @ w1 + b1).

    Returns [N, H] in pre_s.dtype. Requires the slotted collate layout
    (see module docstring)."""
    N, H = pre_s.shape
    E, GD = geom.shape
    S, Eg = node_slot, edge_slot
    G = N // S
    assert G * S == N and G * Eg == E, (N, S, E, Eg)
    Hp = _round_up(H, LANES)
    dt = pre_s.dtype
    auto_et, auto_et2 = pick_edge_tiles(Hp, jnp.dtype(dt).itemsize)
    if edge_tile is None:
        import os

        edge_tile = min(
            Eg,
            int(os.getenv("HYDRAGNN_FUSED_EDGE_TILE", "0")) or auto_et,
        )
    while Eg % edge_tile:
        edge_tile //= 2
    et2 = min(edge_tile, auto_et2)
    while Eg % et2:
        et2 //= 2
    padH = Hp - H
    if padH:
        pre_s = jnp.pad(pre_s, ((0, 0), (0, padH)))
        pre_d = jnp.pad(pre_d, ((0, 0), (0, padH)))
        w1 = jnp.pad(w1, ((0, padH), (0, padH)))
        b1 = jnp.pad(b1, (0, padH))
        wg = jnp.pad(wg, ((0, 0), (0, padH)))
    core = _make_core(G, S, Eg, edge_tile, Hp, GD, et2)
    sub = edge_tile // LANES
    sub_pad = _round_up(sub, 8)
    K = Eg // edge_tile

    def _chunked(ids):
        a = ids.astype(jnp.int32).reshape(G * K, sub, LANES)
        if sub_pad != sub:
            # sentinel pad rows: match no node row -> zero one-hot columns
            a = jnp.pad(
                a, ((0, 0), (0, sub_pad - sub), (0, 0)),
                constant_values=np.int32(2**31 - 2),
            )
        return a

    s2d = _chunked(senders)
    r2d = _chunked(receivers)
    agg = core(
        pre_s, pre_d, geom.astype(dt), w1, b1.reshape(1, Hp), wg, s2d, r2d
    )
    return agg[:, :H].astype(dt)


def egnn_edge_reference(
    pre_s, pre_d, geom, w1, b1, wg, senders, receivers, num_nodes
):
    """Pure-XLA reference of the fused chain (for tests): padding edges
    (both endpoints at N-1) contribute only to node N-1."""
    m = pre_s[senders] + pre_d[receivers] + geom @ wg
    m = jax.nn.relu(m)
    m = jax.nn.relu(m @ w1 + b1)
    return jax.ops.segment_sum(m, senders, num_nodes)
