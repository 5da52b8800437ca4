"""Fused slotted PAINN message kernel (Pallas, TPU).

The PaiNN message chain — filter Dense on the sinc-RBF × cosine cutoff,
gather(scalar-MLP output) and gather(vector features) by the reference's
reversed flow (gather from edge_index[1] = receivers), elementwise gating
into (vector-gate, edge-gate, scalar-msg), vector message assembly, and the
two segment-sums into edge_index[0] = senders (models/painn.py PainnMessage;
ref: hydragnn/models/PAINNStack.py:194-265) — materializes [E, 3F] tensors
at every stage when run unfused (~680 MB per stage per direction at the GFM
shape, E=131k, F=866 bf16). Same per-graph-block design as
ops/pallas_egnn.py: one-hot MXU gathers/scatters against the slot-local
match matrix; [E, 3F] intermediates never touch HBM.

The VECTOR channel [N, 3, F] is handled by flattening to [N, 3F] d-major
(v_flat[:, d*Fp + f] = v[:, d, f]): gathers/scatters become ordinary wide
matmuls and the per-axis gating is an in-kernel broadcast — the layout
generalization the round-3 roadmap called out for PAINN.

Layout contract: collate(node_slot=S, edge_slot=Eg) — padding edges point
at node N-1 which matches no real block's rows, so they are excluded from
gathers and the scatter by construction (and their gathered features are
zero, zeroing the gates).

out_s[n] = sum over edges e with senders[e]==n of msg_s_e
out_v[n] = sum over the same edges of msg_v_e, where
  fw      = (rbf_e @ wf + bf) * cut_e                         [3F]
  fo      = fw * h[receivers[e]]                              [3F]
  (gate_v, gate_e, msg_s) = split(fo, 3)
  msg_v[d*F+f] = v_flat[receivers[e], d*F+f] * gate_v[f]
                 + gate_e[f] * diffn_e[d]

Backward (custom VJP) recomputes the forward per chunk; the backward is
itself a custom-VJP op whose backward is a second-order kernel
(_bwd2_kernel, round 4) — the whole chain is bilinear gating, so the
adjoint algebra has no transcendental second-order terms at all. Force
training keeps the fused message kernel.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hydragnn_tpu.ops.pallas_egnn import (
    LANES, _chunk_ids, _onehot, _round_up, scale_edge_tile,
)


def _fwd_kernel(
    s_ref, r_ref,
    rbf_ref,    # [ET, NR]
    cut_ref,    # [ET, 1]
    diff_ref,   # [ET, 3]  (diff / dist, the reference's double-normalized)
    h_ref,      # [S, 3Fp] scalar-MLP output rows of this slot
    v_ref,      # [S, 3Fp] flattened vector features
    wf_ref,     # [NR, 3Fp]
    bf_ref,     # [1, 3Fp]
    outs_ref,   # [S, Fp] f32 (acc over k)
    outv_ref,   # [S, 3Fp] f32 (acc over k)
    *,
    S: int,
    ET: int,
    Fp: int,
):
    g = pl.program_id(0)
    k = pl.program_id(1)
    dt = h_ref.dtype
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)
    sub = ET // LANES
    oh_s = _onehot(_chunk_ids(s_ref, k, sub), S, g * S, ET, dt)
    oh_r = _onehot(_chunk_ids(r_ref, k, sub), S, g * S, ET, dt)
    cdims = (((0,), (0,)), ((), ()))
    scatter = (((1,), (0,)), ((), ()))

    fw = (
        jnp.dot(rbf_ref[:], wf_ref[:], preferred_element_type=jnp.float32,
                precision=prec)
        + bf_ref[:].astype(jnp.float32)
    ) * cut_ref[:].astype(jnp.float32)
    gh = jax.lax.dot_general(
        oh_r, h_ref[:], cdims, preferred_element_type=jnp.float32,
        precision=prec,
    )
    fo = fw * gh  # [ET, 3Fp]
    gate_v = fo[:, :Fp]
    gate_e = fo[:, Fp : 2 * Fp]
    msg_s = fo[:, 2 * Fp :]
    gv = jax.lax.dot_general(
        oh_r, v_ref[:], cdims, preferred_element_type=jnp.float32,
        precision=prec,
    )
    diff = diff_ref[:].astype(jnp.float32)
    msg_v = jnp.concatenate(
        [gv[:, d * Fp : (d + 1) * Fp] * gate_v
         + gate_e * diff[:, d : d + 1] for d in range(3)],
        axis=1,
    )

    part_s = jax.lax.dot_general(
        oh_s, msg_s.astype(dt), scatter,
        preferred_element_type=jnp.float32, precision=prec,
    )
    part_v = jax.lax.dot_general(
        oh_s, msg_v.astype(dt), scatter,
        preferred_element_type=jnp.float32, precision=prec,
    )

    @pl.when(k == 0)
    def _():
        outs_ref[:] = jnp.zeros_like(outs_ref)
        outv_ref[:] = jnp.zeros_like(outv_ref)

    outs_ref[:] += part_s
    outv_ref[:] += part_v


def _bwd_kernel(
    s_ref, r_ref, rbf_ref, cut_ref, diff_ref, h_ref, v_ref, wf_ref, bf_ref,
    us_ref,     # [S, Fp] cotangent of out_s (f32)
    uv_ref,     # [S, 3Fp] cotangent of out_v
    dh_ref,     # [S, 3Fp] f32 out (acc over k)
    dv_ref,     # [S, 3Fp] f32 out (acc over k)
    drbf_ref,   # [ET, NR] f32 out
    dcut_ref,   # [ET, 1] f32 out
    ddiff_ref,  # [ET, 3] f32 out
    dwf_ref,    # [NR, 3Fp] f32 out (acc all)
    dbf_ref,    # [1, 3Fp] f32 out (acc all)
    *,
    S: int,
    ET: int,
    Fp: int,
):
    g = pl.program_id(0)
    k = pl.program_id(1)
    dt = h_ref.dtype
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)
    sub = ET // LANES
    oh_s = _onehot(_chunk_ids(s_ref, k, sub), S, g * S, ET, dt)
    oh_r = _onehot(_chunk_ids(r_ref, k, sub), S, g * S, ET, dt)
    cdims = (((0,), (0,)), ((), ()))
    scatter = (((1,), (0,)), ((), ()))
    ll = (((1,), (1,)), ((), ()))

    # ---- recompute forward chunk
    cut = cut_ref[:].astype(jnp.float32)
    z = (
        jnp.dot(rbf_ref[:], wf_ref[:], preferred_element_type=jnp.float32,
                precision=prec)
        + bf_ref[:].astype(jnp.float32)
    )
    fw = z * cut
    gh = jax.lax.dot_general(
        oh_r, h_ref[:], cdims, preferred_element_type=jnp.float32,
        precision=prec,
    )
    fo = fw * gh
    gate_v = fo[:, :Fp]
    gate_e = fo[:, Fp : 2 * Fp]
    gv = jax.lax.dot_general(
        oh_r, v_ref[:], cdims, preferred_element_type=jnp.float32,
        precision=prec,
    )
    diff = diff_ref[:].astype(jnp.float32)

    # ---- backward
    dmsg_s = jax.lax.dot_general(
        oh_s, us_ref[:].astype(dt), cdims,
        preferred_element_type=jnp.float32, precision=prec,
    )  # [ET, Fp]
    dmsg_v = jax.lax.dot_general(
        oh_s, uv_ref[:].astype(dt), cdims,
        preferred_element_type=jnp.float32, precision=prec,
    )  # [ET, 3Fp]

    dgv_blocks = []
    dgate_v = jnp.zeros((ET, Fp), jnp.float32)
    dgate_e = jnp.zeros((ET, Fp), jnp.float32)
    ddiff_cols = []
    for d in range(3):
        dmv_d = dmsg_v[:, d * Fp : (d + 1) * Fp]
        gv_d = gv[:, d * Fp : (d + 1) * Fp]
        dgv_blocks.append(dmv_d * gate_v)
        dgate_v = dgate_v + dmv_d * gv_d
        dgate_e = dgate_e + dmv_d * diff[:, d : d + 1]
        ddiff_cols.append(
            jnp.sum(dmv_d * gate_e, axis=1, keepdims=True)
        )
    ddiff_ref[:] = jnp.concatenate(ddiff_cols, axis=1)
    dgv = jnp.concatenate(dgv_blocks, axis=1)
    dfo = jnp.concatenate([dgate_v, dgate_e, dmsg_s], axis=1)  # [ET, 3Fp]

    dgh = dfo * fw
    dfw = dfo * gh
    dz = dfw * cut
    dcut_ref[:] = jnp.sum(dfw * z, axis=1, keepdims=True)
    drbf_ref[:] = jax.lax.dot_general(
        dz.astype(dt), wf_ref[:], ll,
        preferred_element_type=jnp.float32, precision=prec,
    )
    dwf_part = jax.lax.dot_general(
        rbf_ref[:], dz.astype(dt), cdims,
        preferred_element_type=jnp.float32, precision=prec,
    )
    dbf_part = jnp.sum(dz, axis=0, keepdims=True)
    dh_part = jax.lax.dot_general(
        oh_r, dgh.astype(dt), scatter,
        preferred_element_type=jnp.float32, precision=prec,
    )
    dv_part = jax.lax.dot_general(
        oh_r, dgv.astype(dt), scatter,
        preferred_element_type=jnp.float32, precision=prec,
    )

    @pl.when(k == 0)
    def _():
        dh_ref[:] = jnp.zeros_like(dh_ref)
        dv_ref[:] = jnp.zeros_like(dv_ref)

    dh_ref[:] += dh_part
    dv_ref[:] += dv_part

    first = jnp.logical_and(g == 0, k == 0)

    @pl.when(first)
    def _():
        dwf_ref[:] = jnp.zeros_like(dwf_ref)
        dbf_ref[:] = jnp.zeros_like(dbf_ref)

    dwf_ref[:] += dwf_part
    dbf_ref[:] += dbf_part


def _bwd2_kernel(
    s_ref, r_ref, rbf_ref, cut_ref, diff_ref, h_ref, v_ref, wf_ref, bf_ref,
    us_ref,      # [S, Fp] first-order cotangent of out_s (f32)
    uv_ref,      # [S, 3Fp] first-order cotangent of out_v
    vdh_ref,     # [S, 3Fp] cotangent of dh
    vdv_ref,     # [S, 3Fp] cotangent of dv
    vdrbf_ref,   # [ET, NR]
    vdcut_ref,   # [ET, 1]
    vddiff_ref,  # [ET, 3]
    vdwf_ref,    # [NR, 3Fp]
    vdbf_ref,    # [1, 3Fp]
    ch_ref,      # [S, 3Fp] f32 out (acc k): cotangent of h
    cv_ref,      # [S, 3Fp] f32 out (acc k): cotangent of v
    crbf_ref,    # [ET, NR] f32 out
    ccut_ref,    # [ET, 1] f32 out
    cdiff_ref,   # [ET, 3] f32 out
    cwf_ref,     # [NR, 3Fp] f32 out (acc all)
    cbf_ref,     # [1, 3Fp] f32 out (acc all)
    cus_ref,     # [S, Fp] f32 out (acc k): cotangent of us
    cuv_ref,     # [S, 3Fp] f32 out (acc k): cotangent of uv
    *,
    S: int,
    ET: int,
    Fp: int,
):
    """VJP of the backward map B (``_bwd_kernel``) — grad-of-grad support.
    The PaiNN message chain is pure bilinear gating (products of pairs of
    values), so B is bilinear in (inputs, cotangents) and its VJP needs
    only the recomputed values — no transcendental second-order terms."""
    g = pl.program_id(0)
    k = pl.program_id(1)
    dt = h_ref.dtype
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)
    sub = ET // LANES
    oh_s = _onehot(_chunk_ids(s_ref, k, sub), S, g * S, ET, dt)
    oh_r = _onehot(_chunk_ids(r_ref, k, sub), S, g * S, ET, dt)
    cdims = (((0,), (0,)), ((), ()))
    scatter = (((1,), (0,)), ((), ()))
    ll = (((1,), (1,)), ((), ()))

    # ---- recompute forward values
    cut = cut_ref[:].astype(jnp.float32)
    z = (
        jnp.dot(rbf_ref[:], wf_ref[:], preferred_element_type=jnp.float32,
                precision=prec)
        + bf_ref[:].astype(jnp.float32)
    )
    fw = z * cut
    gh = jax.lax.dot_general(
        oh_r, h_ref[:], cdims, preferred_element_type=jnp.float32,
        precision=prec,
    )
    fo = fw * gh
    gate_v = fo[:, :Fp]
    gate_e = fo[:, Fp : 2 * Fp]
    gv = jax.lax.dot_general(
        oh_r, v_ref[:], cdims, preferred_element_type=jnp.float32,
        precision=prec,
    )
    diff = diff_ref[:].astype(jnp.float32)

    # ---- recompute B's intermediates (values)
    dmsg_s = jax.lax.dot_general(
        oh_s, us_ref[:].astype(dt), cdims,
        preferred_element_type=jnp.float32, precision=prec,
    )
    dmsg_v = jax.lax.dot_general(
        oh_s, uv_ref[:].astype(dt), cdims,
        preferred_element_type=jnp.float32, precision=prec,
    )
    dgate_v = jnp.zeros((ET, Fp), jnp.float32)
    dgate_e = jnp.zeros((ET, Fp), jnp.float32)
    for d in range(3):
        dmv_d = dmsg_v[:, d * Fp : (d + 1) * Fp]
        dgate_v = dgate_v + dmv_d * gv[:, d * Fp : (d + 1) * Fp]
        dgate_e = dgate_e + dmv_d * diff[:, d : d + 1]
    dfo = jnp.concatenate([dgate_v, dgate_e, dmsg_s], axis=1)
    dfw = dfo * gh
    dz = dfw * cut

    # ---- adjoints of B
    a_dgh = jax.lax.dot_general(
        oh_r, vdh_ref[:].astype(dt), cdims,
        preferred_element_type=jnp.float32, precision=prec,
    )  # cot of dgh (dh = OHr dgh)
    a_dgv = jax.lax.dot_general(
        oh_r, vdv_ref[:].astype(dt), cdims,
        preferred_element_type=jnp.float32, precision=prec,
    )
    a_dz = jax.lax.dot_general(
        vdrbf_ref[:].astype(dt), wf_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ) + jnp.dot(
        rbf_ref[:], vdwf_ref[:], preferred_element_type=jnp.float32,
        precision=prec,
    ) + vdbf_ref[:].astype(jnp.float32)
    vdcut = vdcut_ref[:].astype(jnp.float32)
    a_dfw = a_dz * cut + vdcut * z
    a_dfo = a_dfw * gh + a_dgh * fw
    a_dgate_v = a_dfo[:, :Fp]
    a_dgate_e = a_dfo[:, Fp : 2 * Fp]
    a_dmsg_s = a_dfo[:, 2 * Fp :]
    vddiff = vddiff_ref[:].astype(jnp.float32)

    a_dmsg_v_blocks = []
    c_gate_v = jnp.zeros((ET, Fp), jnp.float32)
    c_gate_e = jnp.zeros((ET, Fp), jnp.float32)
    c_gv_blocks = []
    cdiff_cols = []
    for d in range(3):
        dmv_d = dmsg_v[:, d * Fp : (d + 1) * Fp]
        gv_d = gv[:, d * Fp : (d + 1) * Fp]
        a_dgv_d = a_dgv[:, d * Fp : (d + 1) * Fp]
        a_dmv_d = (
            a_dgate_v * gv_d
            + a_dgate_e * diff[:, d : d + 1]
            + vddiff[:, d : d + 1] * gate_e
            + a_dgv_d * gate_v
        )
        a_dmsg_v_blocks.append(a_dmv_d)
        c_gate_v = c_gate_v + a_dgv_d * dmv_d
        c_gate_e = c_gate_e + vddiff[:, d : d + 1] * dmv_d
        c_gv_blocks.append(a_dgate_v * dmv_d)
        cdiff_cols.append(
            jnp.sum(a_dgate_e * dmv_d, axis=1, keepdims=True)
        )
    a_dmsg_v = jnp.concatenate(a_dmsg_v_blocks, axis=1)
    cdiff_ref[:] = jnp.concatenate(cdiff_cols, axis=1)

    # cotangents of the first-order seeds
    cus = jax.lax.dot_general(
        oh_s, a_dmsg_s.astype(dt), scatter,
        preferred_element_type=jnp.float32, precision=prec,
    )
    cuv = jax.lax.dot_general(
        oh_s, a_dmsg_v.astype(dt), scatter,
        preferred_element_type=jnp.float32, precision=prec,
    )

    # primal-value cotangents
    c_fo = jnp.concatenate(
        [c_gate_v, c_gate_e, jnp.zeros((ET, Fp), jnp.float32)], axis=1
    )
    c_fw = a_dgh * dfo + c_fo * gh
    c_gh = a_dfw * dfo + c_fo * fw
    c_gv = jnp.concatenate(c_gv_blocks, axis=1)
    c_z = c_fw * cut + vdcut * dfw
    ccut_ref[:] = (
        jnp.sum(a_dz * dfw, axis=1, keepdims=True)
        + jnp.sum(c_fw * z, axis=1, keepdims=True)
    )
    crbf_ref[:] = jax.lax.dot_general(
        dz.astype(dt), vdwf_ref[:], ll,
        preferred_element_type=jnp.float32, precision=prec,
    ) + jax.lax.dot_general(
        c_z.astype(dt), wf_ref[:], ll,
        preferred_element_type=jnp.float32, precision=prec,
    )
    cwf_part = jax.lax.dot_general(
        vdrbf_ref[:].astype(dt), dz.astype(dt), cdims,
        preferred_element_type=jnp.float32, precision=prec,
    ) + jax.lax.dot_general(
        rbf_ref[:], c_z.astype(dt), cdims,
        preferred_element_type=jnp.float32, precision=prec,
    )
    cbf_part = jnp.sum(c_z, axis=0, keepdims=True)
    ch_part = jax.lax.dot_general(
        oh_r, c_gh.astype(dt), scatter,
        preferred_element_type=jnp.float32, precision=prec,
    )
    cv_part = jax.lax.dot_general(
        oh_r, c_gv.astype(dt), scatter,
        preferred_element_type=jnp.float32, precision=prec,
    )

    @pl.when(k == 0)
    def _():
        ch_ref[:] = jnp.zeros_like(ch_ref)
        cv_ref[:] = jnp.zeros_like(cv_ref)
        cus_ref[:] = jnp.zeros_like(cus_ref)
        cuv_ref[:] = jnp.zeros_like(cuv_ref)

    ch_ref[:] += ch_part
    cv_ref[:] += cv_part
    cus_ref[:] += cus
    cuv_ref[:] += cuv

    first = jnp.logical_and(g == 0, k == 0)

    @pl.when(first)
    def _():
        cwf_ref[:] = jnp.zeros_like(cwf_ref)
        cbf_ref[:] = jnp.zeros_like(cbf_ref)

    cwf_ref[:] += cwf_part
    cbf_ref[:] += cbf_part


def second_order_supported(hidden: int, dtype) -> bool:
    """VMEM feasibility of the PAINN second-order kernel at the ET=128
    floor: the node blocks are [S, 3Fp]-wide (~10 resident) and ~15
    [ET, 3Fp] edge lives (CALIBRATED: F=512 bf16 measured 16.21 MB scoped
    at ET2=128 — just over). Accuracy-relevant widths (F <= ~384) fit;
    larger PAINN force training falls back to the unfused message path."""
    Fp = _round_up(hidden, LANES)
    item = jnp.dtype(dtype).itemsize
    fixed = 64 * 3 * Fp * 40 + 32 * 3 * Fp * 12
    per_row = 3 * Fp * 15 * (2 + item)
    return fixed + 128 * per_row <= 15 * 2**20


@functools.lru_cache(maxsize=None)
def _make_core(G: int, S: int, Eg: int, ET: int, Fp: int, NR: int,
               ET2: int = 0):
    ET2 = ET2 or ET
    K = Eg // ET
    sub_pad = _round_up(ET // LANES, 8)

    idx_spec = pl.BlockSpec(
        (1, sub_pad, LANES), lambda g, k: (g * K + k, 0, 0)
    )
    rbf_spec = pl.BlockSpec((ET, NR), lambda g, k: (g * K + k, 0))
    cut_spec = pl.BlockSpec((ET, 1), lambda g, k: (g * K + k, 0))
    diff_spec = pl.BlockSpec((ET, 3), lambda g, k: (g * K + k, 0))
    node3_spec = pl.BlockSpec((S, 3 * Fp), lambda g, k: (g, 0))
    node1_spec = pl.BlockSpec((S, Fp), lambda g, k: (g, 0))
    wf_spec = pl.BlockSpec((NR, 3 * Fp), lambda g, k: (0, 0))
    bf_spec = pl.BlockSpec((1, 3 * Fp), lambda g, k: (0, 0))

    common = dict(
        grid=(G, K),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )
    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, S=S, ET=ET, Fp=Fp),
        in_specs=[idx_spec, idx_spec, rbf_spec, cut_spec, diff_spec,
                  node3_spec, node3_spec, wf_spec, bf_spec],
        out_specs=[node1_spec, node3_spec],
        out_shape=[
            jax.ShapeDtypeStruct((G * S, Fp), jnp.float32),
            jax.ShapeDtypeStruct((G * S, 3 * Fp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * G * Eg * 3 * Fp * (NR + 3 * S),
            bytes_accessed=G * (4 * S * 3 * Fp + Eg * NR) * 4,
            transcendentals=0,
        ),
        **common,
    )
    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel, S=S, ET=ET, Fp=Fp),
        in_specs=[idx_spec, idx_spec, rbf_spec, cut_spec, diff_spec,
                  node3_spec, node3_spec, wf_spec, bf_spec,
                  node1_spec, node3_spec],
        out_specs=[
            node3_spec, node3_spec, rbf_spec, cut_spec, diff_spec,
            wf_spec, bf_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G * S, 3 * Fp), jnp.float32),
            jax.ShapeDtypeStruct((G * S, 3 * Fp), jnp.float32),
            jax.ShapeDtypeStruct((G * Eg, NR), jnp.float32),
            jax.ShapeDtypeStruct((G * Eg, 1), jnp.float32),
            jax.ShapeDtypeStruct((G * Eg, 3), jnp.float32),
            jax.ShapeDtypeStruct((NR, 3 * Fp), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * Fp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * G * Eg * 3 * Fp * (NR + 3 * S),
            bytes_accessed=G * (8 * S * 3 * Fp + 2 * Eg * NR) * 4,
            transcendentals=0,
        ),
        **common,
    )

    K2 = Eg // ET2
    sub2_pad = _round_up(ET2 // LANES, 8)
    idx2_spec = pl.BlockSpec(
        (1, sub2_pad, LANES), lambda g, k: (g * K2 + k, 0, 0)
    )
    rbf2_spec = pl.BlockSpec((ET2, NR), lambda g, k: (g * K2 + k, 0))
    cut2_spec = pl.BlockSpec((ET2, 1), lambda g, k: (g * K2 + k, 0))
    diff2_spec = pl.BlockSpec((ET2, 3), lambda g, k: (g * K2 + k, 0))
    common2 = dict(common, grid=(G, K2))
    bwd2_call = pl.pallas_call(
        functools.partial(_bwd2_kernel, S=S, ET=ET2, Fp=Fp),
        in_specs=[idx2_spec, idx2_spec, rbf2_spec, cut2_spec, diff2_spec,
                  node3_spec, node3_spec, wf_spec, bf_spec,
                  node1_spec,   # us
                  node3_spec,   # uv
                  node3_spec,   # vdh
                  node3_spec,   # vdv
                  rbf2_spec,    # vdrbf
                  cut2_spec,    # vdcut
                  diff2_spec,   # vddiff
                  wf_spec, bf_spec],
        out_specs=[
            node3_spec, node3_spec,               # c_h, c_v
            rbf2_spec, cut2_spec, diff2_spec,     # c_rbf, c_cut, c_diff
            wf_spec, bf_spec,                     # c_wf, c_bf
            node1_spec, node3_spec,               # c_us, c_uv
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G * S, 3 * Fp), jnp.float32),
            jax.ShapeDtypeStruct((G * S, 3 * Fp), jnp.float32),
            jax.ShapeDtypeStruct((G * Eg, NR), jnp.float32),
            jax.ShapeDtypeStruct((G * Eg, 1), jnp.float32),
            jax.ShapeDtypeStruct((G * Eg, 3), jnp.float32),
            jax.ShapeDtypeStruct((NR, 3 * Fp), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * Fp), jnp.float32),
            jax.ShapeDtypeStruct((G * S, Fp), jnp.float32),
            jax.ShapeDtypeStruct((G * S, 3 * Fp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=12 * G * Eg * 3 * Fp * (NR + 3 * S),
            bytes_accessed=G * (16 * S * 3 * Fp + 4 * Eg * NR) * 4,
            transcendentals=0,
        ),
        **common2,
    )

    # second-order support: B is its own differentiable op (same pattern
    # and fwd-rule re-entrancy note as ops/pallas_egnn.py)
    @jax.custom_vjp
    def bwd_op(h, v, rbf, cut, diffn, wf, bf, us, uv, s2d, r2d):
        return bwd_call(s2d, r2d, rbf, cut, diffn, h, v, wf, bf, us, uv)

    def bwd_op_fwd(h, v, rbf, cut, diffn, wf, bf, us, uv, s2d, r2d):
        out = bwd_op(h, v, rbf, cut, diffn, wf, bf, us, uv, s2d, r2d)
        return out, (h, v, rbf, cut, diffn, wf, bf, us, uv, s2d, r2d)

    def bwd_op_bwd(res, cots):
        h, v, rbf, cut, diffn, wf, bf, us, uv, s2d, r2d = res
        vdh, vdv, vdrbf, vdcut, vddiff, vdwf, vdbf = cots
        if ET2 != ET:
            from hydragnn_tpu.ops.pallas_egnn import _rechunk_ids

            sub = ET // LANES
            s2d = _rechunk_ids(s2d, G, sub, sub_pad, ET2)
            r2d = _rechunk_ids(r2d, G, sub, sub_pad, ET2)
        ch, cv, crbf, ccut, cdiff, cwf, cbf, cus, cuv = bwd2_call(
            s2d, r2d, rbf, cut, diffn, h, v, wf, bf,
            us.astype(jnp.float32), uv.astype(jnp.float32),
            vdh.astype(jnp.float32), vdv.astype(jnp.float32),
            vdrbf.astype(jnp.float32), vdcut.astype(jnp.float32),
            vddiff.astype(jnp.float32), vdwf.astype(jnp.float32),
            vdbf.astype(jnp.float32),
        )
        return (
            ch.astype(h.dtype), cv.astype(v.dtype), crbf.astype(rbf.dtype),
            ccut.astype(cut.dtype), cdiff.astype(diffn.dtype),
            cwf.astype(wf.dtype), cbf.astype(bf.dtype),
            cus.astype(jnp.float32), cuv.astype(jnp.float32), None, None,
        )

    bwd_op.defvjp(bwd_op_fwd, bwd_op_bwd)

    @jax.custom_vjp
    def core(h, v, rbf, cut, diffn, wf, bf, s2d, r2d):
        return fwd_call(s2d, r2d, rbf, cut, diffn, h, v, wf, bf)

    def core_fwd(h, v, rbf, cut, diffn, wf, bf, s2d, r2d):
        out = core(h, v, rbf, cut, diffn, wf, bf, s2d, r2d)
        return out, (h, v, rbf, cut, diffn, wf, bf, s2d, r2d)

    def core_bwd(res, cots):
        h, v, rbf, cut, diffn, wf, bf, s2d, r2d = res
        us, uv = cots
        dh, dv, drbf, dcut, ddiff, dwf, dbf = bwd_op(
            h, v, rbf, cut, diffn, wf, bf,
            us.astype(jnp.float32), uv.astype(jnp.float32), s2d, r2d,
        )
        return (
            dh.astype(h.dtype), dv.astype(v.dtype), drbf.astype(rbf.dtype),
            dcut.astype(cut.dtype), ddiff.astype(diffn.dtype),
            dwf.astype(wf.dtype), dbf.astype(bf.dtype), None, None,
        )

    core.defvjp(core_fwd, core_bwd)
    return core


def painn_message_fused(
    h: jnp.ndarray,        # [N, 3F] scalar-MLP output (N = G*S slotted)
    v: jnp.ndarray,        # [N, 3, F] vector features
    rbf: jnp.ndarray,      # [E, NR] sinc radial features
    cut: jnp.ndarray,      # [E] cosine-cutoff factor (mask folded in)
    diffn: jnp.ndarray,    # [E, 3] diff / dist (double-normalized, ref)
    wf: jnp.ndarray,       # [NR, 3F] filter_layer kernel
    bf: jnp.ndarray,       # [3F]
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    node_slot: int,
    edge_slot: int,
    edge_tile: Optional[int] = None,
):
    """Returns (res_s [N, F], res_v [N, 3, F]) in h.dtype — the aggregated
    PaiNN messages (reference flow: gathered from receivers, summed into
    senders)."""
    N, F3 = h.shape
    F = F3 // 3
    E, NR = rbf.shape
    S, Eg = node_slot, edge_slot
    G = N // S
    assert G * S == N and G * Eg == E, (N, S, E, Eg)
    Fp = _round_up(F, LANES)
    dt = h.dtype
    if edge_tile is None:
        import os

        edge_tile = min(
            Eg, int(os.getenv("HYDRAGNN_FUSED_EDGE_TILE", "512"))
        )
        # lives are [ET, 3Fp]-wide here (the vector channel)
        edge_tile = scale_edge_tile(
            edge_tile, 3 * Fp, jnp.dtype(dt).itemsize, 6
        )
    while Eg % edge_tile:
        edge_tile //= 2
    padF = Fp - F
    if padF:
        # re-lay [*, 3F] blocks to [*, 3Fp] (each F-block padded to Fp)
        h = jnp.pad(
            h.reshape(N, 3, F), ((0, 0), (0, 0), (0, padF))
        ).reshape(N, 3 * Fp)
        wf = jnp.pad(
            wf.reshape(NR, 3, F), ((0, 0), (0, 0), (0, padF))
        ).reshape(NR, 3 * Fp)
        bf = jnp.pad(bf.reshape(3, F), ((0, 0), (0, padF))).ravel()
    # v [N, 3, F] -> flattened d-major [N, 3Fp]
    v_flat = jnp.pad(v, ((0, 0), (0, 0), (0, padF))).reshape(N, 3 * Fp)

    et2 = scale_edge_tile(
        edge_tile, 3 * Fp, jnp.dtype(dt).itemsize, 15,
        fixed=S * 3 * Fp * 40 + NR * 3 * Fp * 12,
    )
    while Eg % et2:
        et2 //= 2
    core = _make_core(G, S, Eg, edge_tile, Fp, NR, et2)
    sub = edge_tile // LANES
    sub_pad = _round_up(sub, 8)
    K = Eg // edge_tile

    def _chunked(ids):
        a = ids.astype(jnp.int32).reshape(G * K, sub, LANES)
        if sub_pad != sub:
            a = jnp.pad(
                a, ((0, 0), (0, sub_pad - sub), (0, 0)),
                constant_values=np.int32(2**31 - 2),
            )
        return a

    res_s, res_v = core(
        h.astype(dt), v_flat.astype(dt), rbf.astype(dt),
        cut.astype(dt).reshape(E, 1), diffn.astype(dt),
        wf.astype(dt), bf.reshape(1, 3 * Fp).astype(dt),
        _chunked(senders), _chunked(receivers),
    )
    res_s = res_s[:, :F].astype(dt)
    res_v = res_v.reshape(N, 3, Fp)[:, :, :F].astype(dt)
    return res_s, res_v


def painn_message_reference(h, v, rbf, cut, diffn, wf, bf, senders,
                            receivers, num_nodes):
    """Pure-XLA reference of the fused chain (for tests)."""
    F = h.shape[1] // 3
    fw = (rbf @ wf + bf) * cut[:, None]
    fo = fw * h[receivers]
    gate_v, gate_e, msg_s = jnp.split(fo, 3, axis=1)
    msg_v = v[receivers] * gate_v[:, None, :] + (
        gate_e[:, None, :] * diffn[:, :, None]
    )
    res_s = jax.ops.segment_sum(msg_s, senders, num_nodes)
    res_v = jax.ops.segment_sum(msg_v, senders, num_nodes)
    return res_s, res_v
