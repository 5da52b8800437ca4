"""Fused slotted SchNet CFConv edge-chain kernel (Pallas, TPU).

The CFConv hot chain — filter MLP on the RBF (Dense -> shifted-softplus ->
Dense -> cutoff multiply), gather(lin1(x)) by sender, elementwise filter
multiply, segment-sum by receiver (models/schnet.py CFConv; ref:
hydragnn/models/SCFStack.py:214-293) — materializes [E, F] tensors at
every stage when run unfused. Same per-graph-block design as
ops/pallas_egnn.py: one-hot MXU gathers/scatter against the slot-local
match matrix, [E, F] intermediates stay in VMEM, custom VJP recomputes
the forward per chunk.

Layout contract: collate(node_slot=S, edge_slot=Eg) — see
ops/pallas_egnn.py for the padding-edge exclusion argument (identical:
padding edges point at node N-1 which matches no real block's rows).

out[n] = sum over edges e with receivers[e]==n of
    x_lin[senders[e]] * ((ssp(rbf_e @ w0 + b0) @ w1 + b1) * cut_e)
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
    LANES, _chunk_ids, _onehot, _rechunk_ids, _round_up, scale_edge_tile,
)

_LOG2 = float(np.log(2.0))


def _ssp(x):
    return jax.nn.softplus(x) - _LOG2


def _filter(rbf, cut, wg0, bg0, wg1, bg1, prec):
    z0 = (
        jnp.dot(rbf, wg0, preferred_element_type=jnp.float32,
                precision=prec)
        + bg0.astype(jnp.float32)
    )
    h = _ssp(z0)
    z1 = (
        jnp.dot(h.astype(rbf.dtype), wg1,
                preferred_element_type=jnp.float32, precision=prec)
        + bg1.astype(jnp.float32)
    )
    return z0, h, z1, z1 * cut.astype(jnp.float32)


def _fwd_kernel(
    s_ref, r_ref,
    rbf_ref,    # [ET, NG]
    cut_ref,    # [ET, 1]
    x_ref,      # [S, Fp]  (lin1(inv) rows of this slot)
    wg0_ref,    # [NG, Fp]
    bg0_ref,    # [1, Fp]
    wg1_ref,    # [Fp, Fp]
    bg1_ref,    # [1, Fp]
    out_ref,    # [S, Fp] f32 (accumulated over k)
    *,
    S: int,
    ET: int,
):
    g = pl.program_id(0)
    k = pl.program_id(1)
    dt = x_ref.dtype
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)
    sub = ET // LANES
    oh_s = _onehot(_chunk_ids(s_ref, k, sub), S, g * S, ET, dt)
    oh_r = _onehot(_chunk_ids(r_ref, k, sub), S, g * S, ET, dt)
    cdims = (((0,), (0,)), ((), ()))
    _, _, _, W = _filter(
        rbf_ref[:], cut_ref[:], wg0_ref[:], bg0_ref[:], wg1_ref[:],
        bg1_ref[:], prec,
    )
    gx = jax.lax.dot_general(
        oh_s, x_ref[:], cdims, preferred_element_type=jnp.float32,
        precision=prec,
    )  # [ET, Fp]
    msg = (gx * W).astype(dt)
    part = jax.lax.dot_general(
        oh_r, msg, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += part


def _bwd_kernel(
    s_ref, r_ref, rbf_ref, cut_ref, x_ref, wg0_ref, bg0_ref, wg1_ref,
    bg1_ref,
    dout_ref,   # [S, Fp]
    dx_ref,     # [S, Fp] f32 (acc over k)
    drbf_ref,   # [ET, NG] f32
    dcut_ref,   # [ET, 1] f32
    dwg0_ref,   # [NG, Fp] f32 (acc all)
    dbg0_ref,   # [1, Fp] f32
    dwg1_ref,   # [Fp, Fp] f32
    dbg1_ref,   # [1, Fp] f32
    *,
    S: int,
    ET: int,
):
    g = pl.program_id(0)
    k = pl.program_id(1)
    dt = x_ref.dtype
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)
    sub = ET // LANES
    oh_s = _onehot(_chunk_ids(s_ref, k, sub), S, g * S, ET, dt)
    oh_r = _onehot(_chunk_ids(r_ref, k, sub), S, g * S, ET, dt)
    cdims = (((0,), (0,)), ((), ()))
    # recompute forward chunk
    z0, h, z1, W = _filter(
        rbf_ref[:], cut_ref[:], wg0_ref[:], bg0_ref[:], wg1_ref[:],
        bg1_ref[:], prec,
    )
    gx = jax.lax.dot_general(
        oh_s, x_ref[:], cdims, preferred_element_type=jnp.float32,
        precision=prec,
    )
    # backward
    dmsg = jax.lax.dot_general(
        oh_r, dout_ref[:].astype(dt), cdims,
        preferred_element_type=jnp.float32, precision=prec,
    )  # [ET, Fp]
    dW = dmsg * gx
    dgx = (dmsg * W).astype(dt)
    dx_part = jax.lax.dot_general(
        oh_s, dgx, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    cut = cut_ref[:].astype(jnp.float32)
    dz1 = (dW * cut).astype(dt)
    dcut_ref[:] = jnp.sum(dW * z1, axis=1, keepdims=True)
    dh = jax.lax.dot_general(
        dz1, wg1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    dz0 = (dh * jax.nn.sigmoid(z0)).astype(dt)
    drbf_ref[:] = jax.lax.dot_general(
        dz0, wg0_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    dwg1_part = jax.lax.dot_general(
        h.astype(dt), dz1, cdims, preferred_element_type=jnp.float32,
        precision=prec,
    )
    dbg1_part = jnp.sum(dz1.astype(jnp.float32), axis=0, keepdims=True)
    dwg0_part = jax.lax.dot_general(
        rbf_ref[:], dz0, cdims, preferred_element_type=jnp.float32,
        precision=prec,
    )
    dbg0_part = jnp.sum(dz0.astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(k == 0)
    def _():
        dx_ref[:] = jnp.zeros_like(dx_ref)

    dx_ref[:] += dx_part

    first = jnp.logical_and(g == 0, k == 0)

    @pl.when(first)
    def _():
        dwg0_ref[:] = jnp.zeros_like(dwg0_ref)
        dbg0_ref[:] = jnp.zeros_like(dbg0_ref)
        dwg1_ref[:] = jnp.zeros_like(dwg1_ref)
        dbg1_ref[:] = jnp.zeros_like(dbg1_ref)

    dwg0_ref[:] += dwg0_part
    dbg0_ref[:] += dbg0_part
    dwg1_ref[:] += dwg1_part
    dbg1_ref[:] += dbg1_part


def _bwd2_kernel(
    s_ref, r_ref, rbf_ref, cut_ref, x_ref, wg0_ref, bg0_ref, wg1_ref,
    bg1_ref,
    u_ref,      # [S, Fp] dout (first-order cotangent seed, f32)
    vdx_ref,    # [S, Fp] cotangent of dx
    vdrbf_ref,  # [ET, NG] cotangent of drbf
    vdcut_ref,  # [ET, 1] cotangent of dcut
    vdwg0_ref,  # [NG, Fp]
    vdbg0_ref,  # [1, Fp]
    vdwg1_ref,  # [Fp, Fp]
    vdbg1_ref,  # [1, Fp]
    cx_ref,     # [S, Fp] f32 out (acc over k): cotangent of x
    crbf_ref,   # [ET, NG] f32 out
    ccut_ref,   # [ET, 1] f32 out
    cwg0_ref,   # [NG, Fp] f32 out (acc all)
    cbg0_ref,   # [1, Fp] f32 out (acc all)
    cwg1_ref,   # [Fp, Fp] f32 out (acc all)
    cbg1_ref,   # [1, Fp] f32 out (acc all)
    cu_ref,     # [S, Fp] f32 out (acc over k): cotangent of dout
    *,
    S: int,
    ET: int,
):
    """VJP of the backward map B (``_bwd_kernel``) — second-order kernel
    for grad-of-grad (energy-force training). Unlike the EGNN chain's
    ReLU, shifted-softplus is smooth: sigma = ssp' and sigma' = sigma *
    (1 - sigma) contribute genuine second-order terms, so bg0/bg1 receive
    nonzero cotangents here (matches XLA's autodiff of the unfused chain).

    Adjoint algebra (values from the recomputed forward + first backward):
      a_dgx  = OHs^T vdx
      a_dz0  = vdrbf wg0 + rbf vdwg0 + 1 vdbg0
      a_dh   = a_dz0 . sigma;     c_z0  = a_dz0 . dh . sigma'
      a_dz1  = a_dh wg1 + h vdwg1 + 1 vdbg1
      a_dW   = a_dz1 . cut + vdcut (x) z1
      a_dmsg = a_dW . gx + a_dgx . W      ->  c_u = OHr a_dmsg
      c_gx   = a_dW . dmsg;   c_W = a_dgx . dmsg
      c_z1  += c_W . cut + vdcut (x) dW
      c_cut  = sum_f(a_dz1 . dW) + sum_f(c_W . z1)
      c_h    = dz1 vdwg1^T + c_z1 wg1^T
      c_z0  += c_h . sigma
      c_rbf  = dz0 vdwg0^T + c_z0 wg0^T
      c_wg0  = vdrbf^T dz0 + rbf^T c_z0;   c_bg0 = sum_e c_z0
      c_wg1  = a_dh^T dz1 + h^T c_z1;      c_bg1 = sum_e c_z1
      c_x    = OHs c_gx
    """
    g = pl.program_id(0)
    k = pl.program_id(1)
    dt = x_ref.dtype
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)
    sub = ET // LANES
    oh_s = _onehot(_chunk_ids(s_ref, k, sub), S, g * S, ET, dt)
    oh_r = _onehot(_chunk_ids(r_ref, k, sub), S, g * S, ET, dt)
    cdims = (((0,), (0,)), ((), ()))
    scatter = (((1,), (0,)), ((), ()))
    ll = (((1,), (1,)), ((), ()))

    # ---- recompute forward
    z0, h, z1, W = _filter(
        rbf_ref[:], cut_ref[:], wg0_ref[:], bg0_ref[:], wg1_ref[:],
        bg1_ref[:], prec,
    )
    sig = jax.nn.sigmoid(z0)
    cut = cut_ref[:].astype(jnp.float32)
    gx = jax.lax.dot_general(
        oh_s, x_ref[:], cdims, preferred_element_type=jnp.float32,
        precision=prec,
    )
    # ---- recompute the first backward's intermediates (values needed)
    dmsg = jax.lax.dot_general(
        oh_r, u_ref[:].astype(dt), cdims,
        preferred_element_type=jnp.float32, precision=prec,
    )
    dW = dmsg * gx
    dz1 = dW * cut
    dh = jax.lax.dot_general(
        dz1.astype(dt), wg1_ref[:], ll,
        preferred_element_type=jnp.float32, precision=prec,
    )
    dz0 = dh * sig

    # ---- adjoints of the backward map
    a_dgx = jax.lax.dot_general(
        oh_s, vdx_ref[:].astype(dt), cdims,
        preferred_element_type=jnp.float32, precision=prec,
    )
    a_dz0 = jax.lax.dot_general(
        vdrbf_ref[:].astype(dt), wg0_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ) + jax.lax.dot_general(
        rbf_ref[:], vdwg0_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ) + vdbg0_ref[:].astype(jnp.float32)
    a_dh = a_dz0 * sig
    c_z0 = a_dz0 * dh * sig * (1.0 - sig)
    a_dz1 = jax.lax.dot_general(
        a_dh.astype(dt), wg1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ) + jax.lax.dot_general(
        h.astype(dt), vdwg1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ) + vdbg1_ref[:].astype(jnp.float32)
    vdcut = vdcut_ref[:].astype(jnp.float32)
    a_dW = a_dz1 * cut + vdcut * z1
    a_dmsg = a_dW * gx + a_dgx * W
    cu = jax.lax.dot_general(
        oh_r, a_dmsg.astype(dt), scatter,
        preferred_element_type=jnp.float32, precision=prec,
    )
    c_gx = a_dW * dmsg
    c_W = a_dgx * dmsg
    c_z1 = c_W * cut + vdcut * dW
    ccut_ref[:] = (
        jnp.sum(a_dz1 * dW, axis=1, keepdims=True)
        + jnp.sum(c_W * z1, axis=1, keepdims=True)
    )
    c_h = jax.lax.dot_general(
        dz1.astype(dt), vdwg1_ref[:], ll,
        preferred_element_type=jnp.float32, precision=prec,
    ) + jax.lax.dot_general(
        c_z1.astype(dt), wg1_ref[:], ll,
        preferred_element_type=jnp.float32, precision=prec,
    )
    c_z0 = c_z0 + c_h * sig
    crbf_ref[:] = jax.lax.dot_general(
        dz0.astype(dt), vdwg0_ref[:], ll,
        preferred_element_type=jnp.float32, precision=prec,
    ) + jax.lax.dot_general(
        c_z0.astype(dt), wg0_ref[:], ll,
        preferred_element_type=jnp.float32, precision=prec,
    )
    cwg0_part = jax.lax.dot_general(
        vdrbf_ref[:].astype(dt), dz0.astype(dt), cdims,
        preferred_element_type=jnp.float32, precision=prec,
    ) + jax.lax.dot_general(
        rbf_ref[:], c_z0.astype(dt), cdims,
        preferred_element_type=jnp.float32, precision=prec,
    )
    cbg0_part = jnp.sum(c_z0, axis=0, keepdims=True)
    cwg1_part = jax.lax.dot_general(
        a_dh.astype(dt), dz1.astype(dt), cdims,
        preferred_element_type=jnp.float32, precision=prec,
    ) + jax.lax.dot_general(
        h.astype(dt), c_z1.astype(dt), cdims,
        preferred_element_type=jnp.float32, precision=prec,
    )
    cbg1_part = jnp.sum(c_z1, axis=0, keepdims=True)
    cx_part = jax.lax.dot_general(
        oh_s, c_gx.astype(dt), scatter,
        preferred_element_type=jnp.float32, precision=prec,
    )

    @pl.when(k == 0)
    def _():
        cx_ref[:] = jnp.zeros_like(cx_ref)
        cu_ref[:] = jnp.zeros_like(cu_ref)

    cx_ref[:] += cx_part
    cu_ref[:] += cu

    first = jnp.logical_and(g == 0, k == 0)

    @pl.when(first)
    def _():
        cwg0_ref[:] = jnp.zeros_like(cwg0_ref)
        cbg0_ref[:] = jnp.zeros_like(cbg0_ref)
        cwg1_ref[:] = jnp.zeros_like(cwg1_ref)
        cbg1_ref[:] = jnp.zeros_like(cbg1_ref)

    cwg0_ref[:] += cwg0_part
    cbg0_ref[:] += cbg0_part
    cwg1_ref[:] += cwg1_part
    cbg1_ref[:] += cbg1_part


@functools.lru_cache(maxsize=None)
def _make_core(G: int, S: int, Eg: int, ET: int, Fp: int, NG: int,
               ET2: Optional[int] = None):
    ET2 = ET2 or ET
    K = Eg // ET
    sub_pad = _round_up(ET // LANES, 8)

    idx_spec = pl.BlockSpec(
        (1, sub_pad, LANES), lambda g, k: (g * K + k, 0, 0)
    )
    rbf_spec = pl.BlockSpec((ET, NG), lambda g, k: (g * K + k, 0))
    cut_spec = pl.BlockSpec((ET, 1), lambda g, k: (g * K + k, 0))
    node_spec = pl.BlockSpec((S, Fp), lambda g, k: (g, 0))
    wg0_spec = pl.BlockSpec((NG, Fp), lambda g, k: (0, 0))
    w1_spec = pl.BlockSpec((Fp, Fp), lambda g, k: (0, 0))
    b_spec = pl.BlockSpec((1, Fp), lambda g, k: (0, 0))

    common = dict(
        grid=(G, K),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )
    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, S=S, ET=ET),
        in_specs=[idx_spec, idx_spec, rbf_spec, cut_spec, node_spec,
                  wg0_spec, b_spec, w1_spec, b_spec],
        out_specs=pl.BlockSpec((S, Fp), lambda g, k: (g, 0)),
        out_shape=jax.ShapeDtypeStruct((G * S, Fp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * G * Eg * Fp * (Fp + NG + 2 * S),
            bytes_accessed=G * (S * Fp + Eg * NG) * 4,
            transcendentals=G * Eg * Fp,
        ),
        **common,
    )
    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel, S=S, ET=ET),
        in_specs=[idx_spec, idx_spec, rbf_spec, cut_spec, node_spec,
                  wg0_spec, b_spec, w1_spec, b_spec,
                  pl.BlockSpec((S, Fp), lambda g, k: (g, 0))],
        out_specs=[
            pl.BlockSpec((S, Fp), lambda g, k: (g, 0)),
            rbf_spec,
            cut_spec,
            wg0_spec,
            b_spec,
            w1_spec,
            b_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G * S, Fp), jnp.float32),
            jax.ShapeDtypeStruct((G * Eg, NG), jnp.float32),
            jax.ShapeDtypeStruct((G * Eg, 1), jnp.float32),
            jax.ShapeDtypeStruct((NG, Fp), jnp.float32),
            jax.ShapeDtypeStruct((1, Fp), jnp.float32),
            jax.ShapeDtypeStruct((Fp, Fp), jnp.float32),
            jax.ShapeDtypeStruct((1, Fp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * G * Eg * Fp * (Fp + NG + 2 * S),
            bytes_accessed=G * (3 * S * Fp + 2 * Eg * NG) * 4,
            transcendentals=2 * G * Eg * Fp,
        ),
        **common,
    )

    K2 = Eg // ET2
    sub2_pad = _round_up(ET2 // LANES, 8)
    idx2_spec = pl.BlockSpec(
        (1, sub2_pad, LANES), lambda g, k: (g * K2 + k, 0, 0)
    )
    rbf2_spec = pl.BlockSpec((ET2, NG), lambda g, k: (g * K2 + k, 0))
    cut2_spec = pl.BlockSpec((ET2, 1), lambda g, k: (g * K2 + k, 0))
    common2 = dict(common, grid=(G, K2))
    bwd2_call = pl.pallas_call(
        functools.partial(_bwd2_kernel, S=S, ET=ET2),
        in_specs=[idx2_spec, idx2_spec, rbf2_spec, cut2_spec, node_spec,
                  wg0_spec, b_spec, w1_spec, b_spec,
                  pl.BlockSpec((S, Fp), lambda g, k: (g, 0)),   # u
                  pl.BlockSpec((S, Fp), lambda g, k: (g, 0)),   # vdx
                  rbf2_spec,                                     # vdrbf
                  cut2_spec,                                     # vdcut
                  wg0_spec, b_spec, w1_spec, b_spec],            # vdw*
        out_specs=[
            pl.BlockSpec((S, Fp), lambda g, k: (g, 0)),  # c_x
            rbf2_spec,                                    # c_rbf
            cut2_spec,                                    # c_cut
            wg0_spec, b_spec, w1_spec, b_spec,            # c_w*
            pl.BlockSpec((S, Fp), lambda g, k: (g, 0)),  # c_dout
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G * S, Fp), jnp.float32),
            jax.ShapeDtypeStruct((G * Eg, NG), jnp.float32),
            jax.ShapeDtypeStruct((G * Eg, 1), jnp.float32),
            jax.ShapeDtypeStruct((NG, Fp), jnp.float32),
            jax.ShapeDtypeStruct((1, Fp), jnp.float32),
            jax.ShapeDtypeStruct((Fp, Fp), jnp.float32),
            jax.ShapeDtypeStruct((1, Fp), jnp.float32),
            jax.ShapeDtypeStruct((G * S, Fp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=12 * G * Eg * Fp * (Fp + NG + 2 * S),
            bytes_accessed=G * (6 * S * Fp + 4 * Eg * NG) * 4,
            transcendentals=2 * G * Eg * Fp,
        ),
        **common2,
    )

    # second-order support: B is its own differentiable op (see
    # ops/pallas_egnn.py — identical composition pattern and the
    # re-entrancy note on the fwd rules)
    @jax.custom_vjp
    def bwd_op(x, rbf, cut, wg0, bg0, wg1, bg1, dout, s2d, r2d):
        return bwd_call(s2d, r2d, rbf, cut, x, wg0, bg0, wg1, bg1, dout)

    def bwd_op_fwd(x, rbf, cut, wg0, bg0, wg1, bg1, dout, s2d, r2d):
        out = bwd_op(x, rbf, cut, wg0, bg0, wg1, bg1, dout, s2d, r2d)
        return out, (x, rbf, cut, wg0, bg0, wg1, bg1, dout, s2d, r2d)

    def bwd_op_bwd(res, cots):
        x, rbf, cut, wg0, bg0, wg1, bg1, dout, s2d, r2d = res
        vdx, vdrbf, vdcut, vdwg0, vdbg0, vdwg1, vdbg1 = cots
        if ET2 != ET:
            sub = ET // LANES
            s2d = _rechunk_ids(s2d, G, sub, sub_pad, ET2)
            r2d = _rechunk_ids(r2d, G, sub, sub_pad, ET2)
        cx, crbf, ccut, cwg0, cbg0, cwg1, cbg1, cu = bwd2_call(
            s2d, r2d, rbf, cut, x, wg0, bg0, wg1, bg1,
            dout.astype(jnp.float32),
            vdx.astype(jnp.float32), vdrbf.astype(jnp.float32),
            vdcut.astype(jnp.float32), vdwg0.astype(jnp.float32),
            vdbg0.astype(jnp.float32), vdwg1.astype(jnp.float32),
            vdbg1.astype(jnp.float32),
        )
        return (
            cx.astype(x.dtype), crbf.astype(rbf.dtype),
            ccut.astype(cut.dtype), cwg0.astype(wg0.dtype),
            cbg0.astype(bg0.dtype), cwg1.astype(wg1.dtype),
            cbg1.astype(bg1.dtype), cu.astype(jnp.float32), None, None,
        )

    bwd_op.defvjp(bwd_op_fwd, bwd_op_bwd)

    @jax.custom_vjp
    def core(x, rbf, cut, wg0, bg0, wg1, bg1, s2d, r2d):
        return fwd_call(s2d, r2d, rbf, cut, x, wg0, bg0, wg1, bg1)

    def core_fwd(x, rbf, cut, wg0, bg0, wg1, bg1, s2d, r2d):
        out = core(x, rbf, cut, wg0, bg0, wg1, bg1, s2d, r2d)
        return out, (x, rbf, cut, wg0, bg0, wg1, bg1, s2d, r2d)

    def core_bwd(res, dout):
        x, rbf, cut, wg0, bg0, wg1, bg1, s2d, r2d = res
        dx, drbf, dcut, dwg0, dbg0, dwg1, dbg1 = bwd_op(
            x, rbf, cut, wg0, bg0, wg1, bg1, dout.astype(jnp.float32),
            s2d, r2d,
        )
        return (
            dx.astype(x.dtype), drbf.astype(rbf.dtype),
            dcut.astype(cut.dtype), dwg0.astype(wg0.dtype),
            dbg0.astype(bg0.dtype), dwg1.astype(wg1.dtype),
            dbg1.astype(bg1.dtype), None, None,
        )

    core.defvjp(core_fwd, core_bwd)
    return core


def schnet_edge_fused(
    x_lin: jnp.ndarray,   # [N, F] lin1(inv), N = G*S slotted
    rbf: jnp.ndarray,     # [E, NG] radial features (E = G*Eg slotted)
    cut: jnp.ndarray,     # [E] cosine-cutoff factor
    wg0: jnp.ndarray,     # [NG, F] filter mlp_0 kernel
    bg0: jnp.ndarray,     # [F]
    wg1: jnp.ndarray,     # [F, F] filter mlp_1 kernel
    bg1: jnp.ndarray,     # [F]
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    node_slot: int,
    edge_slot: int,
    edge_tile: Optional[int] = None,
) -> jnp.ndarray:
    N, F = x_lin.shape
    E, NG = rbf.shape
    S, Eg = node_slot, edge_slot
    G = N // S
    assert G * S == N and G * Eg == E, (N, S, E, Eg)
    Fp = _round_up(F, LANES)
    dt = x_lin.dtype
    from hydragnn_tpu.ops.pallas_egnn import pick_edge_tiles

    auto_et, auto_et2 = pick_edge_tiles(Fp, jnp.dtype(dt).itemsize)
    if edge_tile is None:
        edge_tile = min(Eg, auto_et)
    while Eg % edge_tile:
        edge_tile //= 2
    et2 = min(edge_tile, auto_et2)
    while Eg % et2:
        et2 //= 2
    padF = Fp - F
    if padF:
        x_lin = jnp.pad(x_lin, ((0, 0), (0, padF)))
        wg0 = jnp.pad(wg0, ((0, 0), (0, padF)))
        bg0 = jnp.pad(bg0, (0, padF))
        wg1 = jnp.pad(wg1, ((0, padF), (0, padF)))
        bg1 = jnp.pad(bg1, (0, padF))
    core = _make_core(G, S, Eg, edge_tile, Fp, NG, et2)
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

    out = core(
        x_lin, rbf.astype(dt), cut.astype(dt).reshape(E, 1),
        wg0.astype(dt), bg0.reshape(1, Fp).astype(dt),
        wg1.astype(dt), bg1.reshape(1, Fp).astype(dt),
        _chunked(senders), _chunked(receivers),
    )
    return out[:, :F].astype(dt)


def schnet_edge_reference(x_lin, rbf, cut, wg0, bg0, wg1, bg1, senders,
                          receivers, num_nodes):
    """Pure-XLA reference for tests."""
    h = _ssp(rbf @ wg0 + bg0)
    W = (h @ wg1 + bg1) * cut[:, None]
    msg = x_lin[senders] * W
    return jax.ops.segment_sum(msg, receivers, num_nodes)
