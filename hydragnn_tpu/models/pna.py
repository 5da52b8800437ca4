"""PNA stack (ref: hydragnn/models/PNAStack.py:19-70).

PNAConv semantics (PyG, towers=1, divide_input=False, pre/post_layers=1):
  message  : h_ij = pre_nn([x_i, x_j (, edge_enc(e_ij))])
  aggregate: [mean, min, max, std] x scalers [identity, amplification,
             attenuation, linear] using the training-set degree histogram
  update   : lin(post_nn([x_i, aggregated]))
Aggregations are masked segment reductions; scalers use per-node in-degree
clamped to >= 1 (PyG DegreeScalerAggregation).
"""

from __future__ import annotations

import math

import numpy as np
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from hydragnn_tpu.graph import GraphBatch
from hydragnn_tpu.models.base import HydraBase
from hydragnn_tpu.models.layers import split_init
from hydragnn_tpu.ops.segment import (
    degree,
    segment_max,
    segment_mean,
    segment_min,
    segment_std,
)


def deg_stats(deg_hist: Tuple[int, ...]) -> Tuple[float, float]:
    """avg_deg (lin, log) from the degree histogram (PyG PNAConv.__init__).
    Pure numpy: static w.r.t. jit tracing."""
    hist = np.asarray(deg_hist, np.float64)
    n = max(hist.sum(), 1.0)
    d = np.arange(len(deg_hist), dtype=np.float64)
    avg_lin = float((d * hist).sum() / n)
    avg_log = float((np.log(d + 1.0) * hist).sum() / n)
    return avg_lin, avg_log


class PNAConv(nn.Module):
    in_dim: int
    out_dim: int
    deg_hist: Tuple[int, ...]
    edge_dim: Optional[int] = None

    @nn.compact
    def __call__(self, inv, equiv, batch: GraphBatch, ctx, train: bool = False):
        N = inv.shape[0]
        F_in = self.in_dim
        # transform-then-gather: pre_nn is linear in [x_dst, x_src, e_enc],
        # so its kernel splits column-wise — the node halves are computed
        # once per node and gathered as [E, F] (deg-fold fewer matmul FLOPs
        # and half the gather traffic vs the [E, 2F+] concat). Same math as
        # the reference pre_nn (pre_layers=1, PNAStack.py:42).
        F = inv.shape[-1]
        fan_total = 2 * F + (F_in if self.edge_dim else 0)
        pre_d = nn.Dense(
            F_in, name="pre_nn_dst", kernel_init=split_init(F, fan_total)
        )(inv)
        pre_s = nn.Dense(
            F_in, use_bias=False, name="pre_nn_src",
            kernel_init=split_init(F, fan_total),
        )(inv)
        if self.edge_dim is None and batch.adjacency is not None:
            # DENSE aggregation for slotted batches: the message is
            # PAIR-FACTORED (h_ij = pre_d[i] + pre_s[j]), so every
            # aggregator has a closed dense form over the [G, S, S]
            # adjacency — no [E, F] message is ever materialized:
            #   sum_j   = deg * pre_d + A pre_s              (MXU bmm)
            #   sumsq_j = deg*pre_d^2 + 2 pre_d (A pre_s) + A pre_s^2
            #   max_j   = pre_d + masked-max_j pre_s  (min analogous)
            # Exactly the segment-op semantics incl. multi-edge
            # multiplicities (A carries counts; max ignores them) and
            # empty-segment conventions (mean/min/max -> 0, std ->
            # sqrt(eps)). Same design family as GAT's dense attention.
            from hydragnn_tpu.ops.segment import adjacency_spmm

            A = jax.lax.stop_gradient(batch.adjacency)
            G_, S_, _ = A.shape
            degv = jnp.sum(A.astype(jnp.float32), axis=2).reshape(-1)
            has = (degv > 0.0)[:, None]
            d1 = jnp.maximum(degv, 1.0)[:, None].astype(inv.dtype)
            a_ps = adjacency_spmm(A, pre_s)
            a_ps2 = adjacency_spmm(A, pre_s * pre_s)
            sum_agg = d1 * pre_d + a_ps
            mean = sum_agg / d1
            mean2 = (d1 * pre_d * pre_d + 2.0 * pre_d * a_ps + a_ps2) / d1
            var = jax.nn.relu(mean2 - mean * mean)
            std = jnp.sqrt(var + 1e-5)
            mean = jnp.where(has, mean, 0.0)
            neg = jnp.asarray(jnp.finfo(inv.dtype).min, inv.dtype)
            Ab = (A.astype(jnp.float32) > 0)[..., None]  # [G, S, S, 1]
            ps_g = pre_s.reshape(G_, 1, S_, -1)
            nbr_max = jnp.max(
                jnp.where(Ab, ps_g, neg), axis=2
            ).reshape(N, -1)
            nbr_min = jnp.min(
                jnp.where(Ab, ps_g, -neg), axis=2
            ).reshape(N, -1)
            mx = jnp.where(has, pre_d + nbr_max, 0.0)
            mn = jnp.where(has, pre_d + nbr_min, 0.0)
            aggs = [mean, mn, mx, std]
            out = jnp.concatenate(aggs, axis=-1)
            avg_lin, avg_log = deg_stats(self.deg_hist)
            d = jnp.maximum(degv, 1.0)[:, None]
            logd = jnp.log(d + 1.0)
            scaled = [
                out,
                out * (logd / avg_log),
                out * (avg_log / logd),
                out * (d / avg_lin),
            ]
            out = jnp.concatenate(scaled, axis=-1)
            out = jnp.concatenate([inv, out], axis=-1)
            out = nn.Dense(self.out_dim, name="post_nn")(out)
            out = nn.Dense(self.out_dim, name="lin")(out)
            return out, equiv

        h = batch.gather_dst(pre_d) + batch.gather_src(pre_s)
        if self.edge_dim:
            e = ctx.get("edge_attr")
            assert e is not None, "PNA with edge_dim requires edge_attr"
            enc = nn.Dense(F_in, name="edge_encoder")(e)
            h = h + nn.Dense(
                F_in, use_bias=False, name="pre_nn_edge",
                kernel_init=split_init(F_in, fan_total),
            )(enc)

        m = batch.edge_mask
        r = batch.receivers
        srt = batch.edges_receiver_sorted
        aggs = [
            segment_mean(h, r, N, mask=m, indices_are_sorted=srt),
            segment_min(h, r, N, mask=m, indices_are_sorted=srt),
            segment_max(h, r, N, mask=m, indices_are_sorted=srt),
            segment_std(h, r, N, mask=m, indices_are_sorted=srt),
        ]
        out = jnp.concatenate(aggs, axis=-1)

        avg_lin, avg_log = deg_stats(self.deg_hist)
        d = jnp.maximum(degree(r, N, mask=m, indices_are_sorted=srt), 1.0)[:, None]
        logd = jnp.log(d + 1.0)
        scaled = [
            out,
            out * (logd / avg_log),
            out * (avg_log / logd),
            out * (d / avg_lin),
        ]
        out = jnp.concatenate(scaled, axis=-1)

        out = jnp.concatenate([inv, out], axis=-1)
        out = nn.Dense(self.out_dim, name="post_nn")(out)  # post_layers=1
        out = nn.Dense(self.out_dim, name="lin")(out)
        return out, equiv


class PNAStack(HydraBase):
    is_edge_model: bool = True

    def get_conv(self, input_dim, output_dim, edge_dim=None, last_layer=False,
                 name=None):
        return PNAConv(
            input_dim, output_dim, deg_hist=self.cfg.pna_deg, edge_dim=edge_dim,
            name=name,
        )
