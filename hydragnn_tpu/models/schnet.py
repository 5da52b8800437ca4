"""SchNet stack (ref: hydragnn/models/SCFStack.py:34-293).

CFConv: W_ij = mlp(gaussian_rbf(d_ij) [, edge_attr]) * cosine_cutoff(d_ij);
out_i = lin2( sum_j lin1(x_j) * W_ij ). Optional equivariant coordinate
updates (not in the last layer): pos += mean_j clamp(diff_hat * coord_mlp(W)).
Feature layers are Identity (no BatchNorm; ref: SCFStack.py:74).

TPU note: the reference rebuilds the radius graph per layer
(RadiusInteractionGraph) because positions move under the equivariant option;
static shapes forbid dynamic edge counts, so the preprocessing neighbor list
(slightly dilated radius recommended) is kept fixed and only distances/filters
are recomputed from the *current* positions each layer — identical numerics
whenever the topology is unchanged (always true without equivariance).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from hydragnn_tpu.graph import GraphBatch
from hydragnn_tpu.models.base import HydraBase
from hydragnn_tpu.models.layers import activation_function_selection
from hydragnn_tpu.ops.geometry import get_edge_vectors_and_lengths
from hydragnn_tpu.ops.radial import gaussian_smearing, shifted_softplus
from hydragnn_tpu.ops.segment import segment_sum, segment_mean


class CFConv(nn.Module):
    in_dim: int
    out_dim: int
    num_filters: int
    num_gaussians: int
    cutoff: float
    edge_dim: Optional[int] = None
    equivariant: bool = False

    @nn.compact
    def __call__(self, inv, equiv, batch: GraphBatch, ctx, train: bool = False):
        s, r = batch.senders, batch.receivers
        N = inv.shape[0]
        # PBC shifts apply in the static (non-equivariant) mode: positions
        # never move, so cross-boundary distances are exact. The reference
        # zeroes shifts for this stack unconditionally ("not supported in
        # positional-update models", SCFStack.py:166-173); with coordinate
        # updates ON we match that (shifts would go stale once pos moves).
        diff_hat, lengths = get_edge_vectors_and_lengths(
            equiv, s, r,
            shifts=None if self.equivariant else batch.edge_shifts,
            normalize=True, eps=1.0, edge_mask=batch.edge_mask,
        )
        d = lengths[:, 0]
        rbf = gaussian_smearing(d, 0.0, self.cutoff, self.num_gaussians)
        e_attr = ctx.get("edge_attr")
        if self.edge_dim and e_attr is not None:
            rbf = jnp.concatenate([rbf, e_attr], axis=-1)
        C = 0.5 * (jnp.cos(d * math.pi / self.cutoff) + 1.0)

        from hydragnn_tpu.models.egnn import (
            _DenseParams, _use_fused_edge_kernel,
        )

        ng = rbf.shape[-1]
        w0, b0 = _DenseParams(ng, self.num_filters, name="mlp_0")()
        w1, b1 = _DenseParams(
            self.num_filters, self.num_filters, name="mlp_1"
        )()
        x = nn.Dense(self.num_filters, use_bias=False, name="lin1")(inv)

        from hydragnn_tpu.ops.pallas_egnn import second_order_supported

        if (not self.equivariant) and _use_fused_edge_kernel(
            batch,
            second_order_ok=second_order_supported(
                self.num_filters, inv.dtype
            ),
        ):
            # whole filter-MLP + gather + multiply + segment-sum chain in
            # one per-graph-block Pallas kernel (ops/pallas_schnet.py)
            from hydragnn_tpu.ops.pallas_schnet import schnet_edge_fused

            out = schnet_edge_fused(
                x, rbf.astype(x.dtype),
                (C * batch.edge_mask.astype(C.dtype)).astype(x.dtype),
                w0.astype(x.dtype), b0.astype(x.dtype),
                w1.astype(x.dtype), b1.astype(x.dtype),
                batch.senders, batch.receivers,
                batch.node_slot, batch.edge_slot,
            )
            # zero padding-slot garbage rows (see models/painn.py note)
            out = out * batch.node_mask.astype(out.dtype)[:, None]
            out = nn.Dense(self.out_dim, name="lin2")(out)
            return out, equiv

        h = rbf.astype(x.dtype) @ w0.astype(x.dtype) + b0.astype(x.dtype)
        h = shifted_softplus(h)
        W = (h @ w1.astype(x.dtype) + b1.astype(x.dtype)) * C[:, None]

        if self.equivariant:
            hw = nn.Dense(self.num_filters, name="coord_mlp_0")(W)
            hw = jax.nn.relu(hw)
            coef = nn.Dense(
                1, use_bias=False, name="coord_mlp_1",
                kernel_init=nn.initializers.variance_scaling(
                    0.001 ** 2, "fan_avg", "uniform"
                ),
            )(hw)
            trans = jnp.clip(diff_hat * coef, -100.0, 100.0)
            # aggregated into SENDERS (ref: CFConv.coord_model row-aggr)
            agg = segment_mean(trans, s, N, mask=batch.edge_mask,
                               indices_are_sorted=False)
            equiv = equiv + agg

        msg = batch.gather_src(x) * W
        msg = msg * batch.edge_mask[:, None].astype(msg.dtype)
        # edge-slotted batches (the fused-kernel collate, auto-enabled by
        # run_training) are receiver-sorted only per slot — the sorted CSR
        # fast path would silently mis-aggregate here, and this unfused path
        # is exactly what runs inside force-training (second-order) traces
        out = segment_sum(msg, r, N,
                          indices_are_sorted=batch.edges_receiver_sorted)
        out = nn.Dense(self.out_dim, name="lin2")(out)
        return out, equiv


class SCFStack(HydraBase):
    is_edge_model: bool = True

    def get_conv(self, input_dim, output_dim, edge_dim=None, last_layer=False,
                 name=None):
        return CFConv(
            input_dim,
            output_dim,
            num_filters=self.cfg.num_filters,
            num_gaussians=self.cfg.num_gaussians,
            cutoff=self.cfg.radius,
            edge_dim=edge_dim,
            equivariant=self.cfg.equivariance and not last_layer,
            name=name,
        )

    def _conv_plan(self):
        """equivariance skips the coordinate path in the last layer
        (ref: SCFStack._init_conv:57-87)."""
        cfg = self.cfg
        plan = []
        for i in range(cfg.num_conv_layers):
            in_dim = self.embed_dim if i == 0 else cfg.hidden_dim
            plan.append(
                (in_dim, cfg.hidden_dim,
                 {"last_layer": i == cfg.num_conv_layers - 1})
            )
        return plan

    def _make_feature_layer(self, i):
        return None  # Identity (ref: SCFStack.py:74)
