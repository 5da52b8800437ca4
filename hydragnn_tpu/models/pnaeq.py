"""PNAEq stack (ref: hydragnn/models/PNAEqStack.py:41-493).

PAINN-style scalar+vector messages where the scalar channel is aggregated with
PNA DegreeScalerAggregation (aggregators [mean,min,max,std], scalers
[identity, amplification, attenuation, linear, inverse_linear]) indexed by the
SOURCE node (ref: PainnMessage.forward:370-383 aggregates on src), followed by
a PAINN U/V update. rbf = sinc expansion x cosine cutoff.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from hydragnn_tpu.graph import GraphBatch
from hydragnn_tpu.models.base import HydraBase
from hydragnn_tpu.models.pna import deg_stats
from hydragnn_tpu.models.painn import PainnUpdate
from hydragnn_tpu.ops.geometry import get_edge_vectors_and_lengths
from hydragnn_tpu.ops.radial import cosine_cutoff, sinc_expansion
from hydragnn_tpu.ops.segment import (
    degree,
    pna_aggregate,
    segment_sum,
    segment_sum_via_perm,
)


class PNAEqMessage(nn.Module):
    node_size: int
    deg_hist: Tuple[int, ...]
    num_radial: int
    edge_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, v, batch: GraphBatch, ctx):
        F_in = self.node_size
        N = x.shape[0]
        src = batch.senders
        dst = batch.receivers
        rbf = ctx["edge_rbf"]
        edge_vec = ctx["edge_vec"]

        rbf_attr = jnp.tanh(nn.Dense(F_in, name="rbf_emb")(rbf))
        x_src, x_dst = batch.gather_src_dst(x)
        parts = [x_src, x_dst, rbf_attr]
        e_attr = ctx.get("edge_attr")
        if self.edge_dim and e_attr is not None:
            parts.append(nn.Dense(F_in, name="edge_encoder")(e_attr))
        h = jnp.concatenate(parts, axis=-1)
        h = nn.Dense(F_in, name="pre_nn")(h)
        # scalar_message_mlp: Linear-Tanh-Linear-SiLU-Linear -> 3F
        h = nn.Dense(F_in, name="smlp_0")(h)
        h = jnp.tanh(h)
        h = nn.Dense(F_in, name="smlp_1")(h)
        h = jax.nn.silu(h)
        h = nn.Dense(F_in * 3, name="smlp_2")(h)
        h = h * nn.Dense(F_in * 3, use_bias=False, name="rbf_lin")(rbf)

        gate_v, gate_e, msg_s = jnp.split(h, 3, axis=-1)

        # gather/aggregate the vector channel FLATTENED [*, 3F]: 3-D
        # arrays fall off every optimized 2-D path (Pallas segment
        # kernels, sorted-backward gathers) onto raw XLA scatter-adds —
        # ~11 ms each at the GFM shape (round-5 trace)
        v_dst = batch.gather_dst(v.reshape(N, -1)).reshape(-1, 3, F_in)
        msg_v = v_dst * gate_v[:, None, :] + gate_e[:, None, :] * edge_vec[:, :, None]

        em = batch.edge_mask
        msg_s = msg_s * em[:, None].astype(msg_s.dtype)
        msg_v = msg_v * em[:, None, None].astype(msg_v.dtype)

        # degree-scaled aggregation into SOURCE nodes: all four aggregators
        # in ONE fused pass (ops/pallas_multiagg.py) after one sender-sort
        # permutation (edges are receiver-sorted; the permute's backward is
        # a gather by the precomputed inverse)
        mean_a, min_a, max_a, std_a = pna_aggregate(
            msg_s, src, N, mask=em, indices_are_sorted=False,
            perm=batch.edge_perm_by_sender,
            inv_perm=batch.edge_perm_by_sender_inv,
        )
        out = jnp.concatenate([mean_a, min_a, max_a, std_a], axis=-1)
        avg_lin, avg_log = deg_stats(self.deg_hist)
        d = jnp.maximum(degree(src, N, mask=em, indices_are_sorted=False), 1.0)[
            :, None
        ]
        logd = jnp.log(d + 1.0)
        out = jnp.concatenate(
            [out, out * (logd / avg_log), out * (avg_log / logd),
             out * (d / avg_lin), out * (avg_lin / d)],
            axis=-1,
        )
        out = jnp.concatenate([x, out], axis=-1)
        delta_x = nn.Dense(F_in, name="post_nn")(out)

        delta_v = segment_sum_via_perm(
            msg_v.reshape(msg_v.shape[0], -1), src, N,
            batch.edge_perm_by_sender, batch.edge_perm_by_sender_inv,
        ).reshape(N, 3, F_in)
        return x + delta_x, v + delta_v


class PNAEqConv(nn.Module):
    in_dim: int
    out_dim: int
    deg_hist: Tuple[int, ...]
    num_radial: int
    edge_dim: Optional[int] = None
    last_layer: bool = False

    @nn.compact
    def __call__(self, inv, equiv, batch: GraphBatch, ctx, train: bool = False):
        s, v = PNAEqMessage(
            self.in_dim, self.deg_hist, self.num_radial, self.edge_dim,
            name="message",
        )(inv, equiv, batch, ctx)
        s, v = PainnUpdate(self.in_dim, self.last_layer, name="update")(s, v)
        s = nn.Dense(self.out_dim, name="node_embed_0")(s)
        s = jnp.tanh(s)
        s = nn.Dense(self.out_dim, name="node_embed_1")(s)
        if not self.last_layer:
            v = nn.Dense(self.out_dim, name="vec_embed")(v)
        return s, v


class PNAEqStack(HydraBase):
    is_edge_model: bool = True

    def get_conv(self, input_dim, output_dim, edge_dim=None, last_layer=False,
                 name=None):
        return PNAEqConv(
            input_dim, output_dim,
            deg_hist=self.cfg.pna_deg,
            num_radial=self.cfg.num_radial,
            edge_dim=edge_dim,
            last_layer=last_layer,
            name=name,
        )

    def _conv_plan(self):
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
        return None  # Identity (ref: PNAEqStack._init_conv:88)

    def _embedding(self, batch: GraphBatch):
        """ref: PNAEqStack._embedding:179-223."""
        inv, _, ctx = super()._embedding(batch)
        diff, dist = get_edge_vectors_and_lengths(
            batch.pos, batch.senders, batch.receivers, batch.edge_shifts,
            normalize=True, edge_mask=batch.edge_mask,
        )
        d = jnp.maximum(dist[:, 0], 1e-12)
        rbf = sinc_expansion(d, self.cfg.num_radial, self.cfg.radius)
        rbf = rbf * cosine_cutoff(d, self.cfg.radius)[:, None]
        ctx["edge_rbf"] = rbf
        ctx["edge_vec"] = diff
        v = jnp.zeros((inv.shape[0], 3, inv.shape[1]), inv.dtype)
        return inv, v, ctx
