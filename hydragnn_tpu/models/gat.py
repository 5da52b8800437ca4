"""GAT stack (ref: hydragnn/models/GATStack.py:20-208).

Uses GATv2Conv semantics (PyG GATv2Conv: heads=6, negative_slope=0.05,
add_self_loops=True, concat on hidden layers, non-concat last layer).
Per-edge logits: a^T LeakyReLU(lin_l(x_j) + lin_r(x_i) [+ lin_e(e_ij)]);
softmax over incoming edges INCLUDING an implicit self-loop (materialized
analytically — no edge-list mutation needed on static shapes); output is the
attention-weighted sum of source transforms.

Dimension bookkeeping mirrors GATStack._init_conv: hidden layers emit
hidden_dim*heads (concat), the last layer averages heads to hidden_dim.
Under GPS all layers stay at hidden_dim via an out_lin projection.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from hydragnn_tpu.graph import GraphBatch
from hydragnn_tpu.models.base import HydraBase
from hydragnn_tpu.models.layers import MaskedBatchNorm
from hydragnn_tpu.ops.segment import segment_sum, segment_mean


class GATv2Conv(nn.Module):
    in_dim: int
    out_dim: int
    heads: int = 6
    negative_slope: float = 0.05
    concat: bool = True
    edge_dim: Optional[int] = None
    dropout: float = 0.0
    out_lin: bool = False  # GPS: project concat output back to out_dim

    @nn.compact
    def __call__(self, inv, equiv, batch: GraphBatch, ctx, train: bool = False):
        H, C = self.heads, self.out_dim
        N = inv.shape[0]
        x_l = nn.Dense(H * C, name="lin_l")(inv).reshape(N, H, C)  # source
        x_r = nn.Dense(H * C, name="lin_r")(inv).reshape(N, H, C)  # target
        att = self.param("att", nn.initializers.lecun_normal(), (1, H, C))

        s, r = batch.senders, batch.receivers
        lin_edge = (
            nn.Dense(H * C, name="lin_edge") if self.edge_dim else None
        )
        e_attr_probe = ctx.get("edge_attr")
        if (
            batch.adjacency is not None
            and batch.node_slot is not None
            and (lin_edge is None or e_attr_probe is None)
        ):
            # Dense per-graph attention for slotted batches: pair logits as a
            # fused broadcast-reduce (no gathers, no [E, H*C] intermediate),
            # softmax over [G, H, S, S] with the adjacency multiplicity as the
            # exp weight (duplicate edges sum exactly as in the edgewise
            # path), aggregation as a batched MXU matmul. 8.3x the edgewise
            # path fwd+bwd on v5e at G=128/S=64/H=6/C=128
            # (bench/gat_dense_proto.py); exact to ~2e-6 with fp32 matmuls.
            # Edge-feature GAT keeps the edgewise path (per-edge terms do not
            # factor over (i, j) pairs).
            out = self._dense_attention(x_l, x_r, att, batch, train)
        else:
            # real-edge logits
            z = batch.gather_src(x_l) + batch.gather_dst(x_r)
            e_attr = ctx.get("edge_attr")
            if lin_edge is not None and e_attr is not None:
                z = z + lin_edge(e_attr).reshape(-1, H, C)
            z = jax.nn.leaky_relu(z, self.negative_slope)
            logits = jnp.sum(z * att, axis=-1)  # [E, H]
            # self-loop logits (add_self_loops=True); edge_attr fill =
            # per-node mean
            z_self = x_l + x_r
            if lin_edge is not None and e_attr is not None:
                fill = segment_mean(e_attr, r, N, mask=batch.edge_mask,
                                    indices_are_sorted=batch.edges_receiver_sorted)
                z_self = z_self + lin_edge(fill).reshape(N, H, C)
            z_self = jax.nn.leaky_relu(z_self, self.negative_slope)
            logits_self = jnp.sum(z_self * att, axis=-1)  # [N, H]

            # joint softmax over {incoming edges} ∪ {self loop}
            neg = jnp.finfo(inv.dtype).min
            logits = jnp.where(batch.edge_mask[:, None], logits, neg)
            m_edges = jax.ops.segment_max(
                logits, r, N,
                indices_are_sorted=batch.edges_receiver_sorted,
            )
            m = jnp.maximum(m_edges, logits_self)
            m = jnp.where(jnp.isfinite(m), m, 0.0)
            exp_e = jnp.exp(logits - m[r]) * batch.edge_mask[:, None]
            exp_s = jnp.exp(logits_self - m)
            denom = segment_sum(
                exp_e, r, N,
                indices_are_sorted=batch.edges_receiver_sorted,
            ) + exp_s
            alpha_e = exp_e / jnp.maximum(denom[r], 1e-16)
            alpha_s = exp_s / jnp.maximum(denom, 1e-16)
            if self.dropout > 0.0 and train:
                rng_key = self.make_rng("dropout")
                keep = jax.random.bernoulli(
                    rng_key, 1 - self.dropout, alpha_e.shape
                )
                alpha_e = alpha_e * keep / (1 - self.dropout)

            # gather + aggregate flattened to [*, H*C]: 2-D sorted segment
            # ops route through the Pallas CSR kernel (3-D fall back to XLA
            # scatter)
            msgs = batch.gather_src(x_l.reshape(N, H * C)).reshape(-1, H, C)
            msgs = (alpha_e[..., None] * msgs).reshape(-1, H * C)
            out = segment_sum(
                msgs, r, N,
                indices_are_sorted=batch.edges_receiver_sorted,
            ).reshape(N, H, C)
            out = out + alpha_s[..., None] * x_l

        if self.concat:
            out = out.reshape(N, H * C)
        else:
            out = out.mean(axis=1)
        bias = self.param(
            "bias", nn.initializers.zeros, (H * C if self.concat else C,)
        )
        out = out + bias
        if self.out_lin:
            out = nn.Dense(self.out_dim, name="out_lin")(out)
        return out, equiv

    def _dense_attention(self, x_l, x_r, att, batch, train):
        """Slotted dense GATv2 attention. Produces the same [N, H, C] output
        as the edgewise path: the adjacency multiplicity A[g, i, j] weights
        exp(logit) so duplicate edges sum identically, and the analytic
        self-loop is the diagonal with weight 1 on top of A."""
        H, C = self.heads, self.out_dim
        A = batch.adjacency  # [G, S, S], real edges only (padding excluded)
        Gc, Sc = A.shape[0], A.shape[1]
        N = x_l.shape[0]
        hi = jax.lax.Precision.HIGHEST
        xl4 = x_l.reshape(Gc, Sc, H, C)
        xr4 = x_r.reshape(Gc, Sc, H, C)
        z = jax.nn.leaky_relu(
            xr4[:, :, None] + xl4[:, None, :, :], self.negative_slope
        )
        logits = jnp.einsum("gijhc,hc->ghij", z, att[0], precision=hi)
        Wd = A[:, None].astype(logits.dtype)  # [G, 1, S, S]
        eye = jnp.eye(Sc, dtype=jnp.bool_)
        has = (Wd > 0) | eye[None, None]
        neg = jnp.finfo(logits.dtype).min
        m = jnp.max(jnp.where(has, logits, neg), axis=-1, keepdims=True)
        ex_e = Wd * jnp.exp(logits - m)  # [G, H, S, S]
        logits_self = jnp.diagonal(logits, axis1=-2, axis2=-1)  # [G, H, S]
        ex_s = jnp.exp(logits_self - m[..., 0])
        denom = jnp.sum(ex_e, axis=-1) + ex_s  # [G, H, S]
        alpha_e = ex_e / jnp.maximum(denom[..., None], 1e-16)
        alpha_s = ex_s / jnp.maximum(denom, 1e-16)
        if self.dropout > 0.0 and train:
            rng_key = self.make_rng("dropout")
            keep = jax.random.bernoulli(
                rng_key, 1 - self.dropout, alpha_e.shape
            )
            alpha_e = alpha_e * keep.astype(alpha_e.dtype) / (1 - self.dropout)
        out = jnp.einsum("ghij,gjhc->gihc", alpha_e, xl4, precision=hi)
        out = out.reshape(N, H, C)
        out = out + jnp.swapaxes(alpha_s, 1, 2).reshape(N, H)[..., None] * x_l
        return out


class GATStack(HydraBase):
    is_edge_model: bool = True
    heads: int = 6
    negative_slope: float = 0.05

    def _conv_plan(self):
        """ref: GATStack._init_conv:38-109."""
        cfg = self.cfg
        H = self.heads
        if cfg.use_global_attn:
            plan = [(self.embed_dim, cfg.hidden_dim, {"concat": True})]
            for _ in range(cfg.num_conv_layers - 2):
                plan.append((cfg.hidden_dim, cfg.hidden_dim, {"concat": True}))
            plan.append((cfg.hidden_dim, cfg.hidden_dim, {"concat": False}))
        else:
            plan = [(self.embed_dim, cfg.hidden_dim, {"concat": True})]
            for _ in range(cfg.num_conv_layers - 2):
                plan.append((cfg.hidden_dim * H, cfg.hidden_dim, {"concat": True}))
            plan.append((cfg.hidden_dim * H, cfg.hidden_dim, {"concat": False}))
        return plan

    def get_conv(self, input_dim, output_dim, edge_dim=None, last_layer=False,
                 concat=None, name=None):
        if concat is None:
            concat = not last_layer
        return GATv2Conv(
            input_dim,
            output_dim,
            heads=self.heads,
            negative_slope=self.negative_slope,
            concat=concat,
            edge_dim=edge_dim,
            dropout=self.cfg.dropout,
            out_lin=self.cfg.use_global_attn and concat,
            name=name,
        )

    def _make_node_conv_head(self, b, out_dim, ihead):
        """ref: GATStack._init_node_conv:110-174 — hidden convs concat heads."""
        cfg = self.cfg
        dims = list(b.dim_headlayers)
        layers = []
        in_dim = cfg.hidden_dim
        for il in range(b.num_headlayers):
            conv = self.get_conv(
                in_dim, dims[il], concat=True,
                name=f"nodehead_{ihead}_{b.type}_conv_{il}",
            )
            norm = MaskedBatchNorm(name=f"nodehead_{ihead}_{b.type}_norm_{il}")
            layers.append((conv, norm))
            in_dim = dims[il] * self.heads
        conv = self.get_conv(
            in_dim, out_dim, concat=False,
            name=f"nodehead_{ihead}_{b.type}_conv_out",
        )
        norm = MaskedBatchNorm(name=f"nodehead_{ihead}_{b.type}_norm_out")
        layers.append((conv, norm))
        return tuple(layers)
