"""PAINN stack (ref: hydragnn/models/PAINNStack.py:27-343).

Scalar + vector node features. Message: filter = lin(sinc_rbf) * cos_cutoff
[* edge_filter(edge_attr)]; gates split into (vector-gate, edge-gate,
scalar-msg); messages gathered from edge_index[1] and aggregated into
edge_index[0] (the reference's reversed flow — replicated exactly, incl. the
double normalization of edge_diff/dist, ref: PainnMessage.forward:230-246).
Update: U/V linear mixing of vectors, |Vv| + s -> MLP -> gates; last layer
drops the vector path. Per-layer embed-out MLP (tanh) resizes scalars;
vectors resized by a linear (not in last layer). Identity feature layers.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from hydragnn_tpu.graph import GraphBatch
from hydragnn_tpu.models.base import HydraBase
from hydragnn_tpu.ops.geometry import get_edge_vectors_and_lengths
from hydragnn_tpu.ops.radial import cosine_cutoff, sinc_expansion
from hydragnn_tpu.ops.segment import segment_sum, segment_sum_via_perm


class PainnMessage(nn.Module):
    node_size: int
    num_radial: int
    cutoff: float
    edge_dim: Optional[int] = None

    @nn.compact
    def __call__(self, s_feat, v_feat, batch: GraphBatch, ctx):
        diff = ctx["diff"]  # [E, 3] normalized
        dist = ctx["dist"]  # [E, 1]
        ns = self.node_size
        rbf = sinc_expansion(dist[:, 0], self.num_radial, self.cutoff)
        from hydragnn_tpu.models.egnn import (
            _DenseParams, _use_fused_edge_kernel,
        )

        wf, bf = _DenseParams(
            self.num_radial, ns * 3, name="filter_layer"
        )()
        e_attr = ctx.get("edge_attr")

        h = nn.Dense(ns, name="scalar_mlp_0")(s_feat)
        h = jax.nn.silu(h)
        h = nn.Dense(ns * 3, name="scalar_mlp_1")(h)

        from hydragnn_tpu.ops.pallas_painn import second_order_supported

        if (
            (self.edge_dim is None or e_attr is None)
            and _use_fused_edge_kernel(
                batch,
                second_order_ok=second_order_supported(
                    self.node_size, s_feat.dtype
                ),
            )
        ):
            # whole message chain (filter Dense x cutoff, h/v gathers,
            # gating, vector assembly, both sender segment-sums) in one
            # per-graph-block Pallas kernel; [E, 3F] intermediates never
            # touch HBM (ops/pallas_painn.py). Second-order capable up to
            # the VMEM gate (second_order_supported): force training keeps
            # the fused chain at accuracy-relevant widths.
            from hydragnn_tpu.ops.pallas_painn import painn_message_fused

            cutw = cosine_cutoff(dist, self.cutoff)[:, 0]
            res_s, res_v = painn_message_fused(
                h, v_feat, rbf.astype(h.dtype),
                (cutw * batch.edge_mask.astype(cutw.dtype)).astype(h.dtype),
                (diff / dist).astype(h.dtype),
                wf.astype(h.dtype), bf.astype(h.dtype),
                batch.senders, batch.receivers,
                batch.node_slot, batch.edge_slot,
            )
            # zero the padding-slot rows: the kernel lets the trailing
            # padding-graph block accumulate garbage (excluded from real
            # slots by the one-hot), but PAINN's update SQUARES magnitudes
            # layer-over-layer — unmasked, the garbage overflows to inf at
            # GFM scale and 0 * inf = NaN poisons the masked loss. The
            # unfused path zeroes these rows via edge_mask; match it.
            nm = batch.node_mask.astype(res_s.dtype)
            return (
                s_feat + res_s * nm[:, None],
                v_feat + res_v * nm[:, None, None],
            )

        fw = rbf @ wf + bf
        fw = fw * cosine_cutoff(dist, self.cutoff)
        if self.edge_dim is not None and e_attr is not None:
            ef = nn.Dense(ns, name="edge_filter_0")(e_attr)
            ef = jax.nn.silu(ef)
            ef = nn.Dense(ns * 3, name="edge_filter_1")(ef)
            fw = fw * ef

        # reference flow: gather from edge_index[1], aggregate into edge_index[0]
        src_gather = batch.receivers
        dst_scatter = batch.senders
        filter_out = fw * batch.gather_dst(h)
        gate_v, gate_e, msg_s = jnp.split(filter_out, 3, axis=1)

        N = s_feat.shape[0]
        ns = self.node_size
        # gather/aggregate the vector channel FLATTENED [*, 3F]: 3-D
        # arrays miss every optimized 2-D path (Pallas segment kernels,
        # sorted-backward gathers) and lower to raw XLA scatter-adds
        v_dst = batch.gather_dst(v_feat.reshape(N, -1)).reshape(-1, 3, ns)
        msg_v = v_dst * gate_v[:, None, :]
        edge_vector = gate_e[:, None, :] * (diff / dist)[:, :, None]
        msg_v = msg_v + edge_vector

        em = batch.edge_mask
        msg_s = msg_s * em[:, None].astype(msg_s.dtype)
        msg_v = msg_v * em[:, None, None].astype(msg_v.dtype)
        perm = batch.edge_perm_by_sender
        inv = batch.edge_perm_by_sender_inv
        res_s = segment_sum_via_perm(msg_s, dst_scatter, N, perm, inv)
        res_v = segment_sum_via_perm(
            msg_v.reshape(msg_v.shape[0], -1), dst_scatter, N, perm, inv
        ).reshape(N, 3, ns)
        return s_feat + res_s, v_feat + res_v


class PainnUpdate(nn.Module):
    node_size: int
    last_layer: bool = False

    @nn.compact
    def __call__(self, s_feat, v_feat):
        ns = self.node_size
        Uv = nn.Dense(ns, name="update_U")(v_feat)
        Vv = nn.Dense(ns, name="update_V")(v_feat)
        # zero-safe norm: v starts at exactly 0 and linalg.norm has a 0/0
        # gradient there
        Vv_norm = jnp.sqrt(jnp.sum(Vv * Vv, axis=1) + 1e-24)
        h = jnp.concatenate([Vv_norm, s_feat], axis=1)
        h = nn.Dense(ns, name="update_mlp_0")(h)
        h = jax.nn.silu(h)
        h = nn.Dense(ns * (2 if self.last_layer else 3), name="update_mlp_1")(h)
        inner = jnp.sum(Uv * Vv, axis=1)
        if self.last_layer:
            a_sv, a_ss = jnp.split(h, 2, axis=1)
            return s_feat + a_sv * inner + a_ss, v_feat
        a_vv, a_sv, a_ss = jnp.split(h, 3, axis=1)
        delta_v = a_vv[:, None, :] * Uv
        return s_feat + a_sv * inner + a_ss, v_feat + delta_v


class PainnConv(nn.Module):
    in_dim: int
    out_dim: int
    num_radial: int
    cutoff: float
    edge_dim: Optional[int] = None
    last_layer: bool = False

    @nn.compact
    def __call__(self, inv, equiv, batch: GraphBatch, ctx, train: bool = False):
        s, v = PainnMessage(
            self.in_dim, self.num_radial, self.cutoff, self.edge_dim,
            name="message",
        )(inv, equiv, batch, ctx)
        s, v = PainnUpdate(self.in_dim, self.last_layer, name="update")(s, v)
        # embed-out resize (ref: PAINNStack.get_conv node_embed_out/vec_embed_out)
        s = nn.Dense(self.out_dim, name="node_embed_0")(s)
        s = jnp.tanh(s)
        s = nn.Dense(self.out_dim, name="node_embed_1")(s)
        if not self.last_layer:
            v = nn.Dense(self.out_dim, name="vec_embed")(v)
        return s, v


class PAINNStack(HydraBase):
    is_edge_model: bool = True

    def get_conv(self, input_dim, output_dim, edge_dim=None, last_layer=False,
                 name=None):
        return PainnConv(
            input_dim, output_dim,
            num_radial=self.cfg.num_radial,
            cutoff=self.cfg.radius,
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
        return None  # Identity (ref: PAINNStack._init_conv:61)

    def _embedding(self, batch: GraphBatch):
        """ref: PAINNStack._embedding:149-191 — normalized edge vectors,
        distances; equivariant state v initialized to zeros [N, 3, F]."""
        inv, _, ctx = super()._embedding(batch)
        diff, dist = get_edge_vectors_and_lengths(
            batch.pos, batch.senders, batch.receivers, batch.edge_shifts,
            normalize=True, edge_mask=batch.edge_mask,
        )
        ctx["diff"] = diff
        ctx["dist"] = jnp.maximum(dist, 1e-12)
        v = jnp.zeros((inv.shape[0], 3, inv.shape[1]), inv.dtype)
        return inv, v, ctx
