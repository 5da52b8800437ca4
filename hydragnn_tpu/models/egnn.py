"""EGNN stack (ref: hydragnn/models/EGCLStack.py:20-298).

E(n)-GNN layer (E_GCL): edge MLP on [x_src, x_dst, |r|, edge_attr], messages
summed per SOURCE node (ref: E_GCL.node_model aggregates over row =
edge_index[0]), node MLP on [x, agg]; optional equivariant coordinate update
pos += mean_src(diff_hat * tanh(coord_mlp(m))) skipped in the last layer.
Feature layers are Identity (ref: EGCLStack.py:54).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from hydragnn_tpu.graph import GraphBatch
from hydragnn_tpu.models.base import HydraBase
from hydragnn_tpu.models.layers import split_init
from hydragnn_tpu.ops.geometry import get_edge_vectors_and_lengths
from hydragnn_tpu.ops.segment import segment_mean, segment_sum, segment_sum_via_perm


class _DenseParams(nn.Module):
    """Parameter holder with nn.Dense's tree layout ({kernel, bias}) so the
    weights can feed either the plain XLA path or the fused Pallas kernel
    without changing the param pytree."""

    in_features: int
    features: int
    use_bias: bool = True
    kernel_init: any = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", self.kernel_init, (self.in_features, self.features)
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return k, b


_SECOND_ORDER = False  # set by the trainer around force-training traces


class fused_kernels_disabled:
    """Trace-time marker for SECOND-ORDER (energy-force, grad-of-grad)
    traces. The trainer wraps its force loss in this context; each fused
    call site then decides via ``_use_fused_edge_kernel(second_order_ok=
    ...)``: families whose backward is itself a differentiable custom-VJP
    op (EGNN/SchNet/PAINN within their VMEM gates, round 4) stay fused,
    the rest bake the unfused XLA path into the trace. The flag is
    consulted while tracing, so jitted programs fix the path at compile
    time."""

    def __enter__(self):
        global _SECOND_ORDER
        self._prev = _SECOND_ORDER
        _SECOND_ORDER = True

    def __exit__(self, *exc):
        global _SECOND_ORDER
        _SECOND_ORDER = self._prev


def _use_fused_edge_kernel(
    batch: GraphBatch, second_order_ok: bool = False
) -> bool:
    """Fused per-graph-block edge-chain kernel (ops/pallas_egnn.py):
    requires the slotted collate layout; TPU-only unless forced
    (HYDRAGNN_FUSED_EGNN=1 enables under interpret mode for tests;
    =0 disables). Inside second-order (force-training) traces — see
    fused_kernels_disabled — only kernels that declare
    ``second_order_ok`` (a differentiable custom-VJP backward, e.g. the
    EGNN chain's second-order kernel) stay fused; others fall back to
    the unfused XLA path. HYDRAGNN_FUSED_SECOND_ORDER=0 forces the
    fallback for all (A/B + debugging)."""
    import os

    if _SECOND_ORDER and not (
        second_order_ok
        and os.getenv("HYDRAGNN_FUSED_SECOND_ORDER", "1") != "0"
    ):
        return False
    flag = os.getenv("HYDRAGNN_FUSED_EGNN", "auto")
    if flag == "0":
        return False
    if batch.node_slot is None or batch.edge_slot is None:
        return False
    if flag == "1":
        return True
    return jax.default_backend() not in ("cpu", "gpu")


class E_GCL(nn.Module):
    in_dim: int
    out_dim: int
    hidden_dim: int
    edge_dim: int = 0
    equivariant: bool = False
    tanh: bool = True
    aggr: str = "sum"  # "mean": beyond-reference ablation (ArchConfig)

    @nn.compact
    def __call__(self, inv, equiv, batch: GraphBatch, ctx, train: bool = False):
        s, r = batch.senders, batch.receivers
        N = inv.shape[0]
        if "egnn_geometry" in ctx:
            # coordinates never update (equivariance off): geometry was
            # computed once for all layers by EGCLStack._embedding
            diff_hat, radial = ctx["egnn_geometry"]
        else:
            # equivariant (positional-update) mode matches the reference:
            # shifts unsupported once coordinates move
            # (ref: EGCLStack.py:275-279 zeroed edge_shifts)
            diff_hat, radial = get_edge_vectors_and_lengths(
                equiv, s, r, normalize=True, eps=1.0,
                edge_mask=batch.edge_mask,
            )
        # transform-then-gather: the first edge-MLP layer is linear in the
        # concat [x_src, x_dst, radial, e_attr], so W splits column-wise and
        # the node-feature halves are computed ONCE per node ([N, F] matmuls,
        # E/N ~ deg times fewer FLOPs than the [E, 2F] form) and gathered as
        # [E, H] — also half the gather traffic of concat-then-transform.
        # Same math, same gradients; ref layout (EGCLStack.py:175-298
        # edge_model) is recovered by concatenating the three kernels.
        geom_parts = [radial]
        e_attr = ctx.get("edge_attr")
        if self.edge_dim and e_attr is not None:
            geom_parts.append(e_attr)
        F = inv.shape[-1]
        g = sum(int(p.shape[-1]) for p in geom_parts)
        fan_total = 2 * F + g
        pre_s = nn.Dense(
            self.hidden_dim, name="edge_mlp_0_src",
            kernel_init=split_init(F, fan_total),
        )(inv)
        pre_d = nn.Dense(
            self.hidden_dim, use_bias=False, name="edge_mlp_0_dst",
            kernel_init=split_init(F, fan_total),
        )(inv)
        wg, _ = _DenseParams(
            g, self.hidden_dim, use_bias=False,
            kernel_init=split_init(g, fan_total), name="edge_mlp_0_geom",
        )()
        w1, b1 = _DenseParams(
            self.hidden_dim, self.hidden_dim, name="edge_mlp_1"
        )()
        geom_feats = jnp.concatenate(geom_parts, axis=-1)

        from hydragnn_tpu.ops.pallas_egnn import second_order_supported

        fused = (not self.equivariant) and _use_fused_edge_kernel(
            batch,
            second_order_ok=second_order_supported(
                self.hidden_dim, inv.dtype
            ),
        )
        if fused:
            # whole edge chain (gathers -> edge MLP -> relu -> mask ->
            # segment-sum-by-sender) in one per-graph-block Pallas kernel;
            # [E, H] intermediates never touch HBM (ops/pallas_egnn.py)
            from hydragnn_tpu.ops.pallas_egnn import egnn_edge_fused

            agg = egnn_edge_fused(
                pre_s, pre_d, geom_feats.astype(pre_s.dtype),
                w1.astype(pre_s.dtype), b1.astype(pre_s.dtype),
                wg.astype(pre_s.dtype),
                batch.senders, batch.receivers,
                batch.node_slot, batch.edge_slot,
            )
            # zero padding-slot garbage rows (see models/painn.py note:
            # unchecked they can overflow across layers and NaN-poison the
            # masked loss; the unfused path zeroes them via edge_mask)
            agg = agg * batch.node_mask.astype(agg.dtype)[:, None]
            if self.aggr == "mean":
                from hydragnn_tpu.ops.segment import degree

                deg = degree(s, N, mask=batch.edge_mask,
                             indices_are_sorted=False)
                agg = agg / jnp.maximum(deg, 1.0)[:, None].astype(agg.dtype)
            h = jnp.concatenate([inv, agg], axis=-1)
            h = jax.nn.relu(nn.Dense(self.hidden_dim, name="node_mlp_0")(h))
            h = nn.Dense(self.out_dim, name="node_mlp_1")(h)
            return h, equiv

        geom = geom_feats.astype(pre_s.dtype) @ wg.astype(pre_s.dtype)
        m = batch.gather_src(pre_s) + batch.gather_dst(pre_d) + geom
        m = jax.nn.relu(m)
        m = jax.nn.relu(m @ w1.astype(m.dtype) + b1.astype(m.dtype))
        m = m * batch.edge_mask[:, None].astype(m.dtype)

        if self.equivariant:
            hw = jax.nn.relu(nn.Dense(self.hidden_dim, name="coord_mlp_0")(m))
            coef = nn.Dense(
                1, use_bias=False, name="coord_mlp_1",
                kernel_init=nn.initializers.variance_scaling(
                    0.001 ** 2, "fan_avg", "uniform"
                ),
            )(hw)
            if self.tanh:
                coef = jnp.tanh(coef)
            trans = jnp.clip(diff_hat * coef, -100.0, 100.0)
            agg = segment_mean(
                trans, s, N, mask=batch.edge_mask, indices_are_sorted=False
            )
            equiv = equiv + agg

        # aggregate messages into SOURCE nodes (ref: E_GCL.node_model row-aggr);
        # sender-sorted permutation unlocks the Pallas sorted kernel
        agg = segment_sum_via_perm(
            m, s, N, batch.edge_perm_by_sender,
            batch.edge_perm_by_sender_inv,
        )
        if self.aggr == "mean":
            from hydragnn_tpu.ops.segment import degree

            deg = degree(s, N, mask=batch.edge_mask,
                         indices_are_sorted=False)
            agg = agg / jnp.maximum(deg, 1.0)[:, None].astype(agg.dtype)
        h = jnp.concatenate([inv, agg], axis=-1)
        h = jax.nn.relu(nn.Dense(self.hidden_dim, name="node_mlp_0")(h))
        h = nn.Dense(self.out_dim, name="node_mlp_1")(h)
        return h, equiv


class EGCLStack(HydraBase):
    is_edge_model: bool = True

    def get_conv(self, input_dim, output_dim, edge_dim=None, last_layer=False,
                 name=None):
        return E_GCL(
            input_dim,
            output_dim,
            hidden_dim=self.cfg.hidden_dim,
            edge_dim=edge_dim or 0,
            equivariant=self.cfg.equivariance and not last_layer,
            aggr=getattr(self.cfg, "egnn_aggr", "sum"),
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
        return None  # Identity (ref: EGCLStack.py:54)

    def _embedding(self, batch: GraphBatch):
        inv, equiv, ctx = super()._embedding(batch)
        if not self.cfg.equivariance:
            # no coordinate updates: edge geometry is layer-invariant, so
            # compute the [E,3]/[E,1] gathers + norm ONCE for all layers.
            # PBC shifts apply here — positions are static, so cross-
            # boundary distances are exact (the reference zeroes shifts for
            # this stack even in the static case, EGCLStack.py:113-115;
            # beyond-parity correctness for PBC datasets like the LJ
            # example)
            ctx = dict(ctx)
            ctx["egnn_geometry"] = get_edge_vectors_and_lengths(
                equiv, batch.senders, batch.receivers,
                shifts=batch.edge_shifts, normalize=True,
                eps=1.0, edge_mask=batch.edge_mask,
            )
        return inv, equiv, ctx
