"""PNAPlus stack (ref: hydragnn/models/PNAPlusStack.py:40-304).

PNA aggregation + Bessel radial basis of edge length injected into messages:
  m_ij = pre_nn([x_i, x_j, enc(rbf[, edge_attr])]) * rbf_lin(rbf)
where rbf = envelope(d/c) * sin(n*pi*d/c) (BesselBasisLayer, trainable freq).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from hydragnn_tpu.graph import GraphBatch
from hydragnn_tpu.models.base import HydraBase
from hydragnn_tpu.models.layers import split_init
from hydragnn_tpu.models.pna import deg_stats
from hydragnn_tpu.ops.geometry import get_edge_vectors_and_lengths
from hydragnn_tpu.ops.radial import envelope
from hydragnn_tpu.ops.segment import degree, pna_aggregate


class BesselBasisLayer(nn.Module):
    """PyG BesselBasisLayer with trainable frequencies (init n*pi)."""

    num_radial: int
    cutoff: float
    envelope_exponent: int = 5

    @nn.compact
    def __call__(self, dist: jnp.ndarray) -> jnp.ndarray:
        freq = self.param(
            "freq",
            lambda k: jnp.arange(1, self.num_radial + 1, dtype=jnp.float32)
            * math.pi,
        )
        d = dist / self.cutoff
        return envelope(d, self.envelope_exponent)[:, None] * jnp.sin(
            freq * d[:, None]
        )


class PNAPlusConv(nn.Module):
    in_dim: int
    out_dim: int
    deg_hist: Tuple[int, ...]
    num_radial: int
    edge_dim: Optional[int] = None

    @nn.compact
    def __call__(self, inv, equiv, batch: GraphBatch, ctx, train: bool = False):
        N = inv.shape[0]
        F_in = self.in_dim
        rbf = ctx["rbf"]
        rbf_emb = jax.nn.relu(nn.Dense(F_in, name="rbf_emb")(rbf))
        e_attr = ctx.get("edge_attr")
        if self.edge_dim and e_attr is not None:
            enc = nn.Dense(F_in, name="edge_encoder")(
                jnp.concatenate([e_attr, rbf_emb], axis=-1)
            )
        else:
            enc = rbf_emb
        # transform-then-gather (see models/pna.py): pre_nn's kernel splits
        # over the [x_dst, x_st, enc] concat; node halves computed per node,
        # gathered as [E, F]. Identical math to the reference's pre_nn MLP
        # (PNAPlusStack.py:144-216 message path).
        F = inv.shape[-1]
        g = int(enc.shape[-1])
        fan_total = 2 * F + g
        pre_d = nn.Dense(
            F_in, name="pre_nn_dst", kernel_init=split_init(F, fan_total)
        )(inv)
        pre_s = nn.Dense(
            F_in, use_bias=False, name="pre_nn_src",
            kernel_init=split_init(F, fan_total),
        )(inv)
        h = (
            batch.gather_dst(pre_d)
            + batch.gather_src(pre_s)
            + nn.Dense(
                F_in, use_bias=False, name="pre_nn_enc",
                kernel_init=split_init(g, fan_total),
            )(enc)
        )
        h = h * nn.Dense(F_in, use_bias=False, name="rbf_lin")(rbf)

        m = batch.edge_mask
        r = batch.receivers
        srt = batch.edges_receiver_sorted
        # all four aggregators in ONE fused pass over the [E, F] messages
        # (ops/pallas_multiagg.py; unfused segment ops off-TPU)
        mean_a, min_a, max_a, std_a = pna_aggregate(
            h, r, N, mask=m, indices_are_sorted=srt,
            perm=batch.edge_perm_by_receiver,
        )
        out = jnp.concatenate([mean_a, min_a, max_a, std_a], axis=-1)
        avg_lin, avg_log = deg_stats(self.deg_hist)
        d = jnp.maximum(degree(r, N, mask=m, indices_are_sorted=srt), 1.0)[:, None]
        logd = jnp.log(d + 1.0)
        out = jnp.concatenate(
            [out, out * (logd / avg_log), out * (avg_log / logd),
             out * (d / avg_lin)],
            axis=-1,
        )
        out = jnp.concatenate([inv, out], axis=-1)
        out = nn.Dense(self.out_dim, name="post_nn")(out)
        return nn.Dense(self.out_dim, name="lin")(out), equiv


class PNAPlusStack(HydraBase):
    is_edge_model: bool = True

    def setup(self):
        self.rbf_layer = BesselBasisLayer(
            self.cfg.num_radial, self.cfg.radius, self.cfg.envelope_exponent,
            name="rbf",
        )
        super().setup()

    def get_conv(self, input_dim, output_dim, edge_dim=None, last_layer=False,
                 name=None):
        return PNAPlusConv(
            input_dim, output_dim, deg_hist=self.cfg.pna_deg,
            num_radial=self.cfg.num_radial, edge_dim=edge_dim, name=name,
        )

    def _embedding(self, batch: GraphBatch):
        """ref: PNAPlusStack._embedding:101-138 — adds rbf(edge length)."""
        inv, equiv, ctx = super()._embedding(batch)
        _, edge_dist = get_edge_vectors_and_lengths(
            batch.pos, batch.senders, batch.receivers, batch.edge_shifts,
            edge_mask=batch.edge_mask,
        )
        ctx["rbf"] = self.rbf_layer(edge_dist[:, 0])
        return inv, equiv, ctx
