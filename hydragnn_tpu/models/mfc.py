"""MFC stack (ref: hydragnn/models/MFCStack.py:21-53).

MFConv semantics (PyG): degree-specific weights,
out_i = W_root[d_i] x_i + W_nbr[d_i] sum_j x_j, d_i = min(deg_i, max_degree).
Implemented as a lax.scan over the degree-stacked weights with one-hot
masking (dense matmuls, static shapes) instead of per-degree index_select.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from hydragnn_tpu.graph import GraphBatch
from hydragnn_tpu.models.base import HydraBase
from hydragnn_tpu.ops.segment import gather_scatter_sum, degree


class MFConv(nn.Module):
    in_dim: int
    out_dim: int
    max_degree: int = 10

    @nn.compact
    def __call__(self, inv, equiv, batch: GraphBatch, ctx, train: bool = False):
        D = self.max_degree + 1
        w_root = self.param(
            "w_root", nn.initializers.lecun_normal(), (D, self.in_dim, self.out_dim)
        )
        b_root = self.param("b_root", nn.initializers.zeros, (D, self.out_dim))
        w_nbr = self.param(
            "w_nbr", nn.initializers.lecun_normal(), (D, self.in_dim, self.out_dim)
        )

        agg = gather_scatter_sum(
            inv, batch.senders, batch.receivers, inv.shape[0],
            edge_mask=batch.edge_mask,
            perm_by_sender=batch.edge_perm_by_sender,
            adjacency=batch.adjacency,
            gp=batch.gp,
            bcsr=batch.bcsr,
            window_hint=batch.spmm_window,
            edges_receiver_sorted=batch.edges_receiver_sorted,
        )
        deg = degree(batch.receivers, inv.shape[0], mask=batch.edge_mask,
                     indices_are_sorted=batch.edges_receiver_sorted)
        d = jnp.minimum(deg.astype(jnp.int32), self.max_degree)

        def body(acc, args):
            wi_r, bi_r, wi_n, di = args
            sel = (d == di).astype(inv.dtype)[:, None]
            acc = acc + sel * (inv @ wi_r + bi_r + agg @ wi_n)
            return acc, None

        init = jnp.zeros((inv.shape[0], self.out_dim), inv.dtype)
        out, _ = jax.lax.scan(
            body, init, (w_root, b_root, w_nbr, jnp.arange(D, dtype=jnp.int32))
        )
        return out, equiv


class MFCStack(HydraBase):
    is_edge_model: bool = False

    def get_conv(self, input_dim, output_dim, edge_dim=None, last_layer=False,
                 name=None):
        return MFConv(input_dim, output_dim, max_degree=self.cfg.max_neighbours,
                      name=name)
