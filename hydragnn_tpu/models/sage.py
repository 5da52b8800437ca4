"""GraphSAGE stack (ref: hydragnn/models/SAGEStack.py:21-47).

SAGEConv semantics (PyG defaults): out = lin_l(mean_{j} x_j) + lin_r(x_i),
lin_l with bias, lin_r without.
"""

from __future__ import annotations

import flax.linen as nn

from hydragnn_tpu.graph import GraphBatch
from hydragnn_tpu.models.base import HydraBase
from hydragnn_tpu.ops.segment import gather_scatter_mean


class SAGEConv(nn.Module):
    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, inv, equiv, batch: GraphBatch, ctx, train: bool = False):
        agg = gather_scatter_mean(
            inv, batch.senders, batch.receivers, inv.shape[0],
            edge_mask=batch.edge_mask,
            perm_by_sender=batch.edge_perm_by_sender,
            adjacency=batch.adjacency,
            gp=batch.gp,
            bcsr=batch.bcsr,
            window_hint=batch.spmm_window,
            edges_receiver_sorted=batch.edges_receiver_sorted,
        )
        h = nn.Dense(self.out_dim, name="lin_l")(agg) + nn.Dense(
            self.out_dim, use_bias=False, name="lin_r"
        )(inv)
        return h, equiv


class SAGEStack(HydraBase):
    is_edge_model: bool = False

    def get_conv(self, input_dim, output_dim, edge_dim=None, last_layer=False,
                 name=None):
        return SAGEConv(input_dim, output_dim, name=name)
