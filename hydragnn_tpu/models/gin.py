"""GIN stack (ref: hydragnn/models/GINStack.py:21-49).

GINConv semantics (PyG): out = mlp((1+eps) * x + sum_{j in N(i)} x_j),
mlp = Linear(in,out) -> ReLU -> Linear(out,out), eps trainable, init 100.0.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from hydragnn_tpu.graph import GraphBatch
from hydragnn_tpu.models.base import HydraBase
from hydragnn_tpu.ops.segment import gather_scatter_sum


class GINConv(nn.Module):
    in_dim: int
    out_dim: int
    eps_init: float = 100.0

    @nn.compact
    def __call__(self, inv, equiv, batch: GraphBatch, ctx, train: bool = False):
        eps = self.param("eps", lambda k: jnp.asarray(self.eps_init, jnp.float32))
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
        h = (1.0 + eps) * inv + agg
        h = nn.Dense(self.out_dim, name="mlp_0")(h)
        h = jax.nn.relu(h)
        h = nn.Dense(self.out_dim, name="mlp_1")(h)
        return h, equiv


class GINStack(HydraBase):
    is_edge_model: bool = False

    def get_conv(self, input_dim, output_dim, edge_dim=None, last_layer=False,
                 name=None):
        return GINConv(input_dim, output_dim, name=name)
