"""CGCNN stack (ref: hydragnn/models/CGCNNStack.py:21-113).

CGConv semantics (PyG): z_ij = [x_i, x_j, e_ij];
out_i = x_i + sum_j sigmoid(lin_f(z_ij)) * softplus(lin_s(z_ij)).
Dimension-preserving; hidden_dim is forced to input_dim unless GPS embeds
first (ref: config_utils.py:79-86). Conv-type node heads are unsupported,
matching the reference (ref: CGCNNStack._init_node_conv).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from hydragnn_tpu.graph import GraphBatch
from hydragnn_tpu.models.base import HydraBase
from hydragnn_tpu.ops.segment import segment_sum


class CGConv(nn.Module):
    channels: int
    edge_dim: int = 0

    @nn.compact
    def __call__(self, inv, equiv, batch: GraphBatch, ctx, train: bool = False):
        x_src, x_dst = batch.gather_src_dst(inv)
        parts = [x_dst, x_src]
        e = ctx.get("edge_attr")
        if self.edge_dim and e is not None:
            parts.append(e)
        z = jnp.concatenate(parts, axis=-1)
        gate = jax.nn.sigmoid(nn.Dense(self.channels, name="lin_f")(z))
        core = jax.nn.softplus(nn.Dense(self.channels, name="lin_s")(z))
        msg = gate * core * batch.edge_mask[:, None].astype(inv.dtype)
        agg = segment_sum(msg, batch.receivers, inv.shape[0],
                          indices_are_sorted=batch.edges_receiver_sorted)
        return inv + agg, equiv


class CGCNNStack(HydraBase):
    is_edge_model: bool = True

    def get_conv(self, input_dim, output_dim, edge_dim=None, last_layer=False,
                 name=None):
        return CGConv(channels=input_dim, edge_dim=edge_dim or 0, name=name)

    def _make_node_conv_head(self, b, out_dim, ihead):
        raise ValueError(
            '"conv" for node features decoder part in CGCNN is not ready yet. '
            'Use "mlp" or "mlp_per_node".'
        )
