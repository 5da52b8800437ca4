"""HydraBase — the multi-headed multi-task model skeleton (flax.linen).

TPU-native re-design of ``hydragnn/models/Base.py`` (ref: Base.__init__:32,
_init_conv:198, _embedding:217, _multihead:342, forward:446, MLPNode:692).

Differences from the reference, by design:
  - static padded shapes + masks everywhere (no dynamic ``to_dense_batch``);
  - multibranch head dispatch is dense: every branch computes on all graphs,
    results selected by ``dataset_id`` (no boolean-mask gathers — XLA-friendly,
    branches are few);
  - BatchNorm is mask-aware (identical statistics to unpadded reference);
  - activation checkpointing via ``nn.remat`` (ref: Base.py:459-465).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from hydragnn_tpu.graph import GraphBatch
from hydragnn_tpu.models.arch import ArchConfig, BranchConfig
from hydragnn_tpu.models.layers import (
    MLP,
    MaskedBatchNorm,
    activation_function_selection,
)
from hydragnn_tpu.models.gps import GPSConv
from hydragnn_tpu.ops.segment import masked_segment_mean

EdgeContext = Dict[str, jnp.ndarray]


def branch_index(branch_type: str) -> int:
    return int(branch_type.split("-")[-1])


class GraphSharedHead(nn.Module):
    """Shared dense layers for graph-level outputs (ref: Base.py:354-362)."""

    branch: BranchConfig
    activation: str

    @nn.compact
    def __call__(self, x_graph: jnp.ndarray) -> jnp.ndarray:
        act = activation_function_selection(self.activation)
        feats = [self.branch.dim_sharedlayers] * self.branch.num_sharedlayers
        return MLP(feats, activation=act, activate_final=True)(x_graph)


class GraphHeadMLP(nn.Module):
    """Per-head MLP after the shared layers (ref: Base.py:378-392).
    ``initial_bias`` fills the final layer's bias (UQ option,
    ref: Base._set_bias:253-258)."""

    branch: BranchConfig
    out_dim: int
    activation: str
    initial_bias: Optional[float] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = activation_function_selection(self.activation)
        dims = list(self.branch.dim_headlayers[: self.branch.num_headlayers])
        x = MLP(dims, activation=act, activate_final=True)(x)
        bias_init = (
            nn.initializers.constant(self.initial_bias)
            if self.initial_bias is not None
            else nn.initializers.zeros
        )
        return nn.Dense(self.out_dim, bias_init=bias_init)(x)


class MLPNode(nn.Module):
    """Node-level MLP head (ref: Base.py:692-749).

    ``mlp``: one MLP shared over nodes. ``mlp_per_node``: a separate MLP per
    node index (fixed graph size), implemented as stacked weights + einsum
    (dense batched matmul — MXU-friendly, vs the reference's python loop over
    nodes, ref: Base.py:744-748).
    """

    branch: BranchConfig
    out_dim: int
    activation: str
    num_nodes: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, batch: GraphBatch) -> jnp.ndarray:
        act = activation_function_selection(self.activation)
        dims = list(self.branch.dim_headlayers) + [self.out_dim]
        if self.branch.head_nn_type == "mlp":
            h = x
            for i, d in enumerate(dims):
                h = nn.Dense(d, name=f"dense_{i}")(h)
                if i < len(dims) - 1:
                    h = act(h)
            return h
        # mlp_per_node: stacked per-node-index parameters
        assert self.num_nodes is not None, "num_nodes required for mlp_per_node"
        K = self.num_nodes
        # node slot index within its graph (static graph size)
        slot = jnp.arange(x.shape[0], dtype=jnp.int32) % K
        h = x
        in_dim = x.shape[-1]
        for i, d in enumerate(dims):
            w = self.param(
                f"w_{i}",
                nn.initializers.lecun_normal(),
                (K, in_dim, d),
            )
            b = self.param(f"b_{i}", nn.initializers.zeros, (K, d))
            h = jnp.einsum("nf,nfd->nd", h, w[slot]) + b[slot]
            if i < len(dims) - 1:
                h = act(h)
            in_dim = d
        return h


class HydraBase(nn.Module):
    """Encoder (conv stack) + multi-head decoders."""

    cfg: ArchConfig
    is_edge_model: bool = False

    # ------------------------------------------------------------------ hooks
    def get_conv(self, input_dim: int, output_dim: int, edge_dim=None,
                 last_layer: bool = False, name: Optional[str] = None, **extra):
        raise NotImplementedError

    def _conv_plan(self) -> List[Tuple[int, int, Dict[str, Any]]]:
        """(in_dim, out_dim, extra get_conv kwargs) per layer
        (ref: Base._init_conv:198-215; overridden by GATStack for head-concat
        dimension bookkeeping, ref: GATStack._init_conv:38)."""
        cfg = self.cfg
        plan = [(self.embed_dim, cfg.hidden_dim, {})]
        for _ in range(cfg.num_conv_layers - 1):
            plan.append((cfg.hidden_dim, cfg.hidden_dim, {}))
        return plan

    def _make_feature_layer(self, i: int):
        """Per-layer norm after each conv; BatchNorm by default
        (ref: Base._init_conv:206). SchNet/EGNN/PAINN-style stacks return
        None (the reference uses nn.Identity there, ref: SCFStack.py:74,
        EGCLStack.py:54)."""
        return MaskedBatchNorm(name=f"norm_{i}")

    @property
    def use_edge_attr(self) -> bool:
        return self.cfg.edge_dim is not None and self.cfg.edge_dim > 0

    @property
    def embed_dim(self) -> int:
        # GPS embeds everything to hidden_dim first (ref: Base.py:136-154)
        return self.cfg.hidden_dim if self.cfg.use_global_attn else self.cfg.input_dim

    @property
    def edge_embed_dim(self) -> Optional[int]:
        return self.cfg.hidden_dim if self.cfg.use_global_attn else self.cfg.edge_dim

    # ------------------------------------------------------------------ setup
    def setup(self):
        cfg = self.cfg
        self.activation_function = activation_function_selection(cfg.activation)

        # conv stack (ref: Base._init_conv:198-215)
        convs = []
        norms = []
        for i, (in_dim, out_dim, extra) in enumerate(self._conv_plan()):
            conv = self.get_conv(
                in_dim, out_dim, edge_dim=self.edge_embed_dim,
                name=f"conv_{i}", **extra,
            )
            if cfg.use_global_attn and cfg.global_attn_engine == "GPS":
                conv = GPSConv(
                    channels=cfg.hidden_dim,
                    conv=conv,
                    heads=cfg.global_attn_heads,
                    dropout=cfg.dropout,
                    attn_type=cfg.global_attn_type or "multihead",
                    name=f"gps_{i}",
                )
            convs.append(conv)
            norms.append(self._make_feature_layer(i))
        self.graph_convs = convs
        self.feature_layers = norms

        # GPS / encoding embeddings (ref: Base.py:160-172)
        if cfg.use_global_attn:
            self.pos_emb = nn.Dense(cfg.hidden_dim, use_bias=False)
            if cfg.input_dim:
                self.node_emb = nn.Dense(cfg.hidden_dim, use_bias=False)
                self.node_lin = nn.Dense(cfg.hidden_dim, use_bias=False)
            if self.is_edge_model:
                self.rel_pos_emb = nn.Dense(cfg.hidden_dim, use_bias=False)
                if self.use_edge_attr:
                    self.edge_emb = nn.Dense(cfg.hidden_dim, use_bias=False)
                    self.edge_lin = nn.Dense(cfg.hidden_dim, use_bias=False)

        # decoders (ref: Base._multihead:342-440)
        graph_shared = {}
        for b in cfg.graph_branches:
            graph_shared[b.type] = GraphSharedHead(
                b, cfg.activation, name=f"graph_shared_{b.type}"
            )
        self.graph_shared = graph_shared

        heads = []
        node_conv_built = False
        for ihead in range(cfg.num_heads):
            out_dim = cfg.output_dim[ihead] * (1 + cfg.var_output)
            head_by_branch = {}
            if cfg.output_type[ihead] == "graph":
                for b in cfg.graph_branches:
                    head_by_branch[b.type] = GraphHeadMLP(
                        b, out_dim, cfg.activation,
                        initial_bias=cfg.initial_bias,
                        name=f"head_{ihead}_{b.type}",
                    )
            else:
                for b in cfg.node_branches:
                    if b.head_nn_type == "conv":
                        head_by_branch[b.type] = self._make_node_conv_head(
                            b, out_dim, ihead
                        )
                    else:
                        head_by_branch[b.type] = MLPNode(
                            b, out_dim, cfg.activation,
                            num_nodes=cfg.num_nodes,
                            name=f"head_{ihead}_{b.type}",
                        )
            heads.append(head_by_branch)
        self.heads_NN = heads

    def _make_node_conv_head(self, b: BranchConfig, out_dim: int, ihead: int):
        """Conv-type node head: hidden convs + output conv, each followed by
        BatchNorm (ref: Base._init_node_conv:260-340)."""
        cfg = self.cfg
        dims = list(b.dim_headlayers)
        layers = []
        in_dim = cfg.hidden_dim
        for il in range(b.num_headlayers):
            conv = self.get_conv(
                in_dim, dims[il], last_layer=False,
                name=f"nodehead_{ihead}_{b.type}_conv_{il}",
            )
            norm = MaskedBatchNorm(name=f"nodehead_{ihead}_{b.type}_norm_{il}")
            layers.append((conv, norm))
            in_dim = dims[il]
        conv = self.get_conv(
            in_dim, out_dim, last_layer=True,
            name=f"nodehead_{ihead}_{b.type}_conv_out",
        )
        norm = MaskedBatchNorm(name=f"nodehead_{ihead}_{b.type}_norm_out")
        layers.append((conv, norm))
        return tuple(layers)

    # -------------------------------------------------------------- embedding
    def _embedding(
        self, batch: GraphBatch
    ) -> Tuple[jnp.ndarray, jnp.ndarray, EdgeContext]:
        """ref: Base._embedding:217-245. Subclasses override to add RBF /
        spherical harmonics / edge vectors."""
        ctx: EdgeContext = {}
        if self.use_edge_attr:
            assert batch.edge_attr is not None, (
                "Data must have edge attributes if use_edge_attributes is set."
            )
            ctx["edge_attr"] = batch.edge_attr
        if self.cfg.use_global_attn:
            x = self.pos_emb(batch.pe)
            if self.cfg.input_dim:
                x = jnp.concatenate([self.node_emb(batch.x), x], axis=1)
                x = self.node_lin(x)
            if self.is_edge_model:
                e = self.rel_pos_emb(batch.rel_pe)
                if self.use_edge_attr:
                    e = jnp.concatenate([self.edge_emb(ctx["edge_attr"]), e], axis=1)
                    e = self.edge_lin(e)
                ctx["edge_attr"] = e
            return x, batch.pos, ctx
        return batch.x, batch.pos, ctx

    # ---------------------------------------------------------------- forward
    def conv_stack(self, inv, equiv, batch: GraphBatch, ctx, train: bool = False):
        """The encoder conv loop (ref: Base.forward:451-466). Split out so
        pipeline parallelism can stage it across devices
        (parallel/pipeline_model.py)."""
        cfg = self.cfg
        for conv, norm in zip(self.graph_convs, self.feature_layers):
            if cfg.conv_checkpointing:
                # rematerialize each conv layer (ref: Base.py:459-465);
                # remat_policy "dots" keeps matmul outputs resident and
                # recomputes only elementwise ops in the backward pass
                import jax as _jax

                policies = {
                    "": None,
                    "dots": _jax.checkpoint_policies.dots_saveable,
                    "dots_no_batch":
                        _jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                }
                if cfg.remat_policy not in policies:
                    raise ValueError(
                        f"unknown remat_policy {cfg.remat_policy!r}; "
                        f"expected one of {sorted(policies)}"
                    )
                policy = policies[cfg.remat_policy]
                inv, equiv = nn.remat(
                    lambda mdl, a, b: mdl(a, b, batch, ctx, train=train),
                    policy=policy,
                )(conv, inv, equiv)
            else:
                inv, equiv = conv(inv, equiv, batch, ctx, train=train)
            if norm is not None:
                inv = norm(inv, batch.node_mask, use_running_average=not train)
            inv = self.activation_function(inv)
        return inv, equiv

    def decode(self, x, equiv, batch: GraphBatch, ctx, train: bool = False):
        """Readout + multi-head decoders (ref: Base.forward:473-566). Split
        out so pipeline parallelism can run heads after the staged conv
        stack (only head/shared params are touched)."""
        cfg = self.cfg
        num_graphs = batch.num_graphs
        x_graph = masked_segment_mean(
            x, batch.node_graph_idx, num_graphs, batch.node_mask
        )

        outputs: List[jnp.ndarray] = []
        outputs_var: List[jnp.ndarray] = []
        for ihead in range(cfg.num_heads):
            head_dim = cfg.output_dim[ihead]
            headloc = self.heads_NN[ihead]
            if cfg.output_type[ihead] == "graph":
                if cfg.num_branches == 1:
                    shared = self.graph_shared["branch-0"](x_graph)
                    out = headloc["branch-0"](shared)
                else:
                    # dense branch dispatch: compute all, select by dataset_id
                    out = jnp.zeros(
                        (num_graphs, head_dim * (1 + cfg.var_output)), x.dtype
                    )
                    for b in cfg.graph_branches:
                        bid = branch_index(b.type)
                        shared = self.graph_shared[b.type](x_graph)
                        o = headloc[b.type](shared)
                        sel = (batch.dataset_id == bid)[:, None]
                        out = jnp.where(sel, o, out)
                outputs.append(out[:, :head_dim])
                outputs_var.append(out[:, head_dim:] ** 2)
            else:
                if len(cfg.node_branches) <= 1:
                    out = self._apply_node_head(
                        headloc["branch-0"], x, equiv, batch, ctx, train
                    )
                else:
                    out = jnp.zeros(
                        (x.shape[0], head_dim * (1 + cfg.var_output)), x.dtype
                    )
                    node_ds = batch.dataset_id[batch.node_graph_idx]
                    for b in cfg.node_branches:
                        bid = branch_index(b.type)
                        o = self._apply_node_head(
                            headloc[b.type], x, equiv, batch, ctx, train
                        )
                        sel = (node_ds == bid)[:, None]
                        out = jnp.where(sel, o, out)
                outputs.append(out[:, :head_dim])
                outputs_var.append(out[:, head_dim:] ** 2)

        if cfg.var_output:
            return outputs, outputs_var
        return outputs

    def embed(self, batch: GraphBatch):
        """Public embedding hook for staged execution
        (parallel/pipeline_model.py)."""
        return self._embedding(batch)

    def embed_and_first_layer(self, batch: GraphBatch):
        """Embedding + conv layer 0 (the inhomogeneous input layer) — the
        replicated pipeline prologue (parallel/pipeline_model.py). Norms run
        in eval mode: pipeline stages do not update running statistics."""
        inv, equiv, ctx = self._embedding(batch)
        conv, norm = self.graph_convs[0], self.feature_layers[0]
        inv, equiv = conv(inv, equiv, batch, ctx, train=False)
        if norm is not None:
            inv = norm(inv, batch.node_mask, use_running_average=True)
        inv = self.activation_function(inv)
        return inv, equiv, ctx

    def __call__(self, batch: GraphBatch, train: bool = False):
        inv, equiv, ctx = self._embedding(batch)
        inv, equiv = self.conv_stack(inv, equiv, batch, ctx, train=train)
        return self.decode(inv, equiv, batch, ctx, train=train)

    def _apply_node_head(self, head, x, equiv, batch, ctx, train):
        if isinstance(head, tuple):  # conv-type head (list of (conv, norm))
            inv = x
            eq = equiv
            for conv, norm in head:
                inv, eq = conv(inv, eq, batch, ctx, train=train)
                inv = norm(inv, batch.node_mask, use_running_average=not train)
                inv = self.activation_function(inv)
            return inv
        return head(x, batch)
