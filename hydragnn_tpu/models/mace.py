"""MACE stack (ref: hydragnn/models/MACEStack.py:75-546 +
hydragnn/utils/model/mace_utils/modules/blocks.py).

Higher-order equivariant message passing:
  embedding: one-hot(Z) -> scalar node feats; spherical-harmonic edge attrs
  (component norm); Bessel radial embedding x polynomial cutoff.
  per layer: RealAgnosticAttResidual interaction (uvu tensor-product conv with
  per-edge weights from an MLP on [rbf, down(h)_src, down(h)_dst]) ->
  equivariant product basis (n-body symmetric contraction, per-element
  weights) with residual -> per-layer multihead decoder; decoder outputs are
  SUMMED across layers (n-body expansion, ref: MACEStack.forward:365-400).

e3nn replacement: hydragnn_tpu.ops.irreps (natural parity, Gaunt couplings).
The product basis is re-parametrized as iterated CG products with independent
per-element path weights — it spans the same equivariant function space as
MACE's U-matrix symmetric contraction (weights are not interchangeable with
the reference; capabilities and equivariance are).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from hydragnn_tpu.graph import GraphBatch
from hydragnn_tpu.models.arch import BranchConfig
from hydragnn_tpu.models.base import HydraBase, MLPNode, branch_index
from hydragnn_tpu.models.layers import MLP, activation_function_selection
from hydragnn_tpu.ops.geometry import get_edge_vectors_and_lengths
from hydragnn_tpu.ops.irreps import (
    Irreps,
    coupling,
    merge_flat,
    spherical_harmonics,
    split_flat,
    tp_instructions,
)
from hydragnn_tpu.ops.radial import (
    chebyshev_basis,
    gaussian_basis_mace,
    mace_bessel_basis,
    polynomial_cutoff,
)
from hydragnn_tpu.ops.segment import segment_mean, segment_sum

NUM_ELEMENTS = 118


class IrrepsLinear(nn.Module):
    """o3.Linear equivalent: per-l channel mixing, 1/sqrt(mul_in) norm."""

    irreps_in: Irreps
    irreps_out: Irreps
    use_bias: bool = False  # e3nn Linear has biases only on scalars

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        xs = split_flat(x, self.irreps_in)
        outs = []
        for oi, (mul_out, l_out) in enumerate(self.irreps_out.items):
            acc = None
            n_in = 0
            for (mul_in, l_in), xp in zip(self.irreps_in.items, xs):
                if l_in != l_out:
                    continue
                w = self.param(
                    f"w_{oi}_{n_in}",
                    nn.initializers.normal(1.0),
                    (mul_in, mul_out),
                )
                y = jnp.einsum("...ui,uv->...vi", xp, w) / math.sqrt(mul_in)
                acc = y if acc is None else acc + y
                n_in += 1
            if acc is None:
                acc = jnp.zeros(
                    x.shape[:-1] + (mul_out, 2 * l_out + 1), x.dtype
                )
            elif n_in > 1:
                acc = acc / math.sqrt(n_in)
            if l_out == 0 and self.use_bias:
                b = self.param(f"b_{oi}", nn.initializers.zeros, (mul_out,))
                acc = acc + b[..., :, None]
            outs.append(acc)
        return merge_flat(outs)


class TensorProductConv(nn.Module):
    """uvu TensorProduct with external per-edge weights (e3nn
    o3.TensorProduct(shared_weights=False); ref: blocks.py:301-311)."""

    irreps1: Irreps  # node features (gathered to edges)
    irreps2: Irreps  # edge attrs (sh [+ scalar edge features])
    target: Irreps

    def setup(self):
        self.irreps_mid, self.instructions = tp_instructions(
            self.irreps1, self.irreps2, self.target
        )
        self.weight_numel = sum(
            self.irreps1.items[i1][0] for (i1, _, _) in self.instructions
        )

    def __call__(
        self, x: jnp.ndarray, y: jnp.ndarray, weights: jnp.ndarray
    ) -> jnp.ndarray:
        xs = split_flat(x, self.irreps1)
        ys = split_flat(y, self.irreps2)
        outs = []
        w_off = 0
        for (i1, i2, io) in self.instructions:
            mul1, l1 = self.irreps1.items[i1]
            _, l2 = self.irreps2.items[i2]
            _, l3 = self.irreps_mid.items[io]
            C = np.asarray(coupling(l1, l2, l3))  # [a, b, c] host constant
            w = weights[..., w_off : w_off + mul1]
            w_off += mul1
            # y has mul 1 (sh) or scalars; take channel 0 per irrep2 slot
            yp = ys[i2][..., 0, :]  # [..., 2l2+1]
            # decomposed contraction (round 5: the 4-operand einsum made
            # XLA materialize [E, u, a, b]-sized intermediates): the tiny
            # per-edge yc[.., a, c] = y @ C first, then an unrolled sum of
            # rank-1 broadcasts over a (<= 2l1+1 terms, CG-sparsity
            # skipped). An a-outer 2-D relayout variant measured slightly
            # WORSE (168.6 vs 162.6 ms at the CI shape) — XLA already
            # fuses this chain acceptably.
            na, nc = C.shape[0], C.shape[2]
            Cb = jnp.asarray(
                C.transpose(1, 0, 2).reshape(C.shape[1], -1), x.dtype
            )  # [b, a*c]
            yc = (yp @ Cb).reshape(yp.shape[:-1] + (na, nc))  # [..., a, c]
            xw = xs[i1] * w[..., None]  # [..., u, a]
            out = sum(
                xw[..., a][..., None] * yc[..., a, None, :]
                for a in range(na)
                if np.any(C[a])
            )  # [..., u, c]
            outs.append(out)
        return merge_flat(outs)


class InteractionBlock(nn.Module):
    """RealAgnosticAttResidualInteractionBlock (ref: blocks.py:286-385)."""

    node_feats_irreps: Irreps
    edge_attrs_irreps: Irreps
    num_edge_feats: int  # Bessel basis size (+ 0; scalars)
    target_irreps: Irreps
    hidden_irreps: Irreps
    avg_num_neighbors: float

    @nn.compact
    def __call__(self, node_feats, batch: GraphBatch, edge_attrs, edge_feats):
        s, r = batch.senders, batch.receivers
        n_sc = self.hidden_irreps.count_l(0)
        down_irreps = Irreps.scalars(n_sc)

        sc = IrrepsLinear(
            self.node_feats_irreps, self.hidden_irreps, name="skip_linear"
        )(node_feats)
        h_up = IrrepsLinear(
            self.node_feats_irreps, self.node_feats_irreps, name="linear_up"
        )(node_feats)
        h_down = IrrepsLinear(
            self.node_feats_irreps, down_irreps, name="linear_down"
        )(node_feats)

        tp = TensorProductConv(
            self.node_feats_irreps, self.edge_attrs_irreps, self.target_irreps,
            name="conv_tp",
        )
        hd_src, hd_dst = batch.gather_src_dst(h_down)
        aug = jnp.concatenate([edge_feats, hd_src, hd_dst], axis=-1)
        tp_w = MLP(
            [n_sc, n_sc, n_sc, tp.weight_numel],
            activation=jax.nn.silu,
            activate_final=False,
        )(aug)
        mji = tp(batch.gather_src(h_up), edge_attrs, tp_w)
        mji = mji * batch.edge_mask[:, None].astype(mji.dtype)
        message = segment_sum(mji, r, node_feats.shape[0],
                              indices_are_sorted=batch.edges_receiver_sorted)
        message = IrrepsLinear(
            tp.irreps_mid.simplify(), self.target_irreps, name="linear"
        )(message) / self.avg_num_neighbors
        return message, sc


def symmetric_product_paths(
    input_ls: List[int], target_ls: List[int], correlation: int
) -> Dict[int, List[Tuple]]:
    """Enumerate the left-associated iterated-CG coupling trees of the
    n-body product basis: paths ((l_a (x) l_b -> l_ab) (x) l_c -> ...).

    For identical inputs (x (x) x (x) ...), a fixed parenthesization with
    ALL admissible intermediate l spans the full space of equivariant maps
    on the tensor power — a superset of e3nn's U-matrix symmetric
    contraction span (symmetric tensors are a subspace of the tensor
    power), which is what the reference's SymmetricContraction
    parametrizes (ref: symmetric_contraction.py:29-238, tools/cg.py:94).
    Verified numerically in tests/test_mace_oracle.py (span fit).

    Intermediate l after coupling k of n is capped at
    ``max(target) + (n - k - 1) * max(input)`` — larger intermediates
    cannot reach any target through the remaining couplings. Couplings of
    BOTH parities are enumerated (odd-l1+l2+l3 tensors couple through
    parity-flipped intermediates, matching e3nn's unfiltered
    ``ir_left * ir`` product in the reference U-matrix builder); a path
    contributes to target l only when its leaf parity
    ``(-1)^(sum of leaf l)`` equals the target's SH parity ``(-1)^l``.
    Returns {target_l: [path, ...]} with path = ((l1, l2, l12),
    (l12, l3, l123), ...) or ((l,),) for the order-1 identity.
    """
    lmax_in = max(input_ls)
    lmax_t = max(target_ls)
    paths: Dict[int, List[Tuple]] = {l: [] for l in target_ls}
    for l in target_ls:
        if l in input_ls:
            paths[l].append(((l,),))
    # frontier: (current_l, leaf_l_sum, coupling-steps tuple); dedupe the
    # first pair (l1, l2) order since x (x) x is symmetric in it
    frontier = [(l, l, ((l,),)) for l in input_ls]
    for order in range(2, correlation + 1):
        remaining = correlation - order  # couplings still to come
        cap = lmax_t + remaining * lmax_in
        nxt = []
        for l1, leafsum, steps in frontier:
            for l2 in input_ls:
                if order == 2 and l2 < l1:
                    continue  # (l1,l2) ~ (l2,l1) on identical inputs
                for l3 in range(abs(l1 - l2), min(l1 + l2, cap) + 1):
                    if (
                        order == 2
                        and l1 == l2
                        and (l1 + l2 + l3) % 2 == 1
                    ):
                        # antisymmetric coupling of an irrep with itself
                        # vanishes identically on x (x) x
                        continue
                    step = steps + ((l1, l2, l3),) if order > 2 else (
                        ((l1 if l1 <= l2 else l2,
                          l2 if l1 <= l2 else l1, l3),)
                    )
                    nxt.append((l3, leafsum + l2, step))
                    if l3 in paths and (leafsum + l2 + l3) % 2 == 0:
                        paths[l3].append(step)
        frontier = nxt
    return paths


def _apply_path(path, xs, dtype):
    """Evaluate one coupling tree on per-l features xs[l] = [N, F, 2l+1]."""
    from hydragnn_tpu.ops.irreps import coupling_w3j

    if len(path[0]) == 1:  # order-1 identity
        return xs[path[0][0]]
    first = path[0]
    cur = xs[first[0]]
    for (l1, l2, l3) in path:
        C = jnp.asarray(coupling_w3j(l1, l2, l3), dtype)
        cur = jnp.einsum("abc,nfa,nfb->nfc", C, cur, xs[l2])
    return cur


class SymmetricProduct(nn.Module):
    """EquivariantProductBasisBlock equivalent (ref: blocks.py:166-204;
    symmetric_contraction.py:29-238): n-body products via iterated CG with
    independent per-element, per-path, per-channel weights. The path basis
    (left-associated trees, all admissible intermediates) spans a superset
    of e3nn's U-matrix symmetric-contraction span — verified numerically in
    tests/test_mace_oracle.py."""

    irreps_in: Irreps  # F x (each sh l)
    target: Irreps  # F x (l <= node_max_ell)
    correlation: int
    num_elements: int = NUM_ELEMENTS
    use_sc: bool = True

    @nn.compact
    def __call__(self, node_feats, node_onehot, sc):
        F = self.irreps_in.items[0][0]
        xs = {l: p for (mul, l), p in zip(
            self.irreps_in.items, split_flat(node_feats, self.irreps_in)
        )}
        target_ls = sorted({l for _, l in self.target.items})
        input_ls = sorted(xs)

        path_map = symmetric_product_paths(
            input_ls, target_ls, self.correlation
        )
        contribs = {
            l: [
                _apply_path(p, xs, node_feats.dtype)
                for p in path_map[l]
            ]
            for l in target_ls
        }

        # per-element weighted mix of all contributions per target l
        outs = []
        for oi, (mul_out, l) in enumerate(self.target.items):
            terms = contribs[l]
            if not terms:
                outs.append(
                    jnp.zeros(
                        node_feats.shape[:-1] + (mul_out, 2 * l + 1),
                        node_feats.dtype,
                    )
                )
                continue
            stacked = jnp.stack(terms, axis=-3)  # [N, P, F, 2l+1]
            w = self.param(
                f"w_{oi}",
                nn.initializers.normal(1.0 / math.sqrt(len(terms))),
                (self.num_elements, len(terms), F),
            )
            wn = jnp.einsum("ne,epf->npf", node_onehot, w)
            outs.append(jnp.einsum("npfc,npf->nfc", stacked, wn))
        out = merge_flat(outs)
        out = IrrepsLinear(self.target, self.target, name="linear")(out)
        if self.use_sc and sc is not None:
            out = out + sc
        return out


class MultiheadDecoderBlock(nn.Module):
    """Linear/NonLinear per-layer decoder (ref: blocks.py:417-916). Graph
    heads read pooled scalars; node heads reduce irreps to scalars first."""

    input_irreps: Irreps
    cfg: "ArchConfig"  # noqa: F821
    nonlinear: bool

    @nn.compact
    def __call__(self, node_feats, batch: GraphBatch):
        cfg = self.cfg
        n_scalar = self.input_irreps.count_l(0)
        scalars = node_feats[:, :n_scalar]
        num_graphs = batch.num_graphs
        x_graph = segment_mean(
            scalars, batch.node_graph_idx, num_graphs, mask=batch.node_mask
        )
        act = activation_function_selection(cfg.activation)
        outputs = []
        for ihead in range(cfg.num_heads):
            head_dim = cfg.output_dim[ihead]
            if cfg.output_type[ihead] == "graph":
                branches = cfg.graph_branches or (BranchConfig("branch-0"),)
                out = None
                for b in branches:
                    if self.nonlinear:
                        dims = [b.dim_sharedlayers] * b.num_sharedlayers + list(
                            b.dim_headlayers[: b.num_headlayers]
                        )
                        h = MLP(dims, activation=act, activate_final=True,
                                name=f"g{ihead}_{b.type}_mlp")(x_graph)
                        o = nn.Dense(head_dim, name=f"g{ihead}_{b.type}_out")(h)
                    else:
                        o = nn.Dense(head_dim, name=f"g{ihead}_{b.type}_lin")(
                            x_graph
                        )
                    if len(branches) == 1:
                        out = o
                    else:
                        sel = (batch.dataset_id == branch_index(b.type))[:, None]
                        out = o * 0 if out is None else out
                        out = jnp.where(sel, o, out)
                outputs.append(out)
            else:
                branches = cfg.node_branches or (BranchConfig("branch-0"),)
                node_ds = batch.dataset_id[batch.node_graph_idx]
                out = None
                for b in branches:
                    # first reduce full irreps to scalars (o3.Linear role)
                    h = IrrepsLinear(
                        self.input_irreps, Irreps.scalars(n_scalar),
                        name=f"n{ihead}_{b.type}_irreps_lin",
                    )(node_feats)
                    if self.nonlinear:
                        o = MLPNode(
                            b, head_dim, cfg.activation, num_nodes=cfg.num_nodes,
                            name=f"n{ihead}_{b.type}_mlp",
                        )(h, batch)
                    else:
                        o = nn.Dense(head_dim, name=f"n{ihead}_{b.type}_lin")(h)
                    if len(branches) == 1:
                        out = o
                    else:
                        sel = (node_ds == branch_index(b.type))[:, None]
                        out = o * 0 if out is None else out
                        out = jnp.where(sel, o, out)
                outputs.append(out)
        return outputs


class MaceConv(nn.Module):
    """One MACE layer: interaction + product basis (ref: MACEStack.get_conv)."""

    node_feats_irreps: Irreps
    edge_attrs_irreps: Irreps
    num_edge_feats: int
    interaction_irreps: Irreps
    hidden_irreps: Irreps
    output_irreps: Irreps
    avg_num_neighbors: float
    correlation: int

    @nn.compact
    def __call__(self, node_feats, batch, edge_attrs, edge_feats, node_onehot):
        message, sc = InteractionBlock(
            self.node_feats_irreps, self.edge_attrs_irreps,
            self.num_edge_feats, self.interaction_irreps, self.hidden_irreps,
            self.avg_num_neighbors, name="interaction",
        )(node_feats, batch, edge_attrs, edge_feats)
        out = SymmetricProduct(
            self.interaction_irreps, self.hidden_irreps, self.correlation,
            use_sc=True, name="product",
        )(message, node_onehot, sc)
        out = IrrepsLinear(
            self.hidden_irreps, self.output_irreps, name="sizing"
        )(out)
        return out


class MaceConvSplit(nn.Module):
    """Adapts MaceConv to the (inv, equiv) conv interface so the GPS wrapper
    applies (ref: MACEStack uses _apply_global_attn around each conv;
    CombineBlock/SplitBlock, MACEStack.get_conv:300-364)."""

    conv: MaceConv
    n_scalar: int

    @nn.compact
    def __call__(self, inv, equiv, batch: GraphBatch, ctx, train: bool = False):
        node_feats = (
            jnp.concatenate([inv, equiv], axis=-1) if equiv.shape[-1] else inv
        )
        h = self.conv(
            node_feats, batch, ctx["edge_attrs"], ctx["edge_feats"],
            ctx["node_onehot"],
        )
        return h[:, : self.n_scalar], h[:, self.n_scalar :]


def process_node_attributes(x: jnp.ndarray, num_elements: int = NUM_ELEMENTS):
    """Atomic numbers -> one-hot (ref: MACEStack.process_node_attributes:483)."""
    z = jnp.clip(jnp.round(x[:, 0]).astype(jnp.int32), 1, num_elements)
    return jax.nn.one_hot(z - 1, num_elements, dtype=jnp.float32)


class MACEStack(HydraBase):
    is_edge_model: bool = True

    def setup(self):
        cfg = self.cfg
        self.sh_irreps = Irreps.spherical(cfg.max_ell)
        self.hidden_irreps = Irreps.uniform(cfg.hidden_dim, cfg.node_max_ell)
        self.final_hidden_irreps = Irreps.scalars(cfg.hidden_dim)
        self.interaction_irreps = Irreps(
            tuple((cfg.hidden_dim, l) for l in range(cfg.max_ell + 1))
        )
        self.correlations = (
            list(cfg.correlation) if cfg.correlation else [2]
        ) * cfg.num_conv_layers
        self.node_embedding = IrrepsLinear(
            Irreps.scalars(NUM_ELEMENTS), Irreps.scalars(cfg.hidden_dim),
            name="node_embedding",
        )
        if cfg.use_global_attn:
            self.pos_emb = nn.Dense(cfg.hidden_dim, use_bias=False)
            self.node_lin = nn.Dense(cfg.hidden_dim, use_bias=False)
        if self.use_edge_attr:
            self.edge_attrs_irreps = (
                Irreps.scalars(cfg.edge_dim) + self.sh_irreps
            )
        else:
            self.edge_attrs_irreps = self.sh_irreps

        convs = []
        decoders = [
            MultiheadDecoderBlock(
                Irreps.scalars(NUM_ELEMENTS), cfg, nonlinear=False,
                name="decoder_0",
            )
        ]
        for i in range(cfg.num_conv_layers):
            first = i == 0
            last = i == cfg.num_conv_layers - 1
            in_irreps = (
                Irreps.scalars(cfg.hidden_dim) if first else self.hidden_irreps
            )
            hidden = (
                Irreps.scalars(cfg.hidden_dim) if last else self.hidden_irreps
            )
            mace_conv = MaceConv(
                node_feats_irreps=in_irreps,
                edge_attrs_irreps=self.edge_attrs_irreps,
                num_edge_feats=cfg.num_radial,
                interaction_irreps=self.interaction_irreps,
                hidden_irreps=hidden,
                output_irreps=hidden,
                avg_num_neighbors=float(cfg.avg_num_neighbors or 1.0),
                correlation=int(self.correlations[i]),
                name=f"conv_{i}",
            )
            conv = MaceConvSplit(
                mace_conv, hidden.count_l(0), name=f"convsplit_{i}"
            )
            if cfg.use_global_attn and cfg.global_attn_engine == "GPS":
                from hydragnn_tpu.models.gps import GPSConv

                conv = GPSConv(
                    channels=hidden.count_l(0),
                    conv=conv,
                    heads=cfg.global_attn_heads,
                    dropout=cfg.dropout,
                    attn_type=cfg.global_attn_type or "multihead",
                    name=f"gps_{i}",
                )
            convs.append(conv)
            decoders.append(
                MultiheadDecoderBlock(
                    hidden, cfg, nonlinear=last, name=f"decoder_{i + 1}",
                )
            )
        self.graph_convs = convs
        self.multihead_decoders = decoders

    def mace_prologue(self, batch: GraphBatch):
        """Pipeline prologue: embedding + decoder_0 + conv layer 0 + its
        decoder. Returns (inv, equiv, ctx, outputs) — the activation pytree
        the staged middle layers (1..L-2) carry, each adding its own
        decoder contribution (parallel/pipeline_model.make_pipelined_mace_loss)."""
        ctx, node_onehot, h = self._mace_context(batch)
        outputs = self.multihead_decoders[0](node_onehot, batch)
        inv, equiv = h, jnp.zeros((h.shape[0], 0), h.dtype)
        inv, equiv = self.graph_convs[0](inv, equiv, batch, ctx)
        out = self.multihead_decoders[1](
            jnp.concatenate([inv, equiv], axis=-1), batch
        )
        outputs = tuple(o + p for o, p in zip(outputs, out))
        return inv, equiv, ctx, outputs

    def mace_epilogue(self, inv, equiv, outputs, batch: GraphBatch, ctx):
        """Pipeline epilogue: the LAST conv layer (hidden -> scalars — not
        shape-homogeneous with the staged middle) + its decoder."""
        inv, equiv = self.graph_convs[-1](inv, equiv, batch, ctx)
        out = self.multihead_decoders[-1](
            jnp.concatenate([inv, equiv], axis=-1), batch
        )
        return [o + p for o, p in zip(outputs, out)]

    def _mace_context(self, batch: GraphBatch):
        cfg = self.cfg
        # center positions per graph (ref: MACEStack._embedding:413-418)
        mean_pos = segment_mean(
            batch.pos, batch.node_graph_idx, batch.num_graphs,
            mask=batch.node_mask,
        )
        pos = batch.pos - mean_pos[batch.node_graph_idx]
        edge_vec, edge_dist = get_edge_vectors_and_lengths(
            pos, batch.senders, batch.receivers, batch.edge_shifts,
            edge_mask=batch.edge_mask,
        )
        node_onehot = process_node_attributes(batch.x)
        node_feats = self.node_embedding(
            node_onehot.reshape(node_onehot.shape[0], NUM_ELEMENTS)
        )
        edge_attrs = spherical_harmonics(cfg.max_ell, edge_vec)
        if self.use_edge_attr and batch.edge_attr is not None:
            # prepend scalar edge attrs (ref: MACEStack:436-438); these enter
            # the TP as extra 0e channels
            edge_attrs = jnp.concatenate([batch.edge_attr, edge_attrs], -1)
        d = edge_dist[:, 0]
        rt = (cfg.radial_type or "bessel")
        if rt == "bessel":
            rbf = mace_bessel_basis(d, cfg.radius, cfg.num_radial)
        elif rt == "chebyshev":
            rbf = chebyshev_basis(d, cfg.radius, cfg.num_radial)
        elif rt == "gaussian":
            rbf = gaussian_basis_mace(d, cfg.radius, cfg.num_radial)
        else:
            raise ValueError(f"Unknown radial_type {rt}")
        p = cfg.envelope_exponent or 5
        edge_feats = rbf * polynomial_cutoff(d, cfg.radius, p)[:, None]

        h = self.node_embedding(node_onehot)
        # GPS path: blend positional encodings into the scalar features
        # (ref: MACEStack._embedding:449-470)
        if cfg.use_global_attn and batch.pe is not None:
            pe = self.pos_emb(batch.pe)
            h = self.node_lin(jnp.concatenate([h, pe], axis=-1))
        ctx = {
            "edge_attrs": edge_attrs,
            "edge_feats": edge_feats,
            "node_onehot": node_onehot,
        }
        return ctx, node_onehot, h

    def __call__(self, batch: GraphBatch, train: bool = False):
        cfg = self.cfg
        ctx, node_onehot, h = self._mace_context(batch)
        outputs = self.multihead_decoders[0](node_onehot, batch)
        inv, equiv = h, jnp.zeros((h.shape[0], 0), h.dtype)
        for i, (conv, dec) in enumerate(
            zip(self.graph_convs, self.multihead_decoders[1:])
        ):
            inv, equiv = conv(inv, equiv, batch, ctx, train=train)
            out = dec(jnp.concatenate([inv, equiv], axis=-1), batch)
            outputs = [o + p for o, p in zip(outputs, out)]
        if cfg.var_output:
            # GaussianNLL var path not defined for MACE in the reference either
            return outputs, [jnp.zeros_like(o) for o in outputs]
        return outputs
