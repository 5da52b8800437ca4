"""DimeNet++ stack (ref: hydragnn/models/DIMEStack.py:34-305).

Triplet-interaction model. Each conv layer = node lin -> edge embedding block
-> one InteractionPP block (directional message passing over triplets) ->
OutputPP block back to nodes. Bessel rbf per edge, spherical basis per
triplet.

TPU-first triplet construction: the reference builds variable-length triplet
lists with torch_sparse (ref: DIMEStack.triplets:232-257). Here triplets are
materialized with a static per-edge slot cap K = max_neighbours from the
sorted-receiver CSR (edges k->j for each edge j->i live in contiguous rows),
masked where invalid — static shapes, no host sync. Flattened row-major so
``idx_ji`` is sorted (fast segment reductions).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from hydragnn_tpu.graph import GraphBatch
from hydragnn_tpu.models.base import HydraBase
from hydragnn_tpu.models.pnaplus import BesselBasisLayer
from hydragnn_tpu.ops.geometry import get_edge_vectors_and_lengths
from hydragnn_tpu.ops.segment import segment_sum
from hydragnn_tpu.ops.spherical import angular_basis, spherical_radial


class Triplets(NamedTuple):
    idx_kj: jnp.ndarray  # [T] edge id of k->j
    idx_ji: jnp.ndarray  # [T] edge id of j->i (sorted ascending)
    mask: jnp.ndarray  # [T] valid triplet
    # E-scale slot machinery (None for hand-built Triplets): per-edge data
    # gathered to triplet scale routes as edge -> [N, K] node slot table ->
    # one WIDE row gather by senders, instead of a [T]-row narrow gather
    # (T = E*K = 2.1M at the GFM shape; narrow T-scale gathers were the
    # 0.017-MFU bottleneck of round 4)
    slot_flat: Optional[jnp.ndarray] = None  # [N*K] edge id of slot (j, k)
    back_idx: Optional[jnp.ndarray] = None  # [E] slot row owning edge e
    back_valid: Optional[jnp.ndarray] = None  # [E] edge has a slot
    senders: Optional[jnp.ndarray] = None  # [E] batch.senders
    send_perm: Optional[jnp.ndarray] = None  # edge_perm_by_sender


def build_triplets(batch: GraphBatch, max_neighbours: int) -> Triplets:
    """Static-shape triplets (k->j->i) from receiver-sorted edges."""
    E = batch.num_edges
    N = batch.num_nodes
    K = max_neighbours
    recv = batch.receivers
    send = batch.senders
    node_ids = jnp.arange(N + 1, dtype=jnp.int32)
    row_ptr = jnp.searchsorted(recv, node_ids, side="left").astype(jnp.int32)
    slots = jnp.arange(K, dtype=jnp.int32)
    # node-level slot table: slot (j, k) = k-th incoming edge of node j
    node_base = row_ptr[:N]
    node_cnt = row_ptr[1:] - node_base
    slot_edge = jnp.minimum(
        node_base[:, None] + slots[None, :], E - 1
    )  # [N, K]
    slot_valid = slots[None, :] < node_cnt[:, None]
    send_slot = send[slot_edge.reshape(-1)].reshape(N, K)
    emask_slot = batch.edge_mask[slot_edge.reshape(-1)].reshape(N, K)
    # per-edge views are E-scale row gathers of the [N, K] tables
    idx_kj = jnp.where(slot_valid, slot_edge, E - 1)[send]  # [E, K]
    valid = slot_valid[send]
    k_nodes = send_slot[send]
    mask = (
        valid
        & (k_nodes != recv[:, None])  # remove i == k triplets
        & batch.edge_mask[:, None]
        & emask_slot[send]
    )
    idx_ji = jnp.broadcast_to(
        jnp.arange(E, dtype=jnp.int32)[:, None], (E, K)
    )
    # backward map: edge e IS slot (recv[e], e - row_ptr[recv[e]])
    back_slot = jnp.arange(E, dtype=jnp.int32) - row_ptr[recv]
    back_valid = (back_slot >= 0) & (back_slot < K)
    back_idx = recv * K + jnp.clip(back_slot, 0, K - 1)
    return Triplets(
        idx_kj=idx_kj.reshape(-1), idx_ji=idx_ji.reshape(-1),
        mask=mask.reshape(-1),
        slot_flat=jnp.where(slot_valid, slot_edge, E - 1).reshape(-1),
        back_idx=back_idx, back_valid=back_valid,
        senders=send, send_perm=batch.edge_perm_by_sender,
    )


@jax.custom_vjp
def edge_to_slots(edge_arr, slot_flat, back_idx, back_valid):
    """``edge_arr[slot_flat]`` ([E, D] -> [N*K, D]) whose backward is a
    GATHER: the slot map is injective on valid slots (edge e occupies
    exactly slot (recv[e], e - row_ptr[recv[e]])), and clamp-duplicated
    invalid slots are always masked downstream (zero cotangent)."""
    return edge_arr[slot_flat]


def _ets_fwd(edge_arr, slot_flat, back_idx, back_valid):
    return edge_arr[slot_flat], (back_idx, back_valid)


def _ets_bwd(res, g):
    back_idx, back_valid = res
    d = jnp.where(back_valid[:, None], g[back_idx], 0.0).astype(g.dtype)
    return (d, None, None, None)


edge_to_slots.defvjp(_ets_fwd, _ets_bwd)


def slot_gather(edge_arr: jnp.ndarray, trip: Triplets) -> jnp.ndarray:
    """Per-triplet view of per-edge data: returns [E, K, D] equal to
    ``edge_arr[trip.idx_kj].reshape(E, K, D)`` via the E-scale slot path
    (one [N, K*D] table + one wide row gather by senders; the row gather's
    backward is the Pallas-backed sender aggregation of ops/spmm)."""
    from hydragnn_tpu.ops.spmm import gather_nodes

    E, D = edge_arr.shape
    NK = trip.slot_flat.shape[0]
    K = trip.idx_kj.shape[0] // E
    table = edge_to_slots(
        edge_arr, trip.slot_flat, trip.back_idx, trip.back_valid
    ).reshape(NK // K, K * D)
    out = gather_nodes(table, trip.senders, trip.send_perm)
    return out.reshape(E, K, D)


class ResidualLayer(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        h = jax.nn.silu(nn.Dense(self.dim)(x))
        h = jax.nn.silu(nn.Dense(self.dim)(h))
        return x + h


class InteractionPPBlock(nn.Module):
    """PyG InteractionPPBlock (directional message passing)."""

    hidden: int
    int_emb_size: int
    basis_emb_size: int
    num_spherical: int
    num_radial: int
    num_before_skip: int
    num_after_skip: int

    @nn.compact
    def __call__(self, x_edge, rbf, sbf, trip: Triplets):
        act = jax.nn.silu
        E = x_edge.shape[0]
        x_ji = act(nn.Dense(self.hidden, name="lin_ji")(x_edge))
        x_kj = act(nn.Dense(self.hidden, name="lin_kj")(x_edge))
        r = nn.Dense(self.basis_emb_size, use_bias=False, name="lin_rbf1")(rbf)
        r = nn.Dense(self.hidden, use_bias=False, name="lin_rbf2")(r)
        x_kj = x_kj * r
        x_kj = act(nn.Dense(self.int_emb_size, use_bias=False, name="lin_down")(x_kj))
        s = nn.Dense(self.basis_emb_size, use_bias=False, name="lin_sbf1")(sbf)
        s = nn.Dense(self.int_emb_size, use_bias=False, name="lin_sbf2")(s)
        if trip.slot_flat is not None:
            K = trip.idx_kj.shape[0] // E
            xg = slot_gather(x_kj, trip).reshape(E * K, -1)
        else:
            xg = x_kj[trip.idx_kj]
        t = xg * s
        t = t * trip.mask[:, None].astype(t.dtype)
        # triplets are [E, K] row-major (idx_ji = arange(E) repeated K), so
        # the per-edge reduction is a DENSE reshape-sum — no scatter at all
        # (XLA's sorted scatter for [E*K, int_emb] costs ~10 ms at the GFM
        # shape; this is one bandwidth pass)
        K = t.shape[0] // E
        x_kj = jnp.sum(t.reshape(E, K, -1), axis=1)
        x_kj = act(nn.Dense(self.hidden, use_bias=False, name="lin_up")(x_kj))

        h = x_ji + x_kj
        for i in range(self.num_before_skip):
            h = ResidualLayer(self.hidden, name=f"before_skip_{i}")(h)
        h = act(nn.Dense(self.hidden, name="lin")(h)) + x_edge
        for i in range(self.num_after_skip):
            h = ResidualLayer(self.hidden, name=f"after_skip_{i}")(h)
        return h


class OutputPPBlock(nn.Module):
    num_radial: int
    hidden: int
    out_emb: int
    out_channels: int
    num_layers: int = 1

    @nn.compact
    def __call__(self, x_edge, rbf, receivers, num_nodes, edge_mask,
                 receivers_sorted: bool = True):
        g = nn.Dense(self.hidden, use_bias=False, name="lin_rbf")(rbf)
        x = g * x_edge
        x = x * edge_mask[:, None].astype(x.dtype)
        x = segment_sum(x, receivers, num_nodes,
                        indices_are_sorted=receivers_sorted)
        x = nn.Dense(self.out_emb, use_bias=False, name="lin_up")(x)
        for i in range(self.num_layers):
            x = jax.nn.silu(nn.Dense(self.out_emb, name=f"lin_{i}")(x))
        return nn.Dense(self.out_channels, use_bias=False, name="lin_out")(x)


class DimeConv(nn.Module):
    in_dim: int
    out_dim: int
    hidden: int
    cfg_tuple: tuple  # (int_emb, basis_emb, out_emb, n_sph, n_rad, nbs, nas)
    edge_dim: Optional[int] = None

    @nn.compact
    def __call__(self, inv, equiv, batch: GraphBatch, ctx, train: bool = False):
        (int_emb, basis_emb, out_emb, n_sph, n_rad, nbs, nas) = self.cfg_tuple
        act = jax.nn.silu
        rbf = ctx["rbf"]
        sbf = ctx["sbf"]
        trip = ctx["triplets"]
        s, r = batch.senders, batch.receivers

        x = nn.Dense(self.hidden, name="lin")(inv)
        # embedding block (ref: HydraEmbeddingBlock:259-305); i=receivers,
        # j=senders per reference triplets() return (col, row)
        g = act(nn.Dense(self.hidden, name="emb_lin_rbf")(rbf))
        x_src, x_dst = batch.gather_src_dst(x)
        parts = [x_dst, x_src, g]
        e_attr = ctx.get("edge_attr")
        if self.edge_dim and e_attr is not None:
            parts.append(act(nn.Dense(self.hidden, name="emb_edge_lin")(e_attr)))
        x1 = act(
            nn.Dense(self.hidden, name="emb_lin")(jnp.concatenate(parts, -1))
        )
        x2 = InteractionPPBlock(
            self.hidden, int_emb, basis_emb, n_sph, n_rad, nbs, nas,
            name="interaction",
        )(x1, rbf, sbf, trip)
        out = OutputPPBlock(
            n_rad, self.hidden, out_emb, self.out_dim, name="output",
        )(x2, rbf, r, inv.shape[0], batch.edge_mask,
          receivers_sorted=batch.edges_receiver_sorted)
        return out, equiv


class DIMEStack(HydraBase):
    is_edge_model: bool = True

    def setup(self):
        self.rbf_layer = BesselBasisLayer(
            self.cfg.num_radial, self.cfg.radius, self.cfg.envelope_exponent,
            name="rbf",
        )
        super().setup()

    def get_conv(self, input_dim, output_dim, edge_dim=None, last_layer=False,
                 name=None):
        cfg = self.cfg
        hidden = output_dim if input_dim == 1 else input_dim
        assert hidden > 1, (
            "DimeNet requires more than one hidden dimension between "
            "input_dim and output_dim."
        )
        return DimeConv(
            input_dim, output_dim, hidden,
            (cfg.int_emb_size, cfg.basis_emb_size, cfg.out_emb_size,
             cfg.num_spherical, cfg.num_radial, cfg.num_before_skip,
             cfg.num_after_skip),
            edge_dim=edge_dim,
            name=name,
        )

    def _make_feature_layer(self, i):
        return None  # Identity (ref: DIMEStack._init_conv:87)

    def _embedding(self, batch: GraphBatch):
        """ref: DIMEStack._embedding:162-230 — triplets, angles, rbf, sbf."""
        inv, equiv, ctx = super()._embedding(batch)
        cfg = self.cfg
        trip = build_triplets(batch, cfg.max_neighbours or 16)
        E = batch.num_edges
        K = trip.idx_kj.shape[0] // E
        edge_vec, edge_dist = get_edge_vectors_and_lengths(
            batch.pos, batch.senders, batch.receivers, batch.edge_shifts,
            edge_mask=batch.edge_mask,
        )
        # angle between edge ji and (composed) ki (ref: :173-182).
        # idx_ji repeats each edge K times -> a broadcast, not a gather;
        # idx_kj routes through the E-scale slot tables (slot_gather)
        pos_ji = jnp.broadcast_to(
            edge_vec[:, None, :], (E, K, 3)
        ).reshape(-1, 3)
        pos_kj = slot_gather(edge_vec, trip).reshape(-1, 3)
        pos_ki = pos_kj + pos_ji
        a = jnp.sum(pos_ji * pos_ki, axis=-1)
        cr = jnp.cross(pos_ji, pos_ki)
        b = jnp.sqrt(jnp.sum(cr * cr, axis=-1) + 1e-24)
        angle = jnp.arctan2(b, a)

        d = edge_dist[:, 0]
        ctx["rbf"] = self.rbf_layer(d)
        # sbf = radial(edge)[triplet's k->j edge] * angular(triplet): the
        # radial factor also rides the slot tables instead of a [T]-row
        # gather (ops/spherical.spherical_basis docstring)
        rad = spherical_radial(
            d, cfg.num_spherical, cfg.num_radial, cfg.radius,
            cfg.envelope_exponent,
        ).reshape(E, -1)  # [E, S*R]
        rad_trip = slot_gather(rad, trip).reshape(
            E * K, cfg.num_spherical, cfg.num_radial
        )
        cbf = angular_basis(angle, cfg.num_spherical)  # [T, S]
        ctx["sbf"] = (rad_trip * cbf[:, :, None]).reshape(
            E * K, cfg.num_spherical * cfg.num_radial
        )
        ctx["triplets"] = trip
        return inv, equiv, ctx
