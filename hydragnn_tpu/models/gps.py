"""GPS global attention block (GraphGPS-style), TPU-native.

Re-design of ``hydragnn/globalAtt/gps.py:32-159``: local MPNN + global
multi-head attention with residuals, three norms, and an FFN. The reference
densifies with ``to_dense_batch`` then runs torch MHA; here attention runs
directly over the padded node array with a per-graph block mask — one fused
masked attention over static shapes, no re-packing.

NOTE the reference never passes ``graph_batch`` from ``Base.forward`` so its
attention spans the whole mini-batch as a single sequence (ref: gps.py:107,126
— a known quirk). We implement *correct* per-graph masking; with batch_size=1
the two are identical (that is how parity vs the reference is verified).
``attn_type='multihead'`` is exact masked softmax attention;
``'performer'`` uses the FAVOR+ positive random-feature approximation
(ref: torch_geometric.nn.attention.PerformerAttention).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from hydragnn_tpu.graph import GraphBatch
from hydragnn_tpu.models.layers import MaskedBatchNorm, activation_function_selection


class MaskedGraphAttention(nn.Module):
    """Multi-head self-attention over nodes, masked to per-graph blocks.

    Equivalent to ``to_dense_batch`` + ``torch.nn.MultiheadAttention`` +
    re-flatten, without the dynamic reshape.
    """

    channels: int
    heads: int
    dropout: float = 0.0

    # above this node count, stream over key blocks (flash-style online
    # softmax) instead of materializing the [H, N, N] logits tensor
    flash_threshold: int = 2048
    key_block: int = 1024
    # set to the mesh axis name when running node-sharded inside shard_map:
    # key/value blocks ring-rotate over ICI (parallel/ring_attention.py) so
    # memory is O(N_local * block) per device. Dropout unsupported (as flash).
    ring_axis: Optional[str] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, batch: GraphBatch, train: bool = False
    ) -> jnp.ndarray:
        n = x.shape[0]
        head_dim = self.channels // self.heads
        qkv = nn.Dense(3 * self.channels, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(n, self.heads, head_dim)
        k = k.reshape(n, self.heads, head_dim)
        v = v.reshape(n, self.heads, head_dim)

        gi = batch.node_graph_idx
        valid = batch.node_mask
        scale = 1.0 / jnp.sqrt(jnp.asarray(head_dim, x.dtype))

        slot = batch.node_slot
        if self.ring_axis is not None:
            from hydragnn_tpu.parallel.ring_attention import (
                ring_masked_attention,
            )

            out = ring_masked_attention(
                q, k, v, gi, valid, self.ring_axis, 1.0 / head_dim**0.5
            )
        elif slot is not None and n % slot == 0:
            # slotted batch: graphs live in fixed S-row slots, so attention
            # factors into G independent [S, S] blocks — G-fold fewer logits
            # than the whole-batch [N, N] mask and a pure batched MXU matmul.
            # Cross-graph pairs cannot occur (each slot is one graph); only
            # padding rows inside a slot need masking.
            g_cnt = n // slot
            qg = q.reshape(g_cnt, slot, self.heads, head_dim)
            kg = k.reshape(g_cnt, slot, self.heads, head_dim)
            vg = v.reshape(g_cnt, slot, self.heads, head_dim)
            key_ok = valid.reshape(g_cnt, slot)
            logits = jnp.einsum("gqhd,gkhd->ghqk", qg, kg) * scale
            logits = jnp.where(
                key_ok[:, None, None, :], logits, jnp.finfo(x.dtype).min
            )
            attn = jax.nn.softmax(logits, axis=-1)
            if self.dropout > 0.0 and train:
                attn = nn.Dropout(rate=self.dropout,
                                  deterministic=not train)(attn)
            out = jnp.einsum("ghqk,gkhd->gqhd", attn, vg).reshape(
                n, self.heads, head_dim
            )
        elif n <= self.flash_threshold or n % self.key_block != 0:
            # dense path: per-graph block mask [n, n]
            same_graph = gi[:, None] == gi[None, :]
            mask = same_graph & valid[None, :]
            logits = jnp.einsum("qhd,khd->hqk", q, k) * scale
            logits = jnp.where(
                mask[None, :, :], logits, jnp.finfo(x.dtype).min
            )
            attn = jax.nn.softmax(logits, axis=-1)
            if self.dropout > 0.0 and train:
                attn = nn.Dropout(rate=self.dropout,
                                  deterministic=not train)(attn)
            out = jnp.einsum("hqk,khd->qhd", attn, v)
        else:
            # flash-style: stream key blocks with running max/denominator;
            # O(N * key_block) memory instead of O(N^2). (Dropout on attention
            # weights is not supported on this path.)
            kb = self.key_block
            ks = k.reshape(n // kb, kb, self.heads, head_dim)
            vs = v.reshape(n // kb, kb, self.heads, head_dim)
            gis = gi.reshape(n // kb, kb)
            vms = valid.reshape(n // kb, kb)
            neg = jnp.finfo(jnp.float32).min

            def body(carry, blk):
                m, l, acc = carry
                kb_, vb_, gib, vmb = blk
                s = jnp.einsum("qhd,khd->qhk", q, kb_) * scale
                ok = (gi[:, None] == gib[None, :]) & vmb[None, :]
                s = jnp.where(ok[:, None, :], s.astype(jnp.float32), neg)
                m_new = jnp.maximum(m, jnp.max(s, axis=-1))
                p = jnp.exp(s - m_new[..., None])
                corr = jnp.exp(m - m_new)
                l = l * corr + jnp.sum(p, axis=-1)
                acc = acc * corr[..., None] + jnp.einsum(
                    "qhk,khd->qhd", p.astype(x.dtype), vb_
                )
                return (m_new, l, acc), None

            m0 = jnp.full((n, self.heads), neg, jnp.float32)
            l0 = jnp.zeros((n, self.heads), jnp.float32)
            a0 = jnp.zeros((n, self.heads, head_dim), x.dtype)
            (m, l, acc), _ = jax.lax.scan(body, (m0, l0, a0),
                                          (ks, vs, gis, vms))
            out = acc / jnp.maximum(l, 1e-16)[..., None].astype(x.dtype)

        out = out.reshape(n, self.channels)
        out = nn.Dense(self.channels, name="out_proj")(out)
        # zero out padding rows (their softmax was over a garbage row)
        return out * valid[:, None].astype(out.dtype)


class PerformerAttention(nn.Module):
    """FAVOR+ linear attention (sub-quadratic global option; ref:
    torch_geometric.nn.attention.PerformerAttention used by gps.py:62-67).

    Positive orthogonal random features; segment-wise normalization keeps
    attention within each graph via segment sums over nodes.
    """

    channels: int
    heads: int
    num_features: int = 64

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, batch: GraphBatch, train: bool = False
    ) -> jnp.ndarray:
        from hydragnn_tpu.ops.segment import segment_sum

        n = x.shape[0]
        head_dim = self.channels // self.heads
        qkv = nn.Dense(3 * self.channels, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(n, self.heads, head_dim)
        k = k.reshape(n, self.heads, head_dim)
        v = v.reshape(n, self.heads, head_dim)

        proj = self.param(
            "proj",
            nn.initializers.normal(1.0),
            (self.heads, head_dim, self.num_features),
        )

        def phi(u):
            # positive softmax-kernel features
            un = u / (head_dim ** 0.25)
            f = jnp.einsum("nhd,hdf->nhf", un, proj)
            sq = jnp.sum(un * un, axis=-1, keepdims=True) / 2.0
            return jnp.exp(f - sq) / jnp.sqrt(jnp.asarray(self.num_features, u.dtype))

        qf = phi(q)
        kf = phi(k) * batch.node_mask[:, None, None].astype(x.dtype)
        G = batch.num_graphs
        gi = batch.node_graph_idx
        # per-graph kv moments
        kv = segment_sum(
            jnp.einsum("nhf,nhd->nhfd", kf, v), gi, G, indices_are_sorted=True
        )
        ksum = segment_sum(kf, gi, G, indices_are_sorted=True)
        num = jnp.einsum("nhf,nhfd->nhd", qf, kv[gi])
        den = jnp.maximum(jnp.einsum("nhf,nhf->nh", qf, ksum[gi]), 1e-8)
        out = (num / den[..., None]).reshape(n, self.channels)
        out = nn.Dense(self.channels, name="out_proj")(out)
        return out * batch.node_mask[:, None].astype(out.dtype)


class GPSConv(nn.Module):
    """ref: hydragnn/globalAtt/gps.py:103-152 forward structure."""

    channels: int
    conv: Optional[nn.Module]
    heads: int = 1
    dropout: float = 0.0
    attn_type: str = "multihead"
    act: str = "relu"

    @nn.compact
    def __call__(
        self,
        inv_node_feat: jnp.ndarray,
        equiv_node_feat: jnp.ndarray,
        batch: GraphBatch,
        ctx: Any,
        train: bool = False,
    ):
        act = activation_function_selection(self.act)
        hs = []
        if self.conv is not None:
            h, equiv_node_feat = self.conv(
                inv_node_feat, equiv_node_feat, batch, ctx, train=train
            )
            h = nn.Dropout(rate=self.dropout, deterministic=not train)(h)
            h = h + inv_node_feat
            h = MaskedBatchNorm(name="norm1")(
                h, batch.node_mask, use_running_average=not train
            )
            hs.append(h)

        if self.attn_type in ("multihead", "", None):
            attn = MaskedGraphAttention(
                self.channels, self.heads, self.dropout, name="attn"
            )
        elif self.attn_type == "performer":
            attn = PerformerAttention(self.channels, self.heads, name="attn")
        else:
            raise ValueError(f"{self.attn_type} is not supported")
        h = attn(inv_node_feat, batch, train=train)
        h = nn.Dropout(rate=self.dropout, deterministic=not train)(h)
        h = h + inv_node_feat
        h = MaskedBatchNorm(name="norm2")(
            h, batch.node_mask, use_running_average=not train
        )
        hs.append(h)

        out = sum(hs)
        mlp = nn.Sequential(
            [
                nn.Dense(self.channels * 2),
                act,
                nn.Dropout(rate=self.dropout, deterministic=not train),
                nn.Dense(self.channels),
                nn.Dropout(rate=self.dropout, deterministic=not train),
            ]
        )
        out = out + mlp(out)
        out = MaskedBatchNorm(name="norm3")(
            out, batch.node_mask, use_running_average=not train
        )
        return out, equiv_node_feat
