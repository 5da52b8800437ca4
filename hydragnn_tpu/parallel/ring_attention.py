"""Ring attention over node-sharded graph batches (GPS global attention at
huge N — the TPU answer to SURVEY.md §5 "long-context" gap; the reference
densifies the whole batch and runs O(N^2) torch MHA, globalAtt/gps.py:126).

Each device holds an [N/D]-node block of q/k/v. Key/value blocks rotate
around the mesh axis via ``ppermute`` while every device maintains a running
online-softmax (max / denominator / weighted accumulator) over its resident
queries — the standard flash/ring decomposition:

    for step in 0..D-1:
        attend(q_local, k_blk, v_blk) -> update (m, l, acc)
        (k_blk, v_blk) <- ppermute(+1)

Memory is O(N/D * block) per device instead of O(N^2); the ppermute of the
next block rides ICI concurrently with the current block's matmuls (XLA
schedules the collective async). Per-graph masking uses each node's global
graph id, so attention never crosses graph boundaries regardless of how
graphs straddle device blocks.

Use inside ``shard_map`` with node arrays sharded on the mesh axis
(``MaskedGraphAttention(ring_axis=...)`` routes here, models/gps.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ring_masked_attention(
    q: jnp.ndarray,  # [n_local, H, Dh]
    k: jnp.ndarray,  # [n_local, H, Dh]
    v: jnp.ndarray,  # [n_local, H, Dh]
    graph_idx: jnp.ndarray,  # [n_local] GLOBAL graph ids
    valid: jnp.ndarray,  # [n_local] bool node mask
    axis: str,
    scale: float,
) -> jnp.ndarray:
    """Per-graph masked softmax attention with the key/value blocks ring-
    rotated over mesh ``axis``. Must run inside shard_map; returns the local
    [n_local, H, Dh] output. Exactly equal to dense masked attention."""
    n_local, heads, _ = q.shape
    D = jax.lax.axis_size(axis)
    neg = jnp.finfo(jnp.float32).min
    perm = [(i, (i + 1) % D) for i in range(D)]

    def attend(carry, blk):
        m, l, acc = carry
        kb, vb, gib, vmb = blk
        s = jnp.einsum("qhd,khd->qhk", q, kb) * scale
        ok = (graph_idx[:, None] == gib[None, :]) & vmb[None, :]
        s = jnp.where(ok[:, None, :], s.astype(jnp.float32), neg)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "qhk,khd->qhd", p.astype(v.dtype), vb
        ).astype(jnp.float32)
        return (m_new, l, acc)

    m = jnp.full((n_local, heads), neg, jnp.float32)
    l = jnp.zeros((n_local, heads), jnp.float32)
    acc = jnp.zeros(q.shape, jnp.float32)
    blk = (k, v, graph_idx, valid)
    carry = (m, l, acc)
    for step in range(D):
        carry = attend(carry, blk)
        if step < D - 1:
            blk = jax.lax.ppermute(blk, axis, perm)
    m, l, acc = carry
    out = acc / jnp.maximum(l, 1e-16)[..., None]
    return out.astype(q.dtype)
