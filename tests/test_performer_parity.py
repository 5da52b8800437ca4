"""FAVOR+ Performer attention vs exact softmax attention at long length.

The Performer path (models/gps.py PerformerAttention; ref:
torch_geometric.nn.attention.PerformerAttention used by the reference's
globalAtt/gps.py) is a Monte-Carlo estimator of softmax attention, so
"parity" here is statistical: with the SAME q/k/v/out projections, the
FAVOR+ output must converge to the exact masked softmax attention as the
number of random features grows, including on a long (n=512) single-graph
sequence where the sub-quadratic path is actually the point.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hydragnn_tpu.graph import GraphSample, collate
from hydragnn_tpu.models.gps import PerformerAttention

CHANNELS, HEADS = 32, 4
HEAD_DIM = CHANNELS // HEADS


def _long_batch(n=512, n_graphs=1, scale=0.3, seed=0):
    rng = np.random.RandomState(seed)
    samples = []
    for _ in range(n_graphs):
        samples.append(
            GraphSample(
                x=(scale * rng.randn(n, CHANNELS)).astype(np.float32),
                pos=rng.randn(n, 3).astype(np.float32),
                # attention ignores edges; one self-loop keeps collate happy
                edge_index=np.stack(
                    [np.arange(n, dtype=np.int64),
                     np.arange(n, dtype=np.int64)]
                ),
                y_graph=rng.randn(1).astype(np.float32),
            )
        )
    return collate(samples)


def _exact_attention(params, x, batch):
    """Exact per-graph masked softmax attention using the Performer
    module's own qkv / out_proj weights (its MC target)."""
    p = params["params"]
    n = x.shape[0]
    qkv = x @ p["qkv"]["kernel"] + p["qkv"]["bias"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(n, HEADS, HEAD_DIM)
    k = k.reshape(n, HEADS, HEAD_DIM)
    v = v.reshape(n, HEADS, HEAD_DIM)
    logits = jnp.einsum("nhd,mhd->hnm", q, k) / np.sqrt(HEAD_DIM)
    same_graph = (
        batch.node_graph_idx[:, None] == batch.node_graph_idx[None, :]
    )
    mask = same_graph & batch.node_mask[None, :]
    logits = jnp.where(mask[None], logits, -1e30)
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("hnm,mhd->nhd", attn, v).reshape(n, CHANNELS)
    out = out @ p["out_proj"]["kernel"] + p["out_proj"]["bias"]
    return out * batch.node_mask[:, None]


def _rel_err(num_features, seed, n=512, n_graphs=1):
    batch = _long_batch(n=n, n_graphs=n_graphs, seed=seed)
    x = jnp.asarray(batch.x)
    mod = PerformerAttention(CHANNELS, HEADS, num_features=num_features)
    params = mod.init(jax.random.PRNGKey(seed), x, batch)
    got = mod.apply(params, x, batch)
    want = _exact_attention(params, x, batch)
    m = np.asarray(batch.node_mask, bool)
    g, w = np.asarray(got)[m], np.asarray(want)[m]
    return float(np.linalg.norm(g - w) / np.linalg.norm(w))


def test_performer_converges_to_exact_long_sequence():
    # n=512 single graph: the quadratic exact path is the oracle.
    # Measured seed-mean rel err: m=16 0.53, m=512 0.10, m=2048 0.063 —
    # the expected ~1/sqrt(m) Monte-Carlo rate.
    err = np.mean([_rel_err(num_features=2048, seed=s) for s in range(3)])
    assert err < 0.12, f"FAVOR+ (m=2048) rel err {err:.3f} vs exact"


def test_performer_error_shrinks_with_features():
    errs = [np.mean([_rel_err(m, seed=s) for s in range(3)])
            for m in (16, 64, 512)]
    assert errs[2] < errs[1] < errs[0], f"non-monotone MC error {errs}"
    # ~1/sqrt(m): 32x more features should cut error well over 2x
    assert errs[2] < errs[0] / 2.5, f"no 1/sqrt(m) decay: {errs}"


def test_performer_respects_graph_boundaries():
    """Per-graph normalization: node outputs must not change when an
    unrelated graph in the batch changes."""
    b2 = _long_batch(n=128, n_graphs=2, seed=1)
    x2 = jnp.asarray(b2.x)
    mod = PerformerAttention(CHANNELS, HEADS, num_features=64)
    params = mod.init(jax.random.PRNGKey(0), x2, b2)
    out_joint = np.asarray(mod.apply(params, x2, b2))

    # perturb graph 1's features; graph 0 rows must be bit-identical
    gi = np.asarray(b2.node_graph_idx)
    x_pert = np.asarray(x2).copy()
    x_pert[gi == 1] += 1.0
    out_pert = np.asarray(mod.apply(params, jnp.asarray(x_pert), b2))
    rows0 = (gi == 0) & np.asarray(b2.node_mask, bool)
    np.testing.assert_array_equal(out_joint[rows0], out_pert[rows0])
