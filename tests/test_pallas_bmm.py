"""Pallas block-diagonal bmm vs XLA einsum (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hydragnn_tpu.ops.pallas_bmm import bmm_blockdiag


@pytest.fixture(autouse=True)
def _interpret():
    from jax.experimental.pallas import tpu as pltpu

    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


@pytest.mark.parametrize("G,S,F", [(8, 16, 128), (6, 24, 256)])
def test_bmm_matches_einsum_fp32(G, S, F):
    rng = np.random.RandomState(0)
    A = (rng.rand(G, S, S) < 0.2).astype(np.float32) * rng.randint(
        1, 4, (G, S, S)
    )
    x = rng.randn(G, S, F).astype(np.float32)
    out = bmm_blockdiag(jnp.asarray(A), jnp.asarray(x))
    ref = np.einsum("gij,gjf->gif", A, x)
    rel = np.abs(np.asarray(out) - ref).max() / np.abs(ref).max()
    assert rel < 2e-6, rel


def test_bmm_matches_einsum_bf16():
    rng = np.random.RandomState(1)
    G, S, F = 8, 16, 128
    A = (rng.rand(G, S, S) < 0.2).astype(np.float32)
    x = rng.randn(G, S, F).astype(np.float32)
    out = bmm_blockdiag(
        jnp.asarray(A), jnp.asarray(x, jnp.bfloat16)
    )
    assert out.dtype == jnp.bfloat16
    ref = np.einsum("gij,gjf->gif", A, x)
    rel = np.abs(np.asarray(out, np.float32) - ref).max() / np.abs(ref).max()
    assert rel < 0.03


def test_adjacency_spmm_routes_and_matches():
    """segment.adjacency_spmm equals segment_sum on a slotted batch (the
    integration-level check; on CPU the XLA path runs, on TPU the Pallas
    kernel — both must satisfy this oracle)."""
    from hydragnn_tpu.graph import GraphSample, collate
    from hydragnn_tpu.ops.segment import adjacency_spmm, segment_sum

    rng = np.random.RandomState(2)
    samples = []
    for _ in range(5):
        n = rng.randint(6, 13)
        e = n * 3
        samples.append(GraphSample(
            x=rng.randn(n, 1).astype(np.float32),
            pos=rng.randn(n, 3).astype(np.float32),
            edge_index=np.stack([
                rng.randint(0, n, e), rng.randint(0, n, e)
            ]).astype(np.int64),
        ))
    batch = collate(samples, node_slot=16, dense_adjacency=True)
    x = jnp.asarray(rng.randn(batch.num_nodes, 128).astype(np.float32))
    out = adjacency_spmm(batch.adjacency, x)
    ref = segment_sum(
        x[batch.senders] * batch.edge_mask[:, None].astype(x.dtype),
        batch.receivers, batch.num_nodes,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )
