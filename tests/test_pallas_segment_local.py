"""Unsorted-but-local windowed segment-sum kernel (interpret mode on CPU).

This is the permute-free aggregate-by-sender path (v3 kernel): EGNN's
node_model aggregation and the backward of every sender gather route
through it (ops/pallas_segment.segment_sum_local)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hydragnn_tpu.ops.pallas_segment import (
    segment_sum_local,
    segment_sum_local_vjp,
)


@pytest.fixture(autouse=True)
def _interpret():
    from jax.experimental.pallas import tpu as pltpu

    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def _workload(G=8, NV=40, D=5, F=128, seed=0):
    """Receiver-sorted batched-graph edges; aggregation key = SENDERS
    (unsorted within a tile, graph-local across tiles)."""
    rng = np.random.RandomState(seed)
    N, E = G * NV, G * NV * D
    gbase = np.repeat(np.arange(G, dtype=np.int64) * NV, NV * D)
    recv = (gbase + np.repeat(np.tile(np.arange(NV), G), D)).astype(np.int32)
    send = (gbase + rng.randint(0, NV, E)).astype(np.int32)
    order = np.argsort(recv)
    send = send[order]
    data = rng.randn(E, F).astype(np.float32)
    perm = np.argsort(send).astype(np.int32)
    return data, send, perm, N


def _ref(data, ids, n):
    out = np.zeros((n, data.shape[1]), np.float32)
    np.add.at(out, ids, data.astype(np.float32))
    return out


def test_local_kernel_exact_fp32():
    data, ids, perm, n = _workload()
    got = np.asarray(segment_sum_local(
        jnp.asarray(data), jnp.asarray(ids), n, jnp.asarray(perm),
        row_block=128, edge_tile=256,
    ))
    np.testing.assert_allclose(got, _ref(data, ids, n), rtol=1e-6, atol=1e-5)


def test_local_kernel_bf16():
    data, ids, perm, n = _workload(seed=1)
    d16 = jnp.asarray(data).astype(jnp.bfloat16)
    got = np.asarray(segment_sum_local(
        d16, jnp.asarray(ids), n, jnp.asarray(perm),
        row_block=128, edge_tile=256,
    ), dtype=np.float32)
    want = _ref(np.asarray(d16, np.float32), ids, n)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=1e-1)


def test_local_kernel_scrambled_fallback():
    data, ids, perm, n = _workload(seed=2)
    scram = np.random.RandomState(3).permutation(ids.shape[0])
    ids_s, data_s = ids[scram], data[scram]
    perm_s = np.argsort(ids_s).astype(np.int32)
    got = np.asarray(segment_sum_local(
        jnp.asarray(data_s), jnp.asarray(ids_s), n, jnp.asarray(perm_s),
        row_block=128, edge_tile=256,
    ))
    np.testing.assert_allclose(
        got, _ref(data_s, ids_s, n), rtol=1e-6, atol=1e-5
    )


def test_local_kernel_gradient():
    data, ids, perm, n = _workload(G=4, NV=24, D=3, seed=4)
    w = np.random.RandomState(5).randn(n, data.shape[1]).astype(np.float32)

    def loss(d):
        out = segment_sum_local_vjp(
            d, jnp.asarray(ids), n, jnp.asarray(perm)
        )
        return jnp.sum(out * jnp.asarray(w))

    g = np.asarray(jax.grad(loss)(jnp.asarray(data)))
    np.testing.assert_allclose(g, w[ids], rtol=1e-6, atol=1e-6)
