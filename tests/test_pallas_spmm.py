"""Fused adjacency-SpMM kernel correctness (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import hydragnn_tpu.ops.pallas_spmm as pspmm


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def _batched_graph(G=6, NV=40, D=5, F=128, seed=0):
    """Receiver-sorted batched-graph edge list (collate contract)."""
    rng = np.random.RandomState(seed)
    N = G * NV
    E = N * D
    gbase = np.repeat(np.arange(G, dtype=np.int64) * NV, NV * D)
    receivers = (gbase + np.repeat(np.tile(np.arange(NV), G), D)).astype(
        np.int32
    )
    senders = (gbase + rng.randint(0, NV, E)).astype(np.int32)
    x = rng.randn(N, F).astype(np.float32)
    return x, senders, receivers, N, E


def _ref(x, s, r, w, n):
    msgs = x[s] * w[:, None]
    return np.asarray(
        jax.ops.segment_sum(jnp.asarray(msgs), jnp.asarray(r), n)
    )


def test_fused_spmm_matches_reference():
    x, s, r, n, e = _batched_graph()
    w = np.ones(e, np.float32)
    want = _ref(x, s, r, w, n)
    got = np.asarray(
        pspmm._spmm_fused_impl(
            jnp.asarray(x), jnp.asarray(s), jnp.asarray(r), jnp.asarray(w), n,
            # small blocks so the test exercises multi-block/multi-tile paths
            row_block=128, edge_tile=256, window=64,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)


def test_fused_spmm_masked_and_weighted():
    x, s, r, n, e = _batched_graph(seed=1)
    rng = np.random.RandomState(2)
    w = rng.randn(e).astype(np.float32)
    mask = (rng.rand(e) > 0.3).astype(np.float32)
    want = _ref(x, s, r, w * mask, n)
    got = np.asarray(
        pspmm._spmm_fused_impl(
            jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
            jnp.asarray(w * mask), n,
            row_block=128, edge_tile=256, window=64, w_passes=2,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_fused_spmm_nonmultiple_edge_count():
    x, s, r, n, _ = _batched_graph(G=3, NV=30, D=4, seed=3)
    # truncate to a ragged edge count to force tail padding
    keep = len(s) - 37
    s, r = s[:keep], r[:keep]
    w = np.ones(keep, np.float32)
    want = _ref(x, s, r, w, n)
    got = np.asarray(
        pspmm._spmm_fused_impl(
            jnp.asarray(x), jnp.asarray(s), jnp.asarray(r), jnp.asarray(w), n,
            row_block=128, edge_tile=256, window=64,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)


def test_fused_spmm_window_violation_falls_back():
    # global-random senders break the locality precondition -> XLA fallback
    rng = np.random.RandomState(4)
    N, E, F = 512, 1024, 128
    r = np.sort(rng.randint(0, N, E)).astype(np.int32)
    s = rng.randint(0, N, E).astype(np.int32)  # no window fits
    x = rng.randn(N, F).astype(np.float32)
    w = np.ones(E, np.float32)
    want = _ref(x, s, r, w, N)
    got = np.asarray(
        pspmm._spmm_fused_impl(
            jnp.asarray(x), jnp.asarray(s), jnp.asarray(r), jnp.asarray(w), N,
            row_block=128, edge_tile=256, window=32,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)


def test_fused_spmm_int8_adjacency():
    # int8 A-build (mask/unit weights): exact integer multiplicities
    x, s, r, n, e = _batched_graph(seed=9)
    rng = np.random.RandomState(10)
    mask = (rng.rand(e) > 0.4).astype(np.float32)
    want = _ref(x, s, r, mask, n)
    got = np.asarray(
        pspmm._spmm_fused_impl(
            jnp.asarray(x), jnp.asarray(s), jnp.asarray(r), jnp.asarray(mask),
            n, row_block=128, edge_tile=256, window=64, a_int8=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)


def test_fused_spmm_r_sub_32():
    x, s, r, n, e = _batched_graph(seed=11)
    w = np.ones(e, np.float32)
    want = _ref(x, s, r, w, n)
    got = np.asarray(
        pspmm._spmm_fused_impl(
            jnp.asarray(x), jnp.asarray(s), jnp.asarray(r), jnp.asarray(w), n,
            row_block=128, edge_tile=256, window=64, r_sub=32,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)


def test_fused_spmm_grad_x():
    x, s, r, n, e = _batched_graph(G=4, NV=32, D=4, seed=5)
    w = np.ones(e, np.float32)
    perm = np.argsort(s, kind="stable").astype(np.int32)
    xs = jnp.asarray(x)

    def loss_fused(v):
        out = pspmm.spmm_onehot(
            v, jnp.asarray(s), jnp.asarray(r), jnp.asarray(w),
            jnp.asarray(perm), n,
        )
        return jnp.sum(out**2)

    def loss_ref(v):
        return jnp.sum(
            jax.ops.segment_sum(v[jnp.asarray(s)], jnp.asarray(r), n) ** 2
        )

    g_fused = jax.grad(loss_fused)(xs)
    g_ref = jax.grad(loss_ref)(xs)
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_ref), rtol=1e-5, atol=1e-4
    )


def test_fused_spmm_grad_weights():
    x, s, r, n, e = _batched_graph(G=4, NV=32, D=4, seed=6)
    rng = np.random.RandomState(7)
    w = rng.randn(e).astype(np.float32)
    perm = np.argsort(s, kind="stable").astype(np.int32)

    def loss_fused(wv):
        out = pspmm.spmm_onehot(
            jnp.asarray(x), jnp.asarray(s), jnp.asarray(r), wv,
            jnp.asarray(perm), n, True, 2,
        )
        return jnp.sum(out**2)

    def loss_ref(wv):
        msgs = jnp.asarray(x)[jnp.asarray(s)] * wv[:, None]
        return jnp.sum(jax.ops.segment_sum(msgs, jnp.asarray(r), n) ** 2)

    g_fused = jax.grad(loss_fused)(jnp.asarray(w))
    g_ref = jax.grad(loss_ref)(jnp.asarray(w))
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_ref), rtol=1e-4, atol=1e-3
    )


def test_fused_spmm_bf16():
    x, s, r, n, e = _batched_graph(G=4, NV=32, D=4, seed=8)
    w = np.ones(e, np.float32)
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    want = jax.ops.segment_sum(
        xb[jnp.asarray(s)].astype(jnp.float32), jnp.asarray(r), n
    )
    got = pspmm._spmm_fused_impl(
        xb, jnp.asarray(s), jnp.asarray(r), jnp.asarray(w), n,
        row_block=128, edge_tile=256, window=64,
    ).astype(jnp.float32)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-1
    )
