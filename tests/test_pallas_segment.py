"""Pallas CSR segment-sum kernel correctness (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import hydragnn_tpu.ops.pallas_segment as ps


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    # run pallas kernels in interpreter mode on CPU
    from jax.experimental.pallas import tpu as pltpu

    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def test_segment_sum_csr_matches_xla():
    rng = np.random.RandomState(0)
    N, E, F = 300, 1000, 128
    receivers = np.sort(rng.randint(0, N, E)).astype(np.int32)
    msgs = rng.randn(E, F).astype(np.float32)
    want = np.asarray(
        jax.ops.segment_sum(jnp.asarray(msgs), jnp.asarray(receivers), N)
    )
    got = np.asarray(
        ps.segment_sum_csr(jnp.asarray(msgs), jnp.asarray(receivers), N)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_segment_sum_csr_empty_rows_and_tail():
    rng = np.random.RandomState(1)
    N, E, F = 700, 537, 128  # non-multiple sizes force padding paths
    receivers = np.sort(rng.choice(np.arange(0, N, 7), E)).astype(np.int32)
    msgs = rng.randn(E, F).astype(np.float32)
    want = np.asarray(
        jax.ops.segment_sum(jnp.asarray(msgs), jnp.asarray(receivers), N)
    )
    got = np.asarray(
        ps.segment_sum_csr(jnp.asarray(msgs), jnp.asarray(receivers), N)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_segment_sum_csr_grad():
    rng = np.random.RandomState(2)
    N, E, F = 256, 512, 128
    receivers = np.sort(rng.randint(0, N, E)).astype(np.int32)
    msgs = jnp.asarray(rng.randn(E, F).astype(np.float32))

    def loss_kernel(m):
        return jnp.sum(ps.segment_sum_csr(m, jnp.asarray(receivers), N) ** 2)

    def loss_xla(m):
        return jnp.sum(
            jax.ops.segment_sum(m, jnp.asarray(receivers), N) ** 2
        )

    g1 = jax.grad(loss_kernel)(msgs)
    g2 = jax.grad(loss_xla)(msgs)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4,
                               atol=1e-3)


def test_spmm_grad_with_perm():
    from hydragnn_tpu.ops.spmm import spmm

    rng = np.random.RandomState(3)
    N, E, F = 200, 400, 128
    receivers = np.sort(rng.randint(0, N, E)).astype(np.int32)
    senders = rng.randint(0, N, E).astype(np.int32)
    perm = np.argsort(senders, kind="stable").astype(np.int32)
    x = jnp.asarray(rng.randn(N, F).astype(np.float32))

    def loss_fused(x):
        return jnp.sum(
            spmm(x, jnp.asarray(senders), jnp.asarray(receivers), N,
                 jnp.asarray(perm)) ** 2
        )

    def loss_ref(x):
        return jnp.sum(
            jax.ops.segment_sum(x[senders], jnp.asarray(receivers), N) ** 2
        )

    np.testing.assert_allclose(
        float(loss_fused(x)), float(loss_ref(x)), rtol=1e-4
    )
    g1 = jax.grad(loss_fused)(x)
    g2 = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4,
                               atol=1e-3)


def test_segment_sum_csr_v2_windowed():
    rng = np.random.RandomState(4)
    for N, E, deg_sorted in ((700, 2100, True), (512, 8192, True)):
        receivers = np.sort(rng.randint(0, N, E)).astype(np.int32)
        msgs = rng.randn(E, 128).astype(np.float32)
        want = np.asarray(
            jax.ops.segment_sum(jnp.asarray(msgs), jnp.asarray(receivers), N)
        )
        got = np.asarray(
            ps._segment_sum_csr_impl_v2(jnp.asarray(msgs),
                                        jnp.asarray(receivers), N)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
