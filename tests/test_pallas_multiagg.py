"""Fused multi-aggregator segment kernel correctness (interpret mode, CPU).

Exactness vs the unfused ops/segment.py path for the PNA aggregator set
(mean/min/max/std), including cross-tile run carries, empty segments,
masked edges, the unsorted(perm) route, and gradients.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import hydragnn_tpu.ops.pallas_multiagg as pm
import hydragnn_tpu.ops.segment as seg


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def _reference(msgs, recv, n):
    m = jnp.asarray(msgs)
    r = jnp.asarray(recv)
    s = jax.ops.segment_sum(m, r, n)
    ss = jax.ops.segment_sum(m * m, r, n)
    mx = seg.segment_max(m, r, n)
    mn = seg.segment_min(m, r, n)
    return map(np.asarray, (s, ss, mx, mn))


def test_multiagg_matches_xla_fp32():
    rng = np.random.RandomState(0)
    N, E, F = 300, 1100, 128
    recv = np.sort(rng.randint(0, N, E)).astype(np.int32)
    msgs = rng.randn(E, F).astype(np.float32)
    want = _reference(msgs, recv, N)
    got = pm.segment_multiagg(
        jnp.asarray(msgs), jnp.asarray(recv), N, jnp.int32(E)
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-5, atol=1e-4)


def test_multiagg_cross_tile_runs_and_empty_segments():
    # long runs forced across small edge tiles exercise the scan carry;
    # stride-7 ids leave most segments empty
    rng = np.random.RandomState(1)
    N, E, F = 700, 1537, 128
    recv = np.sort(
        np.concatenate(
            [
                rng.choice(np.arange(0, N, 7), E - 600),
                np.full(600, 350, np.int32),  # one 600-edge run
            ]
        )
    ).astype(np.int32)
    msgs = rng.randn(E, F).astype(np.float32)
    want = _reference(msgs, recv, N)
    got = pm._multiagg_impl(
        jnp.asarray(msgs), jnp.asarray(recv), N, jnp.int32(600),
        row_block=256, edge_tile=256,
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-5, atol=1e-4)


def test_multiagg_bf16():
    rng = np.random.RandomState(2)
    N, E, F = 256, 2048, 128
    recv = np.sort(rng.randint(0, N, E)).astype(np.int32)
    msgs = rng.randn(E, F).astype(np.float32)
    m16 = jnp.asarray(msgs).astype(jnp.bfloat16)
    got = pm.segment_multiagg(m16, jnp.asarray(recv), N, jnp.int32(E))
    # max/min select exactly in bf16
    mx = np.asarray(
        seg.segment_max(m16.astype(jnp.float32), jnp.asarray(recv), N)
    )
    mn = np.asarray(
        seg.segment_min(m16.astype(jnp.float32), jnp.asarray(recv), N)
    )
    m32 = np.asarray(m16.astype(jnp.float32))
    np.testing.assert_array_equal(
        np.asarray(got[2].astype(jnp.float32)),
        np.asarray(jnp.asarray(mx).astype(jnp.bfloat16).astype(jnp.float32)),
    )
    np.testing.assert_array_equal(
        np.asarray(got[3].astype(jnp.float32)),
        np.asarray(jnp.asarray(mn).astype(jnp.bfloat16).astype(jnp.float32)),
    )
    # sums accumulate in fp32 before the output cast — compare loosely
    want_s = jax.ops.segment_sum(jnp.asarray(m32), jnp.asarray(recv), N)
    np.testing.assert_allclose(
        np.asarray(got[0].astype(jnp.float32)), np.asarray(want_s),
        rtol=2e-2, atol=2e-2,
    )


def test_multiagg_sentinel_ids_dropped():
    rng = np.random.RandomState(3)
    N, E, F = 128, 640, 128
    recv = np.sort(rng.randint(0, N, E)).astype(np.int32)
    recv[-100:] = 2**31 - 2  # tail padding sentinel
    msgs = rng.randn(E, F).astype(np.float32)
    want = _reference(msgs[:-100], recv[:-100], N)
    got = pm.segment_multiagg(
        jnp.asarray(msgs), jnp.asarray(recv), N, jnp.int32(E)
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-5, atol=1e-4)


def test_multiagg_gradients_match_unfused():
    rng = np.random.RandomState(4)
    N, E, F = 200, 900, 128
    recv = np.sort(rng.randint(0, N, E)).astype(np.int32)
    msgs = rng.randn(E, F).astype(np.float32)
    wts = rng.randn(4, N, F).astype(np.float32)

    def fused(m):
        s, ss, mx, mn = pm.segment_multiagg(m, jnp.asarray(recv), N,
                                            jnp.int32(E))
        return jnp.sum(wts[0] * s + wts[1] * ss + wts[2] * mx + wts[3] * mn)

    def unfused(m):
        s = jax.ops.segment_sum(m, jnp.asarray(recv), N)
        ss = jax.ops.segment_sum(m * m, jnp.asarray(recv), N)
        mx = seg.segment_max(m, jnp.asarray(recv), N)
        mn = seg.segment_min(m, jnp.asarray(recv), N)
        return jnp.sum(wts[0] * s + wts[1] * ss + wts[2] * mx + wts[3] * mn)

    gf = jax.grad(fused)(jnp.asarray(msgs))
    gu = jax.grad(unfused)(jnp.asarray(msgs))
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gu),
                               rtol=1e-4, atol=1e-4)


def test_multiagg_bwd_kernel_matches_formula():
    rng = np.random.RandomState(6)
    N, E, F = 300, 1100, 128
    recv = np.sort(rng.randint(0, N, E)).astype(np.int32)
    recv[-50:] = 2**31 - 2  # sentinel tail
    msgs = rng.randn(E, F).astype(np.float32)
    gs, gss, gmx, gmn = (rng.randn(N, F).astype(np.float32) for _ in range(4))
    mx = np.asarray(seg.segment_max(jnp.asarray(msgs[:-50]),
                                    jnp.asarray(recv[:-50]), N))
    mn = np.asarray(seg.segment_min(jnp.asarray(msgs[:-50]),
                                    jnp.asarray(recv[:-50]), N))
    valid = recv < N
    ids = np.clip(recv, 0, N - 1)
    want = (
        gs[ids]
        + 2.0 * msgs * gss[ids]
        + np.where(msgs == mx[ids], gmx[ids], 0.0)
        + np.where(msgs == mn[ids], gmn[ids], 0.0)
    ) * valid[:, None]
    got = pm._multiagg_bwd_impl(
        jnp.asarray(msgs), jnp.asarray(recv), N,
        *(jnp.asarray(a) for a in (gs, gss, gmx, gmn, mx, mn)),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-4)


def test_pna_aggregate_wrapper_fused_vs_unfused(monkeypatch):
    """The full wrapper: mask remap, F padding (F=192), fused-vs-unfused
    equality on both the sorted and the perm (unsorted) routes."""
    rng = np.random.RandomState(5)
    N, E, F = 600, 4608, 192
    recv = np.sort(rng.randint(0, N, E)).astype(np.int32)
    mask = np.ones(E, bool)
    mask[-200:] = False
    recv[-200:] = N - 1  # padding edges point at the last node (collate)
    msgs = rng.randn(E, F).astype(np.float32)

    ref = [
        np.asarray(f(jnp.asarray(msgs), jnp.asarray(recv), N,
                     mask=jnp.asarray(mask)))
        for f in (seg.segment_mean, seg.segment_min, seg.segment_max,
                  seg.segment_std)
    ]
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    got = seg.pna_aggregate(
        jnp.asarray(msgs), jnp.asarray(recv), N, mask=jnp.asarray(mask),
        indices_are_sorted=True,
    )
    for g, w in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-5, atol=1e-4)

    # unsorted route: shuffle edges, supply the sorting permutation
    shuf = rng.permutation(E)
    perm = np.argsort(recv[shuf], kind="stable").astype(np.int32)
    inv = np.empty(E, np.int32)
    inv[perm] = np.arange(E, dtype=np.int32)
    got_u = seg.pna_aggregate(
        jnp.asarray(msgs[shuf]), jnp.asarray(recv[shuf]), N,
        mask=jnp.asarray(mask[shuf]), indices_are_sorted=False,
        perm=jnp.asarray(perm), inv_perm=jnp.asarray(inv),
    )
    for g, w in zip(got_u, ref):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-5, atol=1e-4)


def test_multiagg_tie_gradients_split_like_jax(monkeypatch):
    """Duplicate edges produce identical message values (ties): the
    max/min cotangent must SPLIT equally among tied edges like
    jax.ops.segment_max (route-to-all overcounts — caught by a 15% model-
    level gradient divergence in round 5)."""
    rng = np.random.RandomState(7)
    N, E, F = 64, 4608, 128
    recv = np.sort(rng.randint(0, N, E)).astype(np.int32)
    base = rng.randn(E, F).astype(np.float32)
    # duplicate every third edge's value within its segment
    base[1::3] = base[0::3][: base[1::3].shape[0]]
    wts = rng.randn(2, N, F).astype(np.float32)
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")

    def fused(m):
        _, _, mx, mn = pm.segment_multiagg(m, jnp.asarray(recv), N,
                                           jnp.int32(E))
        return jnp.sum(wts[0] * mx + wts[1] * mn)

    def unfused(m):
        mx = seg.segment_max(m, jnp.asarray(recv), N)
        mn = seg.segment_min(m, jnp.asarray(recv), N)
        return jnp.sum(wts[0] * mx + wts[1] * mn)

    gf = jax.grad(fused)(jnp.asarray(base))
    gu = jax.grad(unfused)(jnp.asarray(base))
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gu),
                               rtol=1e-4, atol=1e-4)
