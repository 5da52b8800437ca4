import numpy as np
import jax.numpy as jnp

from hydragnn_tpu.ops import (
    segment_sum,
    segment_mean,
    segment_max,
    segment_min,
    segment_std,
    segment_softmax,
    gather_scatter_sum,
    degree,
)


def ref_segment(data, ids, nseg, op):
    out = []
    for s in range(nseg):
        rows = data[ids == s]
        if len(rows) == 0:
            out.append(np.zeros(data.shape[1:]))
        else:
            out.append(op(rows))
    return np.stack(out)


def test_segment_sum_mean_max_min():
    rng = np.random.RandomState(0)
    ids = np.sort(rng.randint(0, 5, 40))
    x = rng.randn(40, 3).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(segment_sum(jnp.asarray(x), jnp.asarray(ids), 6)),
        ref_segment(x, ids, 6, lambda r: r.sum(0)), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(segment_mean(jnp.asarray(x), jnp.asarray(ids), 6)),
        ref_segment(x, ids, 6, lambda r: r.mean(0)), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(segment_max(jnp.asarray(x), jnp.asarray(ids), 6)),
        ref_segment(x, ids, 6, lambda r: r.max(0)), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(segment_min(jnp.asarray(x), jnp.asarray(ids), 6)),
        ref_segment(x, ids, 6, lambda r: r.min(0)), rtol=1e-5)


def test_segment_ops_masked():
    rng = np.random.RandomState(1)
    ids = np.sort(rng.randint(0, 4, 30))
    x = rng.randn(30, 2).astype(np.float32)
    mask = rng.rand(30) > 0.3
    xm, im = x[mask], ids[mask]
    got = segment_mean(jnp.asarray(x), jnp.asarray(ids), 5, mask=jnp.asarray(mask))
    want = ref_segment(xm, im, 5, lambda r: r.mean(0))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)
    got = segment_max(jnp.asarray(x), jnp.asarray(ids), 5, mask=jnp.asarray(mask))
    want = ref_segment(xm, im, 5, lambda r: r.max(0))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_segment_std_matches_pyg_formula():
    rng = np.random.RandomState(2)
    ids = np.sort(rng.randint(0, 3, 20))
    x = rng.randn(20, 2).astype(np.float32)
    got = np.asarray(segment_std(jnp.asarray(x), jnp.asarray(ids), 4))
    for s in range(4):
        rows = x[ids == s]
        if len(rows):
            want = np.sqrt(
                np.maximum(rows.__pow__(2).mean(0) - rows.mean(0) ** 2, 0) + 1e-5
            )
            np.testing.assert_allclose(got[s], want, rtol=1e-4)


def test_segment_softmax_sums_to_one():
    rng = np.random.RandomState(3)
    ids = np.sort(rng.randint(0, 4, 25))
    x = rng.randn(25, 1).astype(np.float32)
    sm = np.asarray(segment_softmax(jnp.asarray(x), jnp.asarray(ids), 5))
    for s in np.unique(ids):
        np.testing.assert_allclose(sm[ids == s].sum(), 1.0, rtol=1e-5)


def test_gather_scatter_sum():
    x = jnp.asarray(np.eye(4, dtype=np.float32))
    senders = jnp.asarray([0, 1, 2, 3])
    receivers = jnp.asarray([1, 1, 3, 3])
    out = np.asarray(gather_scatter_sum(x, senders, receivers, 4))
    want = np.zeros((4, 4))
    want[1] = [1, 1, 0, 0]
    want[3] = [0, 0, 1, 1]
    np.testing.assert_allclose(out, want)
    d = np.asarray(degree(receivers, 4))
    np.testing.assert_allclose(d, [0, 2, 0, 2])


def test_segment_sum_via_perm_inverse_grad():
    """permute_rows backward (gather by inverse perm) must equal the plain
    data[perm] backward (scatter) exactly."""
    import jax
    from hydragnn_tpu.ops.segment import segment_sum_via_perm

    rng = np.random.RandomState(3)
    E, N, F = 64, 10, 5
    ids = rng.randint(0, N, E).astype(np.int32)
    perm = np.argsort(ids, kind="stable").astype(np.int32)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(E, dtype=np.int32)
    data = jnp.asarray(rng.randn(E, F).astype(np.float32))

    def loss_fast(d):
        return jnp.sum(
            segment_sum_via_perm(d, jnp.asarray(ids), N, jnp.asarray(perm),
                                 jnp.asarray(inv)) ** 2
        )

    def loss_ref(d):
        return jnp.sum(
            jax.ops.segment_sum(d, jnp.asarray(ids), N) ** 2
        )

    out_fast = loss_fast(data)
    out_ref = loss_ref(data)
    np.testing.assert_allclose(float(out_fast), float(out_ref), rtol=1e-6)
    g_fast = jax.grad(loss_fast)(data)
    g_ref = jax.grad(loss_ref)(data)
    np.testing.assert_allclose(
        np.asarray(g_fast), np.asarray(g_ref), rtol=1e-6, atol=1e-6
    )


def test_gather_src_dst_merged_backward():
    """Combined src+dst gather: values and gradients must equal two plain
    gathers exactly."""
    import jax
    # the inner op: the public wrapper only routes here on TPU with
    # 128-multiple features, but the VJP itself is backend-agnostic
    from hydragnn_tpu.ops.spmm import _gather_src_dst as gather_src_dst

    rng = np.random.RandomState(5)
    N, E, F = 12, 70, 128
    receivers = np.sort(rng.randint(0, N, E)).astype(np.int32)
    senders = rng.randint(0, N, E).astype(np.int32)
    perm = np.argsort(senders, kind="stable").astype(np.int32)
    x = jnp.asarray(rng.randn(N, F).astype(np.float32))
    w_s = jnp.asarray(rng.randn(E, F).astype(np.float32))
    w_r = jnp.asarray(rng.randn(E, F).astype(np.float32))

    def loss_merged(v):
        a, b = gather_src_dst(v, jnp.asarray(senders), jnp.asarray(receivers),
                              jnp.asarray(perm))
        return jnp.sum(a * w_s) + jnp.sum(b * w_r)

    def loss_ref(v):
        return jnp.sum(v[jnp.asarray(senders)] * w_s) + jnp.sum(
            v[jnp.asarray(receivers)] * w_r
        )

    np.testing.assert_allclose(
        float(loss_merged(x)), float(loss_ref(x)), rtol=1e-6
    )
    g_m = jax.grad(loss_merged)(x)
    g_r = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(
        np.asarray(g_m), np.asarray(g_r), rtol=1e-5, atol=1e-5
    )
