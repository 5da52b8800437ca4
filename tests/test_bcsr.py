"""Block-sparse (BCSR) adjacency SpMM for giant graphs (interpret mode on
CPU): tile build, forward/backward vs XLA segment-sum, collate wiring, and
the GIN conv routed through the BCSR path.

Contract: segment aggregation of hydragnn/models/Base.py:446-478 (the conv
loop's scatter), here as a precomputed banded MXU matmul (ops/bcsr.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hydragnn_tpu.ops.bcsr import (
    BCSR,
    bcsr_matmul_tilegrid,
    bcsr_spmm,
    build_bcsr,
)


@pytest.fixture(autouse=True)
def _interpret():
    from jax.experimental.pallas import tpu as pltpu

    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def _banded_graph(seed=0, n=2000, deg=6, band=300, dup=False):
    rng = np.random.RandomState(seed)
    r = np.repeat(np.arange(n), deg)
    s = np.clip(r + rng.randint(-band, band + 1, r.shape[0]), 0, n - 1)
    if dup:
        s[1] = s[0]
        r[1] = r[0]
    mask = rng.rand(r.shape[0]) > 0.1
    return s, r, mask


def _xla_ref(x, s, r, mask, n):
    w = mask[:, None].astype(x.dtype) if mask is not None else 1.0
    return np.asarray(
        jax.ops.segment_sum(jnp.asarray(x[s] * w), jnp.asarray(r), n)
    )


def test_bcsr_forward_matches_xla():
    s, r, mask = _banded_graph()
    n, f = 2000, 128
    bc = build_bcsr(s, r, mask, n)
    x = np.random.RandomState(1).randn(n, f).astype(np.float32)
    got = np.asarray(bcsr_spmm(jnp.asarray(x), bc))
    want = _xla_ref(x, s, r, mask, n)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)


def test_bcsr_tilegrid_variant_matches():
    s, r, mask = _banded_graph(seed=2)
    n, f = 2000, 128
    bc = build_bcsr(s, r, mask, n, pack=False, band=False)
    x = np.random.RandomState(3).randn(n, f).astype(np.float32)
    got = np.asarray(bcsr_matmul_tilegrid(bc.fwd, jnp.asarray(x))[:n])
    want = _xla_ref(x, s, r, mask, n)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)


def test_bcsr_backward_matches_xla():
    s, r, mask = _banded_graph(seed=4)
    n, f = 2000, 128
    bc = build_bcsr(s, r, mask, n)
    x = jnp.asarray(np.random.RandomState(5).randn(n, f).astype(np.float32))
    w = jnp.asarray(np.random.RandomState(6).randn(n, f).astype(np.float32))
    sm = jnp.asarray(s)
    rm = jnp.asarray(r)
    mw = jnp.asarray(mask[:, None].astype(np.float32))
    g_ref = jax.grad(
        lambda v: jnp.sum(jax.ops.segment_sum(v[sm] * mw, rm, n) * w)
    )(x)
    g_bc = jax.grad(lambda v: jnp.sum(bcsr_spmm(v, bc) * w))(x)
    np.testing.assert_allclose(
        np.asarray(g_bc), np.asarray(g_ref), rtol=1e-5, atol=1e-3
    )


def test_bcsr_multiplicity_and_empty_blocks():
    # duplicate edges count twice; trailing node blocks with no edges
    # still produce (zero-aggregated) output rows
    s, r, mask = _banded_graph(seed=7, dup=True)
    keep = 200  # only the head of the graph has edges
    n, f = 2000, 128
    bc = build_bcsr(s[:keep], r[:keep], mask[:keep], n)
    x = np.random.RandomState(8).randn(n, f).astype(np.float32)
    got = np.asarray(bcsr_spmm(jnp.asarray(x), bc))
    want = _xla_ref(x, s[:keep], r[:keep], mask[:keep], n)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)


def test_band_direction_built_and_matches_grid():
    # the banded graph should take the band-aligned one-tile-per-block
    # path; grid-aligned tiles and XLA must agree with it
    from hydragnn_tpu.ops.bcsr import BandDir

    s, r, mask = _banded_graph(seed=9)
    n, f = 2000, 128
    bc_band = build_bcsr(s, r, mask, n)
    bc_grid = build_bcsr(s, r, mask, n, band=False)
    assert isinstance(bc_band.fwd, BandDir) and isinstance(
        bc_band.bwd, BandDir
    )
    assert not isinstance(bc_grid.fwd, BandDir)
    x = np.random.RandomState(10).randn(n, f).astype(np.float32)
    want = _xla_ref(x, s, r, mask, n)
    for bc in (bc_band, bc_grid):
        got = np.asarray(bcsr_spmm(jnp.asarray(x), bc))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)


def test_band_col0_clamp_at_array_tail():
    # edges concentrated at the TOP of the node range: col0 must clamp to
    # n_cap - width so the x-window DMA stays inside the padded array
    n, f = 1000, 128
    r = np.arange(n - 60, n).repeat(4)
    s = np.clip(
        r + np.random.RandomState(11).randint(-50, 51, r.shape[0]), 0, n - 1
    )
    bc = build_bcsr(s, r, None, n)
    x = np.random.RandomState(12).randn(n, f).astype(np.float32)
    got = np.asarray(bcsr_spmm(jnp.asarray(x), bc))
    want = _xla_ref(x, s, r, None, n)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)


def test_band_outlier_tiles_periodic_wrap():
    # a 1D ring in natural order: every block is narrow-band except the
    # wrap edges (0 <-> n-1), which must land in outlier tiles and still
    # aggregate exactly
    from hydragnn_tpu.ops.bcsr import BandDir

    n, f = 4096, 128
    i = np.arange(n)
    s = np.concatenate([(i - 1) % n, (i + 1) % n, i])
    r = np.concatenate([i, i, i])
    bc = build_bcsr(s, r, None, n)
    assert isinstance(bc.fwd, BandDir)
    assert bc.fwd.width < n  # wrap edges did not blow up the window
    assert int(bc.fwd.orow_ptr[-1]) > 0  # ...they became outliers
    x = np.random.RandomState(13).randn(n, f).astype(np.float32)
    got = np.asarray(bcsr_spmm(jnp.asarray(x), bc))
    want = _xla_ref(x, s, r, None, n)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)


def test_band_order_picks_raster_for_torus_and_rcm_for_shuffled():
    from hydragnn_tpu.data.ordering import band_order

    # periodic 2D Moore lattice, natural raster order: RCM's BFS level
    # sets are ~2x the raster band, so identity must win (160x160 is past
    # the crossover under 512-aligned ring windows; smaller lattices can
    # legitimately prefer RCM since the block-row overhead dominates)
    from itertools import product

    dims = (160, 160)
    n = dims[0] * dims[1]
    idx = np.arange(n).reshape(dims)
    shifts = []
    for off in product((-1, 0, 1), repeat=2):
        if any(off):
            sh = idx
            for ax, d in enumerate(off):
                if d:
                    sh = np.roll(sh, d, axis=ax)
            shifts.append(sh)
    s = np.concatenate([sh.ravel() for sh in shifts])
    r = np.tile(idx.ravel(), len(shifts))
    ei = np.stack([s, r])
    perm = band_order(ei, n, block=512)
    assert (perm == np.arange(n)).all()  # raster band beats RCM's

    # shuffled labels: identity is bandless, RCM must win
    rng = np.random.RandomState(0)
    shuf = rng.permutation(n)
    ei_shuf = shuf[ei]
    perm2 = band_order(ei_shuf, n, block=512)
    assert not (perm2 == np.arange(n)).all()


def test_bcsr_rejects_bandless_giant_graph():
    # random senders over 1M nodes: tiles would approach the dense
    # adjacency; build must decline
    rng = np.random.RandomState(0)
    n = 1 << 20
    r = np.sort(rng.randint(0, n, 4096))
    s = rng.randint(0, n, 4096)
    assert build_bcsr(s, r, None, n) is None


def test_collate_builds_bcsr_and_gin_uses_it():
    from hydragnn_tpu.graph import GraphSample, collate
    from hydragnn_tpu.ops.segment import gather_scatter_sum

    rng = np.random.RandomState(0)
    n = 500
    r = np.repeat(np.arange(n), 4)
    s = np.clip(r + rng.randint(-40, 41, r.shape[0]), 0, n - 1)
    sample = GraphSample(
        x=rng.randn(n, 1).astype(np.float32),
        pos=rng.randn(n, 3).astype(np.float32),
        edge_index=np.stack([s, r]),
        y_graph=np.ones(1, np.float32),
    )
    batch = collate([sample], bcsr_adjacency=True)
    assert batch.bcsr is not None
    x = jnp.asarray(rng.randn(batch.num_nodes, 128).astype(np.float32))
    want = np.asarray(jax.ops.segment_sum(
        x[batch.senders] * batch.edge_mask[:, None].astype(x.dtype),
        batch.receivers, batch.num_nodes, indices_are_sorted=True,
    ))
    got = np.asarray(bcsr_spmm(x, batch.bcsr))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)
    # the dispatch itself declines on CPU backend (interpret mode is only
    # for kernel tests); assert the fallback still computes the same thing
    out = gather_scatter_sum(
        x, batch.senders, batch.receivers, batch.num_nodes,
        edge_mask=batch.edge_mask,
        perm_by_sender=batch.edge_perm_by_sender,
        bcsr=batch.bcsr,
    )
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6, atol=1e-5)


def test_band_multi_feature_tile_path():
    # F > F_TILE_MAX exercises the (nf, NB) grid: the j-transition re-DMA
    # logic must produce every feature tile correctly
    from hydragnn_tpu.ops.bcsr import BandDir, F_TILE_MAX

    s, r, mask = _banded_graph(seed=14, n=1200, deg=4, band=200)
    n, f = 1200, 2 * F_TILE_MAX
    bc = build_bcsr(s, r, mask, n)
    assert isinstance(bc.fwd, BandDir)
    x = np.random.RandomState(15).randn(n, f).astype(np.float32)
    got = np.asarray(bcsr_spmm(jnp.asarray(x), bc))
    want = _xla_ref(x, s, r, mask, n)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-4)


def test_band_xring_variant_matches(monkeypatch):
    """The opt-in x-chunk ring band (HYDRAGNN_TPU_BCSR_XRING=1 /
    _build_band_direction(x_ring=True)): chunk-aligned windows, host-
    simulated ring miss flags, per-chunk dots — must agree exactly with
    XLA and with the default whole-window band."""
    from hydragnn_tpu.ops.bcsr import BandDir

    monkeypatch.setenv("HYDRAGNN_TPU_BCSR_XRING", "1")
    s, r, mask = _banded_graph(seed=13)
    n, f = 2000, 128
    bc = build_bcsr(s, r, mask, n)
    assert isinstance(bc.fwd, BandDir) and bc.fwd.chunked
    assert bc.fwd.xflags is not None
    x = np.random.RandomState(14).randn(n, f).astype(np.float32)
    got = np.asarray(bcsr_spmm(jnp.asarray(x), bc))
    want = _xla_ref(x, s, r, mask, n)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)
    # bf16 path through the same ring
    got16 = np.asarray(
        bcsr_spmm(jnp.asarray(x).astype(jnp.bfloat16), bc).astype(
            jnp.float32
        )
    )
    np.testing.assert_allclose(got16, want, rtol=3e-2, atol=3e-1)
