"""DimeNet machinery: triplet builder and spherical basis."""

import numpy as np
import jax
import jax.numpy as jnp

from hydragnn_tpu.graph import GraphSample, collate
from hydragnn_tpu.models.dimenet import build_triplets
from hydragnn_tpu.ops.spherical import (
    _spherical_jn_np,
    spherical_basis,
    spherical_bessel_zeros,
)


def test_bessel_zeros_are_zeros():
    z = spherical_bessel_zeros(5, 6)
    for l in range(5):
        vals = _spherical_jn_np(l, z[l])
        assert np.max(np.abs(vals)) < 1e-8, (l, vals)
    # interlacing and ordering
    assert np.all(np.diff(z, axis=1) > 0)


def test_triplets_match_bruteforce():
    rng = np.random.RandomState(0)
    n, e = 8, 20
    senders = rng.randint(0, n, e)
    receivers = rng.randint(0, n, e)
    s = GraphSample(
        x=rng.randn(n, 1).astype(np.float32),
        pos=rng.randn(n, 3).astype(np.float32),
        edge_index=np.stack([senders, receivers]),
    )
    batch = collate([s])
    trip = build_triplets(batch, max_neighbours=e)

    # brute force on the batch's (sorted) edge list
    bs = np.asarray(batch.senders)
    br = np.asarray(batch.receivers)
    em = np.asarray(batch.edge_mask)
    want = set()
    E = len(bs)
    for e1 in range(E):  # j -> i
        if not em[e1]:
            continue
        j, i = bs[e1], br[e1]
        for e2 in range(E):  # k -> j
            if not em[e2] or br[e2] != j:
                continue
            k = bs[e2]
            if k == i:
                continue
            want.add((e2, e1))
    got = set(
        (int(kj), int(ji))
        for kj, ji, m in zip(
            np.asarray(trip.idx_kj), np.asarray(trip.idx_ji),
            np.asarray(trip.mask),
        )
        if m
    )
    assert got == want


def test_spherical_basis_shapes_and_l0():
    rng = np.random.RandomState(1)
    E, T, S, R, c = 10, 15, 4, 5, 3.0
    dist = rng.uniform(0.3, 2.9, E).astype(np.float32)
    angle = rng.uniform(0, np.pi, T).astype(np.float32)
    idx_kj = rng.randint(0, E, T)
    sbf = np.asarray(
        spherical_basis(jnp.asarray(dist), jnp.asarray(angle),
                        jnp.asarray(idx_kj), S, R, c)
    )
    assert sbf.shape == (T, S * R)
    assert np.all(np.isfinite(sbf))
    # l=0 block should be angle-independent: same idx_kj, different angle
    # -> identical first R columns
    sbf2 = np.asarray(
        spherical_basis(jnp.asarray(dist), jnp.asarray(angle * 0 + 1.0),
                        jnp.asarray(idx_kj), S, R, c)
    )
    np.testing.assert_allclose(sbf[:, :R], sbf2[:, :R], rtol=1e-5)
