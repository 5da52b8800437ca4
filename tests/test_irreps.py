"""e3nn-mini: spherical harmonics + coupling equivariance checks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hydragnn_tpu.ops.irreps import (
    Irreps,
    coupling,
    real_sph_harm_np,
    spherical_harmonics,
    tp_instructions,
)


def random_rotation(rng):
    A = rng.randn(3, 3)
    Q, R = np.linalg.qr(A)
    Q = Q * np.sign(np.diag(R))
    if np.linalg.det(Q) < 0:
        Q[:, 0] = -Q[:, 0]
    return Q


def wigner_D_from_sh(l, Q):
    """Build D^l numerically: Y_l(Q v) = D Y_l(v) solved by least squares."""
    rng = np.random.RandomState(0)
    v = rng.randn(4 * (2 * l + 1), 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    Y = real_sph_harm_np(l, v)[:, l * l:(l + 1) * (l + 1)]
    Yr = real_sph_harm_np(l, v @ Q.T)[:, l * l:(l + 1) * (l + 1)]
    D, *_ = np.linalg.lstsq(Y, Yr, rcond=None)
    return D.T  # Yr = Y @ D.T -> Yr_i = D Y


def test_sh_component_normalization():
    rng = np.random.RandomState(0)
    v = rng.randn(10, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    Y = real_sph_harm_np(3, v)
    for l in range(4):
        block = Y[:, l * l:(l + 1) * (l + 1)]
        np.testing.assert_allclose(
            (block ** 2).sum(1), 2 * l + 1, rtol=1e-10
        )


def test_sh_jnp_matches_np():
    rng = np.random.RandomState(1)
    v = rng.randn(20, 3)
    got = np.asarray(spherical_harmonics(3, jnp.asarray(v)))
    v_unit = v / np.linalg.norm(v, axis=1, keepdims=True)
    want = real_sph_harm_np(3, v_unit)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_sh_rotation_equivariance():
    """Y_l(Qv) must be a linear (orthogonal) map of Y_l(v)."""
    rng = np.random.RandomState(2)
    Q = random_rotation(rng)
    for l in range(1, 4):
        D = wigner_D_from_sh(l, Q)
        # D must be orthogonal
        np.testing.assert_allclose(D @ D.T, np.eye(2 * l + 1), atol=1e-8)
        v = rng.randn(30, 3)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        Y = real_sph_harm_np(l, v)[:, l * l:(l + 1) * (l + 1)]
        Yr = real_sph_harm_np(l, v @ Q.T)[:, l * l:(l + 1) * (l + 1)]
        np.testing.assert_allclose(Yr, Y @ D.T, atol=1e-8)


@pytest.mark.parametrize("l1,l2,l3", [(1, 1, 0), (1, 1, 2), (2, 1, 1),
                                      (2, 2, 2), (0, 2, 2), (3, 2, 1)])
def test_coupling_equivariance(l1, l2, l3):
    """C must intertwine: C(D1 a, D2 b) = D3 C(a, b)."""
    C = coupling(l1, l2, l3)
    assert np.abs(C).max() > 0
    rng = np.random.RandomState(3)
    Q = random_rotation(rng)
    D1 = wigner_D_from_sh(l1, Q)
    D2 = wigner_D_from_sh(l2, Q)
    D3 = wigner_D_from_sh(l3, Q)
    a = rng.randn(2 * l1 + 1)
    b = rng.randn(2 * l2 + 1)
    lhs = np.einsum("abc,a,b->c", C, D1 @ a, D2 @ b)
    rhs = D3 @ np.einsum("abc,a,b->c", C, a, b)
    np.testing.assert_allclose(lhs, rhs, atol=1e-7)
    # normalization convention
    np.testing.assert_allclose((C ** 2).sum(), 2 * l3 + 1, rtol=1e-8)


def test_forbidden_couplings_zero():
    assert np.abs(coupling(1, 1, 1)).max() == 0  # l1+l2+l3 odd
    assert np.abs(coupling(0, 0, 2)).max() == 0  # triangle violation


def test_irreps_parse_and_dims():
    ir = Irreps.parse("8x0e+8x1o+8x2e")
    assert ir.dim == 8 * (1 + 3 + 5)
    assert ir.num_irreps == 24
    assert ir.count_l(1) == 8
    mid, ins = tp_instructions(
        Irreps.uniform(8, 1), Irreps.spherical(1), Irreps.spherical(1)
    )
    # paths: 0x0->0, 0x1->1, 1x0->1, 1x1->0, 1x1->2(excluded: not in target)
    ls = [mid.items[o][1] for (_, _, o) in ins]
    assert sorted(ls) == [0, 0, 1, 1]


def test_sh_pole_gradients_finite():
    """Regression: arctan2-based azimuth had a NaN gradient for edges along
    +-z (and the safe padding-edge constant IS unit-z); the Chebyshev
    formulation must have finite 1st- and 2nd-order grads at the poles."""
    import jax

    f = lambda u: jnp.sum(spherical_harmonics(3, u) ** 2)
    for vec in ([0.0, 0.0, 1.0], [0.0, 0.0, -1.0], [1e-8, 0.0, 1.0],
                [0.0, 0.0, 2.5]):
        x = jnp.asarray([vec])
        g1 = jax.grad(f)(x)
        g2 = jax.grad(lambda u: jnp.sum(jax.grad(f)(u) ** 2))(x)
        assert bool(jnp.isfinite(g1).all()), vec
        assert bool(jnp.isfinite(g2).all()), vec
