"""Radial basis functions, cutoffs, envelopes (jnp, shape-static).

Equivalents of: PyG GaussianSmearing (SchNet), Bessel basis (DimeNet/PNAPlus;
ref: hydragnn/models/PNAPlusStack.py BesselBasisLayer), sinc expansion +
cosine cutoff (PAINN; ref: models/PAINNStack.py:322-340), MACE radial
(ref: utils/model/mace_utils/modules/radial.py:23-248).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def gaussian_smearing(
    dist: jnp.ndarray, start: float, stop: float, num_gaussians: int
) -> jnp.ndarray:
    """[E] -> [E, num_gaussians] (PyG GaussianSmearing). Offsets are numpy
    (static under jit tracing)."""
    import numpy as np

    offset = np.linspace(start, stop, num_gaussians)
    coeff = (
        -0.5 / float((offset[1] - offset[0]) ** 2)
        if num_gaussians > 1
        else -0.5
    )
    d = dist[:, None] - jnp.asarray(offset, dist.dtype)[None, :]
    return jnp.exp(coeff * d ** 2)


def envelope(x: jnp.ndarray, exponent: int) -> jnp.ndarray:
    """DimeNet smooth polynomial envelope u(x) on x in [0,1]
    (PyG dimenet Envelope)."""
    p = exponent + 1
    a = -(p + 1) * (p + 2) / 2.0
    b = p * (p + 2)
    c = -p * (p + 1) / 2.0
    xp = x ** (p - 1)
    return 1.0 / jnp.maximum(x, 1e-12) + a * xp + b * xp * x + c * xp * x * x


def bessel_basis(
    dist: jnp.ndarray,
    radius: float,
    num_radial: int,
    envelope_exponent: int = 5,
    freq: jnp.ndarray = None,
) -> jnp.ndarray:
    """[E] -> [E, num_radial]: envelope(d/c) * sin(freq*d/c)
    (PyG BesselBasisLayer; freq trainable, init n*pi)."""
    d = dist / radius
    if freq is None:
        freq = jnp.arange(1, num_radial + 1) * math.pi
    return envelope(d, envelope_exponent)[:, None] * jnp.sin(freq * d[:, None])


def cosine_cutoff(dist: jnp.ndarray, cutoff: float) -> jnp.ndarray:
    """0.5*(cos(pi*d/rc)+1) for d<rc else 0 (ref: PAINNStack.py:332-340)."""
    return jnp.where(
        dist < cutoff, 0.5 * (jnp.cos(jnp.pi * dist / cutoff) + 1.0), 0.0
    )


def sinc_expansion(dist: jnp.ndarray, edge_size: int, cutoff: float) -> jnp.ndarray:
    """sin(n*pi*d/rc)/d (ref: PAINNStack.py:322-330)."""
    n = jnp.arange(1, edge_size + 1)
    d = jnp.maximum(dist, 1e-12)
    return jnp.sin(n * jnp.pi * d[:, None] / cutoff) / d[:, None]


def shifted_softplus(x: jnp.ndarray) -> jnp.ndarray:
    """softplus(x) - log(2) (SchNet ShiftedSoftplus)."""
    return jax.nn.softplus(x) - math.log(2.0)


def polynomial_cutoff(dist: jnp.ndarray, cutoff: float, p: int = 6) -> jnp.ndarray:
    """MACE PolynomialCutoff (ref: mace_utils/modules/radial.py:118-148)."""
    x = dist / cutoff
    out = (
        1.0
        - ((p + 1.0) * (p + 2.0) / 2.0) * x ** p
        + p * (p + 2.0) * x ** (p + 1)
        - (p * (p + 1.0) / 2.0) * x ** (p + 2)
    )
    return out * (x < 1.0)


def mace_bessel_basis(
    dist: jnp.ndarray, radius: float, num_radial: int
) -> jnp.ndarray:
    """MACE BesselBasis: sqrt(2/c) * sin(n*pi*d/c)/d
    (ref: mace_utils/modules/radial.py:23-64)."""
    n = jnp.arange(1, num_radial + 1) * jnp.pi
    d = jnp.maximum(dist[:, None], 1e-12)
    pref = math.sqrt(2.0 / radius)
    return pref * jnp.sin(n * d / radius) / d


def chebyshev_basis(dist: jnp.ndarray, radius: float, num_radial: int) -> jnp.ndarray:
    """MACE ChebychevBasis: T_n(2d/c - 1) (ref: radial.py:66-92)."""
    x = 2.0 * dist / radius - 1.0
    x = jnp.clip(x, -1.0, 1.0)
    n = jnp.arange(1, num_radial + 1)
    return jnp.cos(n * jnp.arccos(x)[:, None])


def gaussian_basis_mace(
    dist: jnp.ndarray, radius: float, num_radial: int
) -> jnp.ndarray:
    """MACE GaussianBasis (ref: radial.py:94-116)."""
    return gaussian_smearing(dist, 0.0, radius, num_radial)


def agnesi_transform(
    dist: jnp.ndarray, a: float = 4.4570665, q: float = 0.9183580,
    p: float = 4.5791044,
) -> jnp.ndarray:
    """MACE AgnesiTransform (ref: radial.py:151-202), with Z-independent
    covalent-radius default r0=1 (per-species r0 handled by caller)."""
    r = jnp.maximum(dist, 1e-12)
    return 1.0 / (1.0 + a * r ** q / (1.0 + r ** (q - p)))


def soft_transform(dist: jnp.ndarray, alpha: float = 4.0) -> jnp.ndarray:
    """MACE SoftTransform (ref: radial.py:204-248) simplified form."""
    r = jnp.maximum(dist, 1e-12)
    return r + (1.0 / alpha) * jnp.log1p(jnp.exp(-alpha * (r - 1.0)))
