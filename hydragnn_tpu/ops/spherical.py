"""Spherical Bessel / harmonic basis for DimeNet (jnp).

Equivalent of PyG's sympy-codegen'd ``SphericalBasisLayer`` (used at ref:
hydragnn/models/DIMEStack.py:71-74): the 2D directional basis
  a_{ln}(d, alpha) = sqrt(2 / (c^3 j_{l+1}(z_{ln})^2)) * j_l(z_{ln} d/c) * Y_l0(alpha)
with z_{ln} the n-th positive zero of the spherical Bessel function j_l.
Zeros are found once (host numpy, bisection+Newton); evaluation is pure jnp
with upward recurrences (static loop bounds -> fuses fine under XLA).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _spherical_jn_np(l: int, x: np.ndarray) -> np.ndarray:
    """numpy j_l via upward recurrence (stable for x > l)."""
    x = np.asarray(x, np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        j0 = np.where(x != 0, np.sin(x) / x, 1.0)
        if l == 0:
            return j0
        j1 = np.where(x != 0, np.sin(x) / x**2 - np.cos(x) / x, 0.0)
        if l == 1:
            return j1
        jm, jc = j0, j1
        for n in range(1, l):
            jn = (2 * n + 1) / x * jc - jm
            jm, jc = jc, jn
        return jc


@functools.lru_cache(maxsize=None)
def spherical_bessel_zeros(num_spherical: int, num_radial: int) -> np.ndarray:
    """z[l, n] = (n+1)-th positive zero of j_l, via interlacing + bisection."""
    # j_0 zeros: k*pi. Need enough zeros of each order for interlacing.
    n_need = num_radial + num_spherical + 5
    zeros = np.zeros((num_spherical, n_need))
    zeros[0] = np.arange(1, n_need + 1) * np.pi
    for l in range(1, num_spherical):
        for n in range(n_need - l):
            lo, hi = zeros[l - 1, n], zeros[l - 1, n + 1]
            f = lambda x: _spherical_jn_np(l, np.array([x]))[0]
            flo = f(lo + 1e-9)
            for _ in range(80):
                mid = 0.5 * (lo + hi)
                fm = f(mid)
                if flo * fm <= 0:
                    hi = mid
                else:
                    lo = mid
                    flo = fm
            zeros[l, n] = 0.5 * (lo + hi)
    return zeros[:, :num_radial].copy()


def _spherical_jn_jnp(l_max: int, x: jnp.ndarray) -> jnp.ndarray:
    """j_l(x) for l = 0..l_max, stacked on the last axis. x > 0 assumed.

    x is clamped to >= 1e-2: the upward recurrence's (2n+1)/x factor
    overflows fp32 near x ~ 1e-12 (padding edges have zero length); j_l(1e-2)
    is ~x^l/(2l+1)!! ~ 0, and physical edges sit far above the clamp."""
    x = jnp.maximum(x, 1e-2)
    j0 = jnp.sin(x) / x
    outs = [j0]
    if l_max >= 1:
        j1 = jnp.sin(x) / x**2 - jnp.cos(x) / x
        outs.append(j1)
        jm, jc = j0, j1
        for n in range(1, l_max):
            jn = (2 * n + 1) / x * jc - jm
            outs.append(jn)
            jm, jc = jc, jn
    return jnp.stack(outs, axis=-1)


def _legendre_p_l0(l_max: int, cos_t: jnp.ndarray) -> jnp.ndarray:
    """P_l(cos_t) for l = 0..l_max, stacked last axis (Bonnet recurrence)."""
    p0 = jnp.ones_like(cos_t)
    outs = [p0]
    if l_max >= 1:
        p1 = cos_t
        outs.append(p1)
        pm, pc = p0, p1
        for n in range(1, l_max):
            pn = ((2 * n + 1) * cos_t * pc - n * pm) / (n + 1)
            outs.append(pn)
            pm, pc = pc, pn
    return jnp.stack(outs, axis=-1)


def spherical_radial(
    dist: jnp.ndarray,  # [E] edge lengths
    num_spherical: int,
    num_radial: int,
    cutoff: float,
    envelope_exponent: int = 5,
) -> jnp.ndarray:
    """Per-EDGE radial factor of the 2-D basis: normalized, enveloped
    j_l(z_ln d/c). Returns [E, S, R] in the input dtype.

    Evaluated in fp32 regardless of compute dtype: the upward j_l
    recurrence amplifies rounding by ~prod((2n+1)/x) at small x, which in
    bf16 is garbage at any realistic edge length. Degenerate lengths
    (zero-length PADDING edges, whose x clamps to the recurrence's blowup
    region and reaches ~1e19) are zeroed — the reference has no padding
    edges at all, so this is semantics-neutral."""
    from hydragnn_tpu.ops.radial import envelope

    out_dtype = dist.dtype
    dist = dist.astype(jnp.float32)
    zeros = spherical_bessel_zeros(num_spherical, num_radial)  # [S, R] np
    d = dist / cutoff  # [E]
    x = d[:, None, None] * jnp.asarray(zeros)[None, :, :]  # [E, S, R]
    jl_all = _spherical_jn_jnp(num_spherical - 1, x)  # [E, S, R, S]
    # pick order l for row l
    l_idx = jnp.arange(num_spherical)
    jl = jl_all[:, l_idx, :, l_idx]  # [S, E, R] (advanced indexing moves axis)
    jl = jnp.moveaxis(jl, 0, 1)  # [E, S, R]
    # normalization sqrt(2 / (c^3 j_{l+1}(z_ln)^2))
    norm = np.sqrt(
        2.0
        / (
            cutoff ** 3
            * _spherical_jn_np_batch(num_spherical, zeros) ** 2
        )
    )  # [S, R]
    rbf = jl * jnp.asarray(norm)[None]  # [E, S, R]
    rbf = rbf * envelope(d, envelope_exponent)[:, None, None]
    rbf = jnp.where(dist[:, None, None] > 1e-6, rbf, 0.0)
    return rbf.astype(out_dtype)


def angular_basis(angle: jnp.ndarray, num_spherical: int) -> jnp.ndarray:
    """Per-TRIPLET angular factor Y_l0(angle). Returns [T, S]."""
    pl_ = _legendre_p_l0(num_spherical - 1, jnp.cos(angle))  # [T, S]
    y_norm = np.sqrt((2 * np.arange(num_spherical) + 1) / (4 * np.pi))
    return pl_ * jnp.asarray(y_norm)[None]


def spherical_basis(
    dist: jnp.ndarray,  # [E] edge lengths
    angle: jnp.ndarray,  # [T] triplet angles
    idx_kj: jnp.ndarray,  # [T] edge index per triplet
    num_spherical: int,
    num_radial: int,
    cutoff: float,
    envelope_exponent: int = 5,
) -> jnp.ndarray:
    """Returns sbf [T, num_spherical * num_radial].

    Composed reference form (T-scale ``rbf[idx_kj]`` gather). The DimeNet
    stack instead gathers the radial part through the E-scale slot tables
    (models/dimenet.py slot_gather) — same values, 16x fewer gather rows."""
    rbf = spherical_radial(
        dist, num_spherical, num_radial, cutoff, envelope_exponent
    )
    cbf = angular_basis(angle, num_spherical)
    out = rbf[idx_kj] * cbf[:, :, None]  # [T, S, R]
    return out.reshape(out.shape[0], num_spherical * num_radial)


def _spherical_jn_np_batch(num_spherical: int, zeros: np.ndarray) -> np.ndarray:
    """j_{l+1}(z_{l,n}) for each l, n."""
    out = np.zeros_like(zeros)
    for l in range(num_spherical):
        out[l] = _spherical_jn_np(l + 1, zeros[l])
    return out
