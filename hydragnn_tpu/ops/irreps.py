"""Minimal e3nn-equivalent for MACE (irreps, spherical harmonics, couplings).

Replaces the reference's e3nn dependency (ref: hydragnn/models/MACEStack.py:54,
utils/model/mace_utils/*). Scope: natural-parity irreps only (0e, 1o, 2e, ...
— the only kind HydraGNN's MACE constructs, ref: MACEStack create_irreps_string
and o3.Irreps.spherical_harmonics), which makes every allowed coupling
(l1, l2, l3 with l1+l2+l3 even) expressible through real Gaunt coefficients.

Consistency-by-construction: couplings are computed by numerical quadrature of
THIS module's real spherical harmonics (Gauss-Legendre x trapezoid, exact for
band-limited integrands), so the coupling tensors are exactly equivariant in
this basis regardless of component-order conventions. Normalized per path to
||C||^2 = 2*l3+1 (CG orthogonality convention).

Feature layout: e3nn-style flat [N, sum mul*(2l+1)], mul-major per irrep.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import re
from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


# --------------------------------------------------------------------- Irreps
@dataclasses.dataclass(frozen=True)
class Irreps:
    """Tuple of (mul, l); parity implicitly (-1)^l."""

    items: Tuple[Tuple[int, int], ...]

    @staticmethod
    def parse(s: str) -> "Irreps":
        items = []
        for part in s.replace(" ", "").split("+"):
            m = re.fullmatch(r"(?:(\d+)x)?(\d+)([eo])", part)
            if not m:
                raise ValueError(f"Cannot parse irrep {part!r}")
            mul = int(m.group(1) or 1)
            l = int(m.group(2))
            p = 1 if m.group(3) == "e" else -1
            if p != (-1) ** l:
                raise ValueError(
                    f"Only natural parity supported, got {part!r}"
                )
            items.append((mul, l))
        return Irreps(tuple(items))

    @staticmethod
    def scalars(mul: int) -> "Irreps":
        return Irreps(((mul, 0),))

    @staticmethod
    def spherical(lmax: int) -> "Irreps":
        return Irreps(tuple((1, l) for l in range(lmax + 1)))

    @staticmethod
    def uniform(mul: int, lmax: int) -> "Irreps":
        """create_irreps_string equivalent: mul x each l."""
        return Irreps(tuple((mul, l) for l in range(lmax + 1)))

    @property
    def dim(self) -> int:
        return sum(mul * (2 * l + 1) for mul, l in self.items)

    @property
    def num_irreps(self) -> int:
        return sum(mul for mul, _ in self.items)

    @property
    def lmax(self) -> int:
        return max(l for _, l in self.items)

    def count_l(self, l: int) -> int:
        return sum(mul for mul, ll in self.items if ll == l)

    def slices(self) -> List[slice]:
        out = []
        off = 0
        for mul, l in self.items:
            d = mul * (2 * l + 1)
            out.append(slice(off, off + d))
            off += d
        return out

    def simplify(self) -> "Irreps":
        acc = {}
        for mul, l in self.items:
            acc[l] = acc.get(l, 0) + mul
        return Irreps(tuple((acc[l], l) for l in sorted(acc)))

    def __add__(self, other: "Irreps") -> "Irreps":
        return Irreps(self.items + other.items)

    def __repr__(self):
        return "+".join(
            f"{mul}x{l}{'e' if l % 2 == 0 else 'o'}" for mul, l in self.items
        )


def split_flat(x: jnp.ndarray, irreps: Irreps) -> List[jnp.ndarray]:
    """Flat [N, dim] -> list of [N, mul, 2l+1]."""
    out = []
    for (mul, l), sl in zip(irreps.items, irreps.slices()):
        out.append(x[..., sl].reshape(x.shape[:-1] + (mul, 2 * l + 1)))
    return out


def merge_flat(parts: Sequence[jnp.ndarray]) -> jnp.ndarray:
    return jnp.concatenate(
        [p.reshape(p.shape[:-2] + (-1,)) for p in parts], axis=-1
    )


# ------------------------------------------------- real spherical harmonics
def _assoc_legendre_np(lmax: int, x: np.ndarray) -> np.ndarray:
    """P_l^m(x) for 0<=m<=l<=lmax, shape [..., lmax+1, lmax+1] ([l, m])."""
    shape = x.shape
    P = np.zeros(shape + (lmax + 1, lmax + 1))
    P[..., 0, 0] = 1.0
    somx2 = np.sqrt(np.maximum(1.0 - x * x, 0.0))
    for m in range(1, lmax + 1):
        P[..., m, m] = -(2 * m - 1) * somx2 * P[..., m - 1, m - 1]
    for m in range(lmax):
        P[..., m + 1, m] = (2 * m + 1) * x * P[..., m, m]
    for m in range(lmax + 1):
        for l in range(m + 2, lmax + 1):
            P[..., l, m] = (
                (2 * l - 1) * x * P[..., l - 1, m] - (l + m - 1) * P[..., l - 2, m]
            ) / (l - m)
    return P


def _sh_norms(lmax: int) -> np.ndarray:
    """Orthonormal real-SH normalization K_l^m."""
    K = np.zeros((lmax + 1, lmax + 1))
    for l in range(lmax + 1):
        for m in range(l + 1):
            K[l, m] = math.sqrt(
                (2 * l + 1)
                / (4 * math.pi)
                * math.factorial(l - m)
                / math.factorial(l + m)
            )
    return K


def real_sph_harm_np(lmax: int, vecs: np.ndarray) -> np.ndarray:
    """Component-normalized real SH of unit vectors [.., 3] -> [.., (lmax+1)^2].

    Order per l: m = -l..-1 (sine), 0, 1..l (cosine). Component normalization:
    sum_m Y_lm(n)^2 = 2l+1 (e3nn 'component'; orthonormal x sqrt(4 pi)).
    """
    x, y, z = vecs[..., 0], vecs[..., 1], vecs[..., 2]
    phi = np.arctan2(y, x)
    ct = np.clip(z, -1.0, 1.0)
    P = _assoc_legendre_np(lmax, ct)
    K = _sh_norms(lmax)
    out = np.zeros(vecs.shape[:-1] + ((lmax + 1) ** 2,))
    off = 0
    s4pi = math.sqrt(4.0 * math.pi)
    for l in range(lmax + 1):
        for m in range(-l, l + 1):
            am = abs(m)
            base = K[l, am] * P[..., l, am]
            if m < 0:
                val = math.sqrt(2.0) * base * np.sin(am * phi)
            elif m == 0:
                val = base
            else:
                val = math.sqrt(2.0) * base * np.cos(am * phi)
            out[..., off + m + l] = val * s4pi
        off += 2 * l + 1
    return out


def spherical_harmonics(
    lmax: int, vecs: jnp.ndarray, normalize: bool = True, eps: float = 1e-12
) -> jnp.ndarray:
    """jnp real SH (component normalization), same order as real_sph_harm_np."""
    if normalize:
        n = jnp.sqrt(jnp.sum(vecs * vecs, axis=-1, keepdims=True) + 1e-24)
        vecs = vecs / jnp.maximum(n, eps)
    x, y, z = vecs[..., 0], vecs[..., 1], vecs[..., 2]
    ct = jnp.clip(z, -1.0, 1.0)
    # Pole-safe azimuth: arctan2(y, x) has a NaN gradient at x = y = 0 (an
    # edge along +-z) and sqrt(1 - ct^2) an infinite one at |ct| = 1 — both
    # poison force training (grad-of-grad). Instead use sin(theta) = rho =
    # sqrt(x^2 + y^2 + tiny) and build cos/sin(m*phi) by Chebyshev recurrence
    # on (x/rho, y/rho): each harmonic is then a polynomial in x, y with
    # smooth derivatives everywhere (the rho^m from P[(m, m)] cancels the
    # 1/rho^m of the angle factors).
    rho = jnp.sqrt(x * x + y * y + 1e-24)
    c1, s1 = x / rho, y / rho
    cosm = [jnp.ones_like(ct), c1]
    sinm = [jnp.zeros_like(ct), s1]
    for m in range(2, lmax + 1):
        cosm.append(cosm[-1] * c1 - sinm[-1] * s1)
        sinm.append(sinm[-1] * c1 + cosm[-2] * s1)

    # associated Legendre via static recurrences
    P = {}
    P[(0, 0)] = jnp.ones_like(ct)
    somx2 = rho  # == sqrt(1 - ct^2) for unit vectors, minus the pole hazard
    for m in range(1, lmax + 1):
        P[(m, m)] = -(2 * m - 1) * somx2 * P[(m - 1, m - 1)]
    for m in range(lmax):
        P[(m + 1, m)] = (2 * m + 1) * ct * P[(m, m)]
    for m in range(lmax + 1):
        for l in range(m + 2, lmax + 1):
            P[(l, m)] = (
                (2 * l - 1) * ct * P[(l - 1, m)] - (l + m - 1) * P[(l - 2, m)]
            ) / (l - m)
    K = _sh_norms(lmax)
    s4pi = math.sqrt(4.0 * math.pi)
    cols = []
    for l in range(lmax + 1):
        for m in range(-l, l + 1):
            am = abs(m)
            base = K[l, am] * P[(l, am)]
            if m < 0:
                val = math.sqrt(2.0) * base * sinm[am]
            elif m == 0:
                val = base
            else:
                val = math.sqrt(2.0) * base * cosm[am]
            cols.append(val * s4pi)
    return jnp.stack(cols, axis=-1)


# ------------------------------------------------------------- couplings
@functools.lru_cache(maxsize=None)
def _quad_sh(lmax: int, n_theta: int = 24, n_phi: int = 49):
    """Quadrature nodes/weights + SH table for Gaunt integrals."""
    xs, ws = np.polynomial.legendre.leggauss(n_theta)
    phis = np.arange(n_phi) * (2 * np.pi / n_phi)
    ct = np.repeat(xs, n_phi)
    phi = np.tile(phis, n_theta)
    st = np.sqrt(1 - ct ** 2)
    vecs = np.stack(
        [st * np.cos(phi), st * np.sin(phi), ct], axis=-1
    )
    w = np.repeat(ws, n_phi) * (2 * np.pi / n_phi)
    Y = real_sph_harm_np(lmax, vecs)  # component-normalized
    return Y, w


@functools.lru_cache(maxsize=None)
def coupling(l1: int, l2: int, l3: int) -> np.ndarray:
    """Equivariant coupling tensor C[m1, m2, m3] for l1 (x) l2 -> l3 via real
    Gaunt integrals, normalized so sum C^2 = 2*l3+1. Zero tensor if the path
    is forbidden (triangle rule violated or l1+l2+l3 odd)."""
    d1, d2, d3 = 2 * l1 + 1, 2 * l2 + 1, 2 * l3 + 1
    if (
        l3 < abs(l1 - l2)
        or l3 > l1 + l2
        or (l1 + l2 + l3) % 2 == 1
    ):
        return np.zeros((d1, d2, d3))
    lmax = max(l1, l2, l3)
    Y, w = _quad_sh(lmax)
    sl = lambda l: slice(l * l, (l + 1) * (l + 1))
    Y1, Y2, Y3 = Y[:, sl(l1)], Y[:, sl(l2)], Y[:, sl(l3)]
    C = np.einsum("q,qa,qb,qc->abc", w, Y1, Y2, Y3)
    nrm = np.sqrt((C ** 2).sum())
    if nrm < 1e-12:
        return np.zeros((d1, d2, d3))
    return C / nrm * math.sqrt(d3)


def _rotation_D_np(l: int, R: np.ndarray) -> np.ndarray:
    """Real-SH Wigner matrix D_l(R) with Y_l(Rv) = D_l(R) Y_l(v), solved
    from SH evaluations on random unit vectors (exact to fp64 lstsq)."""
    rng = np.random.RandomState(29 + l)
    v = rng.randn(6 * l + 9, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    sl = slice(l * l, (l + 1) * (l + 1))
    Y = real_sph_harm_np(l, v)[:, sl]
    Yr = real_sph_harm_np(l, v @ R.T)[:, sl]
    Dt, *_ = np.linalg.lstsq(Y, Yr, rcond=None)
    return Dt.T


@functools.lru_cache(maxsize=None)
def coupling_w3j(l1: int, l2: int, l3: int) -> np.ndarray:
    """Real-basis SO(3) coupling tensor for ANY triangle-valid triple,
    including odd l1+l2+l3 (couplings through parity-flipped intermediates,
    which e3nn's wigner_3j provides and pure Gaunt integrals cannot — the
    reference's U-matrix basis uses them, mace_utils/tools/cg.py:44-91
    ``for ir_out in ir_left * ir`` with no parity-to-l tie). Even sums
    delegate to :func:`coupling` (identical numerics). Odd sums are solved
    from first principles as the 1-dimensional null space of the rotation-
    invariance constraint C = (D1 (x) D2 (x) D3) C over random rotations.
    Normalized sum C^2 = 2*l3+1; deterministic sign."""
    d1, d2, d3 = 2 * l1 + 1, 2 * l2 + 1, 2 * l3 + 1
    if l3 < abs(l1 - l2) or l3 > l1 + l2:
        return np.zeros((d1, d2, d3))
    if (l1 + l2 + l3) % 2 == 0:
        return coupling(l1, l2, l3)
    rows = []
    for seed in (101, 202, 303):
        rng = np.random.RandomState(seed)
        Q, _ = np.linalg.qr(rng.randn(3, 3))
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1.0
        K = np.kron(
            _rotation_D_np(l1, Q),
            np.kron(_rotation_D_np(l2, Q), _rotation_D_np(l3, Q)),
        )
        rows.append(K - np.eye(d1 * d2 * d3))
    A = np.concatenate(rows, axis=0)
    _, s, Vt = np.linalg.svd(A, full_matrices=False)
    null = Vt[s < s[0] * 1e-9]
    if null.shape[0] != 1:
        # no (or degenerate) intertwiner — should not happen for valid
        # triangles; treat as forbidden
        return np.zeros((d1, d2, d3))
    C = null[0].reshape(d1, d2, d3)
    C = C / np.sqrt((C ** 2).sum()) * math.sqrt(d3)
    flat = C.ravel()
    lead = flat[np.abs(flat) > 0.3 * np.abs(flat).max()][0]
    if lead < 0:
        C = -C
    return C


def tp_instructions(
    irreps1: Irreps, irreps2: Irreps, target: Irreps
) -> Tuple[Irreps, List[Tuple[int, int, int]]]:
    """'uvu' instruction list for TensorProduct (ref:
    hydragnn/utils/model/irreps_tools.py tp_out_irreps_with_instructions):
    every (i1, i2) pair whose product lands on an l present in target gets a
    path; output irreps keep multiplicity of irreps1 (uvu)."""
    target_ls = {l for _, l in target.items}
    out_items = []
    instructions = []  # (i1, i2, i_out)
    for i1, (mul1, l1) in enumerate(irreps1.items):
        for i2, (mul2, l2) in enumerate(irreps2.items):
            for l3 in range(abs(l1 - l2), l1 + l2 + 1):
                if (l1 + l2 + l3) % 2 == 1:
                    continue
                if l3 not in target_ls:
                    continue
                out_items.append((mul1, l3))
                instructions.append((i1, i2, len(out_items) - 1))
    return Irreps(tuple(out_items)), instructions
