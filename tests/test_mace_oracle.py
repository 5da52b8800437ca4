"""MACE numerical cross-checks against hand-built dense oracles (numpy).

e3nn is not installed in this image, so the oracle chain is built from first
principles instead of from e3nn outputs:

1. ``coupling(l1,l2,l3)`` must equal the GAUNT INTEGRAL of the real
   spherical harmonics, computed by Gauss-Legendre x uniform-phi quadrature
   (the SH themselves are verified component-normalized and
   rotation-equivariant in tests/test_irreps.py). This pins the CG tensors
   to their defining property — not to the code that generated them.
2. ``TensorProductConv`` (the uvu TP with per-edge weights,
   ref: mace_utils/modules/blocks.py:301-311) must match a dense numpy
   contraction that uses the QUADRATURE-DERIVED coupling tensors.
3. ``InteractionBlock`` (RealAgnosticAttResidual, ref: blocks.py:286-385)
   end-to-end: IrrepsLinear mixing, per-edge weight MLP, TP conv, scatter,
   1/avg_num_neighbors — all mirrored in numpy with copied parameters.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hydragnn_tpu.ops.irreps import (
    Irreps,
    coupling,
    real_sph_harm_np,
    tp_instructions,
)


def _quadrature_gaunt(l1, l2, l3, n_theta=64, n_phi=129):
    """C_quad[m1,m2,m3] = (1/4pi) * Int Y_l1m1 Y_l2m2 Y_l3m3 dOmega with
    component-normalized real SH, by Gauss-Legendre (cos theta) x uniform
    phi quadrature — exact for band-limited integrands at these orders."""
    ct, wt = np.polynomial.legendre.leggauss(n_theta)
    phi = np.linspace(0.0, 2 * np.pi, n_phi, endpoint=False)
    st = np.sqrt(1.0 - ct**2)
    # grid of unit vectors [n_theta, n_phi, 3]
    v = np.stack(
        [
            st[:, None] * np.cos(phi)[None, :],
            st[:, None] * np.sin(phi)[None, :],
            np.broadcast_to(ct[:, None], (n_theta, n_phi)),
        ],
        axis=-1,
    ).reshape(-1, 3)
    lmax = max(l1, l2, l3)
    Y = real_sph_harm_np(lmax, v)  # [P, (lmax+1)^2]
    Y1 = Y[:, l1 * l1 : (l1 + 1) * (l1 + 1)]
    Y2 = Y[:, l2 * l2 : (l2 + 1) * (l2 + 1)]
    Y3 = Y[:, l3 * l3 : (l3 + 1) * (l3 + 1)]
    w = (wt[:, None] * np.full((1, n_phi), 2 * np.pi / n_phi)).reshape(-1)
    w = w / (4 * np.pi)
    return np.einsum("p,pa,pb,pc->abc", w, Y1, Y2, Y3)


def _quad_coupling(l1, l2, l3):
    """Quadrature Gaunt tensor renormalized to sum C^2 = 2*l3+1 (the
    module's convention), sign-aligned to the module's choice."""
    G = _quadrature_gaunt(l1, l2, l3)
    nrm = np.sqrt((G**2).sum())
    if nrm < 1e-10:
        return np.zeros_like(G)
    C = G / nrm * math.sqrt(2 * l3 + 1)
    Cmod = coupling(l1, l2, l3)
    if np.sum(C * Cmod) < 0:
        C = -C
    return C


@pytest.mark.parametrize(
    "l1,l2,l3",
    [(0, 0, 0), (1, 1, 0), (1, 1, 2), (2, 1, 1), (2, 2, 2), (3, 2, 1),
     (2, 2, 0)],
)
def test_coupling_matches_gaunt_quadrature(l1, l2, l3):
    C = coupling(l1, l2, l3)
    Cq = _quad_coupling(l1, l2, l3)
    np.testing.assert_allclose(C, Cq, rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("l1,l2,l3", [(1, 1, 1), (2, 1, 2), (1, 0, 0)])
def test_coupling_forbidden_paths_are_zero(l1, l2, l3):
    """Odd l1+l2+l3 (parity-forbidden for natural-parity irreps) and
    triangle-rule violations must vanish — and their Gaunt integrals do."""
    if (l1 + l2 + l3) % 2 == 1 or l3 < abs(l1 - l2) or l3 > l1 + l2:
        np.testing.assert_allclose(coupling(l1, l2, l3), 0.0, atol=1e-12)
        np.testing.assert_allclose(
            _quadrature_gaunt(l1, l2, l3), 0.0, atol=1e-10
        )


def _np_split(x, irreps):
    out = []
    off = 0
    for mul, l in irreps.items:
        d = mul * (2 * l + 1)
        out.append(x[..., off : off + d].reshape(
            x.shape[:-1] + (mul, 2 * l + 1)
        ))
        off += d
    return out


def test_tensor_product_conv_matches_dense_numpy():
    """uvu TP with external weights == dense numpy contraction over the
    quadrature-derived coupling tensors."""
    from hydragnn_tpu.models.mace import TensorProductConv

    irreps1 = Irreps(((2, 0), (3, 1), (2, 2)))
    irreps2 = Irreps.spherical(2)
    target = Irreps(((2, 0), (2, 1), (2, 2)))
    tp = TensorProductConv(irreps1, irreps2, target)
    irreps_mid, instructions = tp_instructions(irreps1, irreps2, target)
    weight_numel = sum(irreps1.items[i1][0] for (i1, _, _) in instructions)

    rng = np.random.RandomState(0)
    E = 7
    x = rng.randn(E, irreps1.dim).astype(np.float32)
    vec = rng.randn(E, 3)
    vec /= np.linalg.norm(vec, axis=-1, keepdims=True)
    y = real_sph_harm_np(2, vec).astype(np.float32)

    variables = tp.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(y),
        jnp.zeros((E, weight_numel)),
    )
    w = rng.randn(E, weight_numel).astype(np.float32)
    out = np.asarray(
        tp.apply(variables, jnp.asarray(x), jnp.asarray(y), jnp.asarray(w))
    )

    xs = _np_split(x, irreps1)
    ys = _np_split(y, irreps2)
    outs = []
    w_off = 0
    for (i1, i2, io) in instructions:
        mul1, l1 = irreps1.items[i1]
        _, l2 = irreps2.items[i2]
        _, l3 = irreps_mid.items[io]
        C = _quad_coupling(l1, l2, l3)
        wi = w[:, w_off : w_off + mul1]
        w_off += mul1
        o = np.einsum(
            "abc,eua,eb,eu->euc", C, xs[i1], ys[i2][:, 0, :], wi
        )
        outs.append(o.reshape(E, -1))
    want = np.concatenate(outs, axis=-1)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_interaction_block_matches_dense_numpy():
    """Full RealAgnosticAttResidual interaction: message + skip connection
    vs a numpy mirror (copied params, quadrature CG)."""
    from tests.test_models_forward import make_batch
    from hydragnn_tpu.models.mace import InteractionBlock

    batch = make_batch(n_graphs=2, n=5, deg=3, in_dim=4, seed=1)
    N = batch.num_nodes
    rng = np.random.RandomState(2)
    node_irreps = Irreps(((4, 0),))  # first layer: scalar node feats
    sh_irreps = Irreps.spherical(2)
    hidden = Irreps(((4, 0), (4, 1)))
    target = Irreps(((4, 0), (4, 1), (4, 2)))
    n_edge_feats = 5

    node_feats = rng.randn(N, node_irreps.dim).astype(np.float32)
    pos = np.asarray(batch.pos)
    sa, ra = np.asarray(batch.senders), np.asarray(batch.receivers)
    vec = pos[ra] - pos[sa]
    nrm = np.maximum(np.linalg.norm(vec, axis=-1, keepdims=True), 1e-9)
    edge_attrs = real_sph_harm_np(2, vec / nrm).astype(np.float32)
    edge_feats = rng.randn(batch.num_edges, n_edge_feats).astype(np.float32)

    block = InteractionBlock(
        node_feats_irreps=node_irreps,
        edge_attrs_irreps=sh_irreps,
        num_edge_feats=n_edge_feats,
        target_irreps=target,
        hidden_irreps=hidden,
        avg_num_neighbors=3.0,
    )
    variables = block.init(
        jax.random.PRNGKey(3), jnp.asarray(node_feats), batch,
        jnp.asarray(edge_attrs), jnp.asarray(edge_feats),
    )
    msg, sc = block.apply(
        variables, jnp.asarray(node_feats), batch,
        jnp.asarray(edge_attrs), jnp.asarray(edge_feats),
    )
    p = jax.tree_util.tree_map(np.asarray, variables["params"])

    def irreps_linear(pp, x, irr_in, irr_out):
        xs = _np_split(x, irr_in)
        outs = []
        for oi, (mul_out, l_out) in enumerate(irr_out.items):
            acc = None
            n_in = 0
            for (mul_in, l_in), xp in zip(irr_in.items, xs):
                if l_in != l_out:
                    continue
                w = pp[f"w_{oi}_{n_in}"]
                y = np.einsum("...ui,uv->...vi", xp, w) / math.sqrt(mul_in)
                acc = y if acc is None else acc + y
                n_in += 1
            if acc is None:
                acc = np.zeros(x.shape[:-1] + (mul_out, 2 * l_out + 1),
                               np.float32)
            elif n_in > 1:
                acc = acc / math.sqrt(n_in)
            outs.append(acc.reshape(x.shape[:-1] + (-1,)))
        return np.concatenate(outs, axis=-1)

    n_sc = hidden.count_l(0)
    down_irreps = Irreps.scalars(n_sc)
    sc_np = irreps_linear(p["skip_linear"], node_feats, node_irreps, hidden)
    h_up = irreps_linear(p["linear_up"], node_feats, node_irreps, node_irreps)
    h_down = irreps_linear(
        p["linear_down"], node_feats, node_irreps, down_irreps
    )

    em = np.asarray(batch.edge_mask)
    aug = np.concatenate([edge_feats, h_down[sa], h_down[ra]], axis=-1)

    def silu(v):
        return v / (1.0 + np.exp(-v))

    mlp = p["MLP_0"]
    h = aug
    keys = sorted(mlp.keys(), key=lambda k: int(k.split("_")[-1]))
    for i, k in enumerate(keys):
        h = h @ mlp[k]["kernel"] + mlp[k]["bias"]
        if i < len(keys) - 1:
            h = silu(h)
    tp_w = h

    irreps_mid, instructions = tp_instructions(node_irreps, sh_irreps, target)
    xs = _np_split(h_up[sa], node_irreps)
    ys = _np_split(edge_attrs, sh_irreps)
    outs = []
    w_off = 0
    for (i1, i2, io) in instructions:
        mul1, l1 = node_irreps.items[i1]
        _, l2 = sh_irreps.items[i2]
        _, l3 = irreps_mid.items[io]
        C = _quad_coupling(l1, l2, l3)
        wi = tp_w[:, w_off : w_off + mul1]
        w_off += mul1
        o = np.einsum("abc,eua,eb,eu->euc", C, xs[i1], ys[i2][:, 0, :], wi)
        outs.append(o.reshape(len(sa), -1))
    mji = np.concatenate(outs, axis=-1) * em[:, None]
    message = np.zeros((N, mji.shape[-1]), np.float32)
    np.add.at(message, ra, mji)
    message = irreps_linear(
        p["linear"], message, irreps_mid.simplify(), target
    ) / 3.0

    np.testing.assert_allclose(
        np.asarray(msg), message, rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(sc), sc_np, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Symmetric-contraction span equivalence (VERDICT r2 item 9)
# ---------------------------------------------------------------------------
#
# The reference's SymmetricContraction (symmetric_contraction.py:29-92)
# parametrizes, per channel and element, the space of O(3)-equivariant
# maps Sym^nu(V) -> W_lout via e3nn's U_matrix_real basis (tools/cg.py:94).
# Our SymmetricProduct parametrizes left-associated iterated-CG trees
# (models/mace.py symmetric_product_paths). The tests below verify, from
# first principles (no e3nn): the ENTIRE intertwiner space
# Hom_O(3)(Sym^3(V), W_lout) — computed numerically as the null space of
# equivariance constraints under random rotations + inversion — is
# contained in the span of our degree-3 path functions, and the two spaces
# have EQUAL dimension. Since e3nn's U-matrix functions are a basis of
# exactly that intertwiner space, span equality follows.


def _wigner_block(l, R):
    """D_l(R) for component-normalized real SH via Y(Rv) = D Y(v)."""
    rng = np.random.RandomState(l + 7)
    v = rng.randn(4 * l + 8, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    Y = real_sph_harm_np(l, v)[:, l * l:(l + 1) * (l + 1)]
    Yr = real_sph_harm_np(l, v @ R.T)[:, l * l:(l + 1) * (l + 1)]
    D, *_ = np.linalg.lstsq(Y, Yr, rcond=None)
    return D.T


def _rep(ls, R):
    import scipy.linalg as sla  # noqa: F401 (block_diag below is numpy)

    blocks = [_wigner_block(l, R) for l in ls]
    n = sum(b.shape[0] for b in blocks)
    out = np.zeros((n, n))
    o = 0
    for b in blocks:
        d = b.shape[0]
        out[o:o + d, o:o + d] = b
        o += d
    return out


def _random_rotation(seed):
    rng = np.random.RandomState(seed)
    A = rng.randn(3, 3)
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Q


def _intertwiner_space(ls_in, l_out, degree=3, seed=0):
    """Numerical basis of Hom_O(3)(Sym^degree(V), W_lout): solve
    T e(g x) = D_out(g) T e(x) for monomial-coefficient matrices T."""
    dim_in = sum(2 * l + 1 for l in ls_in)
    dim_out = 2 * l_out + 1
    from itertools import combinations_with_replacement

    monos = list(combinations_with_replacement(range(dim_in), degree))
    M = len(monos)

    def e(x):  # [P, dim_in] -> [P, M] monomials
        cols = [np.prod(x[:, list(m)], axis=1) for m in monos]
        return np.stack(cols, axis=1)

    rng = np.random.RandomState(seed)
    X = rng.randn(60, dim_in)
    rows = []
    gs = [_random_rotation(s) for s in (1, 2, 3)]
    for g, par in [(g, False) for g in gs] + [(np.eye(3), True)]:
        Din = _rep(ls_in, g)
        Dout = _wigner_block(l_out, g)
        if par:  # inversion: components of l pick up (-1)^l
            Din = Din @ _parity(ls_in)
            Dout = Dout * ((-1.0) ** l_out)
        EX = e(X)           # [P, M]
        EgX = e(X @ Din.T)  # [P, M]
        # constraint per sample p, output row i: sum_m T[i,m] e(gx)_m -
        # sum_{j,m} Dout[i,j] T[j,m] e(x)_m = 0; unknown T flattened
        # row-major as (j, m) to match the reshape below
        A = (
            np.einsum("pm,ij->pijm", EgX, np.eye(dim_out))
            - np.einsum("pm,ij->pijm", EX, Dout)
        ).reshape(len(X) * dim_out, dim_out * M)
        rows.append(A)
    A = np.concatenate(rows, axis=0)
    _, s, Vt = np.linalg.svd(A, full_matrices=True)
    null = Vt[s.shape[0]:].tolist()  # rows beyond rank if A is wide
    tol = max(s) * 1e-9
    null = [Vt[i] for i in range(len(s)) if s[i] < tol] + [
        Vt[i] for i in range(len(s), Vt.shape[0])
    ]
    Ts = [np.asarray(v).reshape(dim_out, M) for v in null]
    return Ts, monos, e


def _parity(ls):
    d = []
    for l in ls:
        d += [(-1.0) ** l] * (2 * l + 1)
    return np.diag(d)


@pytest.mark.parametrize("l_out", [0, 1, 2])
def test_symmetric_product_spans_u_matrix_space(l_out):
    from hydragnn_tpu.models.mace import (
        _apply_path,
        symmetric_product_paths,
    )

    ls_in = [0, 1, 2]
    Ts, monos, e = _intertwiner_space(ls_in, l_out, degree=3)
    assert len(Ts) > 0  # the intertwiner space is non-trivial

    # evaluate intertwiner functions + our degree-3 path functions on
    # fresh samples
    rng = np.random.RandomState(99)
    Q = 80
    X = rng.randn(Q, 9)
    EX = e(X)
    targets = [EX @ T.T for T in Ts]  # [Q, dim_out] each

    paths = symmetric_product_paths(ls_in, [l_out], 3)[l_out]
    order3 = [p for p in paths if len(p[0]) == 3 and len(p) == 2]
    xs = {
        0: jnp.asarray(X[:, None, 0:1]),
        1: jnp.asarray(X[:, None, 1:4]),
        2: jnp.asarray(X[:, None, 4:9]),
    }
    B = np.stack(
        [
            np.asarray(_apply_path(p, xs, jnp.float64))[:, 0, :]
            for p in order3
        ],
        axis=-1,
    )  # [Q, dim_out, n_paths]
    Bm = B.reshape(Q * (2 * l_out + 1), -1)

    # (1) every intertwiner lies in our span: relative residual ~ 0
    for j, t in enumerate(targets):
        tv = t.reshape(-1)
        coef, res, *_ = np.linalg.lstsq(Bm, tv, rcond=None)
        rel = np.linalg.norm(Bm @ coef - tv) / np.linalg.norm(tv)
        assert rel < 5e-6, (j, rel)

    # (2) dimension equality: our path functions span EXACTLY the
    # intertwiner space. B is evaluated in fp32, so dependent columns
    # leave relative singular values ~1e-7 while independent ones sit
    # ~0.3 — a 1e-4 relative cut separates them cleanly.
    sv = np.linalg.svd(Bm, compute_uv=False)
    rank = int(np.sum(sv > sv[0] * 1e-4))
    assert rank == len(Ts), (rank, len(Ts))


def test_symmetric_product_mixed_orders_span():
    """Degrees 1 and 2 (MACE sums contractions of every order <= nu):
    the order-1/order-2 path functions span the degree-1/degree-2
    intertwiner spaces as well."""
    from hydragnn_tpu.models.mace import (
        _apply_path,
        symmetric_product_paths,
    )

    ls_in = [0, 1, 2]
    rng = np.random.RandomState(5)
    Q = 60
    X = rng.randn(Q, 9)
    xs = {
        0: jnp.asarray(X[:, None, 0:1]),
        1: jnp.asarray(X[:, None, 1:4]),
        2: jnp.asarray(X[:, None, 4:9]),
    }
    for l_out in (0, 1, 2):
        for degree in (1, 2):
            Ts, monos, e = _intertwiner_space(ls_in, l_out, degree=degree)
            if not Ts:
                continue
            EX = e(X)
            paths = symmetric_product_paths(ls_in, [l_out], 3)[l_out]
            sel = [
                p for p in paths
                if (degree == 1 and len(p[0]) == 1)
                or (degree == 2 and len(p[0]) == 3 and len(p) == 1)
            ]
            assert sel, (l_out, degree)
            B = np.stack(
                [
                    np.asarray(_apply_path(p, xs, jnp.float64))[:, 0, :]
                    for p in sel
                ],
                axis=-1,
            ).reshape(Q * (2 * l_out + 1), -1)
            for T in Ts:
                tv = (EX @ T.T).reshape(-1)
                coef, *_ = np.linalg.lstsq(B, tv, rcond=None)
                rel = np.linalg.norm(B @ coef - tv) / np.linalg.norm(tv)
                assert rel < 5e-6, (l_out, degree, rel)
