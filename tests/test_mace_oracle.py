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
