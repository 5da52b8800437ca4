"""Model-output invariance under rigid rotation of positions (stronger form
of ref: tests/test_rotational_invariance.py:70-110, which checks edge-feature
invariance)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_models_forward import make_batch, make_cfg, _extra
from hydragnn_tpu.models.create import create_model

GEOMETRIC = ["SchNet", "EGNN", "PAINN", "PNAEq", "DimeNet", "MACE", "PNAPlus"]


def rotation(seed=0):
    rng = np.random.RandomState(seed)
    Q, R = np.linalg.qr(rng.randn(3, 3))
    Q = Q * np.sign(np.diag(R))
    if np.linalg.det(Q) < 0:
        Q[:, 0] = -Q[:, 0]
    return Q.astype(np.float32)


@pytest.mark.parametrize("mpnn_type", GEOMETRIC)
def test_output_rotation_invariance(mpnn_type):
    kw = _extra(mpnn_type)
    if mpnn_type in ("PNAEq",):
        kw["pna_deg"] = (0, 0, 0, 10)
    cfg = make_cfg(mpnn_type, **kw)
    model = create_model(cfg)
    batch = make_batch()
    if mpnn_type == "MACE":
        rng = np.random.RandomState(0)
        batch = batch.replace(
            x=jnp.asarray(rng.randint(1, 10, (batch.num_nodes, 1)).astype(np.float32))
        )
    v = model.init(jax.random.PRNGKey(0), batch, train=False)
    out1 = model.apply(v, batch, train=False)[0]
    Q = rotation()
    b2 = batch.replace(pos=batch.pos @ jnp.asarray(Q.T))
    out2 = model.apply(v, b2, train=False)[0]
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(out2), rtol=1e-4, atol=1e-5
    )


def test_normalize_rotation_pipeline(tmp_path):
    """rotational_invariance config flag: the PCA-frame normalization makes
    edge-geometry features identical for rotated copies of a structure
    (ref: tests/test_rotational_invariance.py:70-110)."""
    from hydragnn_tpu.data.transforms import normalize_rotation
    from hydragnn_tpu.graph import GraphSample
    from hydragnn_tpu.data.neighbors import edge_lengths

    rng = np.random.RandomState(3)
    n = 12
    pos = rng.randn(n, 3).astype(np.float32)
    ei = np.stack([rng.randint(0, n, 30), rng.randint(0, n, 30)])
    s1 = GraphSample(x=rng.randn(n, 1).astype(np.float32), pos=pos,
                     edge_index=ei)
    Q = rotation(7)
    s2 = GraphSample(x=s1.x, pos=pos @ Q.T, edge_index=ei)
    n1 = normalize_rotation(s1)
    n2 = normalize_rotation(s2)
    # PCA frame is sign-ambiguous per axis; compare rotation-invariant
    # quantities: edge lengths and |coordinates| spectra
    np.testing.assert_allclose(
        edge_lengths(n1.pos, ei), edge_lengths(n2.pos, ei), atol=1e-4
    )
    np.testing.assert_allclose(
        np.sort(np.abs(n1.pos), axis=0), np.sort(np.abs(n2.pos), axis=0),
        atol=1e-4,
    )
