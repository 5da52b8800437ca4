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
