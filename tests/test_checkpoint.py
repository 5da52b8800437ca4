"""Checkpoint round-trip: train -> save -> load into fresh state ->
predictions match (ref: tests/test_model_loadpred.py:19-65)."""

import numpy as np
import jax
import pytest

from tests.test_models_forward import make_batch, make_cfg
from hydragnn_tpu.models.create import create_model
from hydragnn_tpu.train.optimizer import select_optimizer
from hydragnn_tpu.train.trainer import init_state, make_eval_step, make_train_step
from hydragnn_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def test_checkpoint_roundtrip(tmp_path):
    cfg = make_cfg("SAGE")
    model = create_model(cfg)
    batch = make_batch()
    opt = select_optimizer({"Optimizer": {"type": "AdamW",
                                          "learning_rate": 1e-2}})
    state = init_state(model, batch, opt)
    step = make_train_step(model, cfg, opt)
    for _ in range(5):
        state, loss, _ = step(state, batch, jax.random.PRNGKey(0))

    save_checkpoint(str(tmp_path), state, epoch=4)

    fresh = init_state(model, batch, opt, rng=jax.random.PRNGKey(42))
    restored = load_checkpoint(str(tmp_path), jax.device_get(fresh))

    ev = make_eval_step(model, cfg)
    _, _, p_trained = ev(state, batch)
    _, _, p_restored = ev(restored, batch)
    _, _, p_fresh = ev(fresh, batch)
    np.testing.assert_allclose(
        np.asarray(p_trained[0]), np.asarray(p_restored[0]), rtol=1e-6
    )
    assert not np.allclose(np.asarray(p_trained[0]), np.asarray(p_fresh[0]))
    # best symlink resolves
    restored2 = load_checkpoint(str(tmp_path), jax.device_get(fresh), epoch=None)
    np.testing.assert_allclose(
        np.asarray(ev(restored2, batch)[2][0]), np.asarray(p_trained[0]),
        rtol=1e-6,
    )
    # optimizer state travels too (continue-training support)
    s2, l2, _ = make_train_step(model, cfg, opt)(
        restored, batch, jax.random.PRNGKey(0)
    )
    assert np.isfinite(float(l2))
