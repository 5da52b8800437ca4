"""Epoch-in-a-scan fast path matches the per-step loop numerically."""

import numpy as np
import jax

from tests.test_models_forward import make_batch, make_cfg
from hydragnn_tpu.models.create import create_model
from hydragnn_tpu.train.optimizer import select_optimizer
from hydragnn_tpu.train.trainer import (
    init_state,
    make_scan_train_epoch,
    make_train_step,
    stack_batches,
)


def test_scan_epoch_matches_step_loop():
    cfg = make_cfg("GIN")
    model = create_model(cfg)
    batches = [make_batch(seed=i) for i in range(4)]
    opt = select_optimizer({"Optimizer": {"type": "SGD",
                                          "learning_rate": 0.01}})
    state_a = init_state(model, batches[0], opt)
    state_b = jax.device_get(state_a)
    rng = jax.random.PRNGKey(0)

    step = make_train_step(model, cfg, opt)
    losses_a = []
    for b in batches:
        state_a, loss, _ = step(state_a, b, rng)
        losses_a.append(float(loss))

    epoch = make_scan_train_epoch(model, cfg, opt)
    state_b, losses_b = epoch(state_b, stack_batches(batches), rng)
    np.testing.assert_allclose(losses_a, np.asarray(losses_b), rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(state_a.params),
        jax.tree_util.tree_leaves(state_b.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-7)


def test_trainer_scan_chunk_and_bf16_options(tmp_path):
    """Training.scan_chunk + Training.mixed_precision through the full loop."""
    from tests.test_training_e2e import _prepare, _run

    config, train, val, test = _prepare(tmp_path, n_configs=60)
    config["NeuralNetwork"]["Training"]["scan_chunk"] = 2
    config["NeuralNetwork"]["Training"]["mixed_precision"] = "bf16"
    _run(config, train, val, test, "GIN", num_epoch=10, thresholds=(1.0, 1.0))


def test_scan_eval_matches_evaluate():
    """Chunked-scan evaluation reproduces the host-accumulated metrics."""
    from hydragnn_tpu.train.trainer import (
        evaluate,
        evaluate_scanned,
        make_eval_step,
        make_scan_eval_epoch,
    )

    cfg = make_cfg("GIN")
    model = create_model(cfg)
    batches = [make_batch(seed=i) for i in range(5)]  # 5 = 2 chunks + 1 rest
    opt = select_optimizer({"Optimizer": {"type": "SGD",
                                          "learning_rate": 0.01}})
    state = init_state(model, batches[0], opt)

    eval_step = make_eval_step(model, cfg)
    loss_a, tasks_a, rmse_a, mae_a = evaluate(batches, state, eval_step, cfg)
    scan_fn = make_scan_eval_epoch(model, cfg)
    loss_b, tasks_b, rmse_b, mae_b = evaluate_scanned(
        batches, state, scan_fn, chunk=2
    )
    np.testing.assert_allclose(loss_a, loss_b, rtol=1e-6)
    np.testing.assert_allclose(tasks_a, tasks_b, rtol=1e-6)
    np.testing.assert_allclose(rmse_a, rmse_b, rtol=1e-5)
    np.testing.assert_allclose(mae_a, mae_b, rtol=1e-5)


def test_stack_batches_harmonizes_window_hints():
    """Batches whose collate-time spmm_window hints differ must stack into
    one scan chunk: the weakest claim wins (-1 beats any width)."""
    batches = [make_batch(seed=i) for i in range(3)]
    b0, b1, b2 = batches
    stacked = stack_batches([
        b0.replace(spmm_window=160),
        b1.replace(spmm_window=512),
        b2.replace(spmm_window=512),
    ])
    assert stacked.spmm_window == 512
    assert stacked.x.shape[0] == 3
    stacked = stack_batches([
        b0.replace(spmm_window=160),
        b1.replace(spmm_window=-1),
        b2.replace(spmm_window=512),
    ])
    assert stacked.spmm_window == -1
    stacked = stack_batches([
        b0.replace(spmm_window=None),
        b1.replace(spmm_window=256),
        b2.replace(spmm_window=256),
    ])
    assert stacked.spmm_window == -1  # unknown anywhere -> no pin
