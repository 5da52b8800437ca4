"""Option sweeps: losses, activations, optimizers, radial types, norms
(ref: tests/test_loss_and_activation_functions.py:104-137,
tests/test_optimizer.py:99-110, tests/test_radial_transforms.py:188-194)."""

import numpy as np
import jax
import pytest

from tests.test_models_forward import make_batch, make_cfg, _extra
from hydragnn_tpu.models.create import create_model
from hydragnn_tpu.train.optimizer import select_optimizer
from hydragnn_tpu.train.trainer import init_state, make_train_step


def _one_step(cfg, opt_type="AdamW"):
    model = create_model(cfg)
    batch = make_batch()
    if cfg.mpnn_type == "MACE":
        rng = np.random.RandomState(0)
        batch = batch.replace(
            x=np.asarray(rng.randint(1, 9, (batch.num_nodes, 1)), np.float32)
        )
    opt = select_optimizer({"Optimizer": {"type": opt_type,
                                          "learning_rate": 1e-3}})
    state = init_state(model, batch, opt)
    step = make_train_step(model, cfg, opt)
    state, loss, _ = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss)), (cfg.mpnn_type, opt_type, float(loss))
    return float(loss)


@pytest.mark.parametrize("loss_fn", ["mse", "mae", "rmse", "smooth_l1",
                                     "GaussianNLLLoss"])
def test_loss_functions(loss_fn):
    cfg = make_cfg("GIN", loss_function_type=loss_fn)
    _one_step(cfg)


@pytest.mark.parametrize("act", ["relu", "selu", "prelu", "elu", "lrelu_01",
                                 "lrelu_025", "lrelu_05", "sigmoid"])
def test_activation_functions(act):
    cfg = make_cfg("SAGE", activation=act)
    _one_step(cfg)


@pytest.mark.parametrize("opt", ["SGD", "Adam", "Adadelta", "Adagrad",
                                 "Adamax", "AdamW", "RMSprop", "FusedLAMB"])
def test_optimizers(opt):
    cfg = make_cfg("GIN")
    _one_step(cfg, opt)


@pytest.mark.parametrize("radial_type", ["bessel", "chebyshev", "gaussian"])
def test_mace_radial_types(radial_type):
    cfg = make_cfg("MACE", radial_type=radial_type, **_extra("MACE"))
    _one_step(cfg)


def test_vector_output_head():
    """3-dim node output (ref: ci_vectoroutput.json)."""
    cfg = make_cfg("EGNN", output_type=("node",), output_dim=(3,),
                   **_extra("EGNN") if False else {})
    _one_step(cfg)


def test_conv_node_head():
    """conv-type node decoder (ref: ci_conv_head.json; GIN + SchNet support,
    ref: tests/test_graphs.py:165-167)."""
    from hydragnn_tpu.models.arch import BranchConfig

    cfg = make_cfg(
        "GIN", output_type=("node",), output_dim=(1,),
    )
    cfg = cfg.__class__(**{
        **cfg.__dict__,
        "node_branches": (BranchConfig("branch-0", 0, 0, 2, (4, 4),
                                       head_nn_type="conv"),),
    })
    _one_step(cfg)


def test_mlp_per_node_head():
    cfg = make_cfg("GIN", output_type=("node",), output_dim=(1,))
    from hydragnn_tpu.models.arch import BranchConfig

    cfg = cfg.__class__(**{
        **cfg.__dict__,
        "node_branches": (BranchConfig("branch-0", 0, 0, 2, (4, 4),
                                       head_nn_type="mlp_per_node"),),
    })
    _one_step(cfg)


def test_gaussian_nll_returns_var():
    cfg = make_cfg("GIN", loss_function_type="GaussianNLLLoss")
    model = create_model(cfg)
    batch = make_batch()
    v = model.init(jax.random.PRNGKey(0), batch, train=False)
    out, var = model.apply(v, batch, train=False)
    assert out[0].shape == (batch.num_graphs, 1)
    assert var[0].shape == (batch.num_graphs, 1)
    assert np.all(np.asarray(var[0]) >= 0)


def test_conv_checkpointing_matches():
    """Activation checkpointing (nn.remat; ref: Base.py:459-465) is
    numerically identical to the plain path."""
    import jax as _jax

    cfg_a = make_cfg("GIN", conv_checkpointing=True)
    cfg_b = make_cfg("GIN", conv_checkpointing=False)
    batch = make_batch()
    opt = select_optimizer({"Optimizer": {"type": "AdamW",
                                          "learning_rate": 1e-3}})
    losses = []
    for cfg in (cfg_a, cfg_b):
        model = create_model(cfg)
        state = init_state(model, batch, opt)
        step = make_train_step(model, cfg, opt)
        state, loss, _ = step(state, batch, _jax.random.PRNGKey(0))
        losses.append(float(loss))
    assert abs(losses[0] - losses[1]) < 1e-6


def test_conv_checkpointing_remat_policies():
    """conv_checkpointing + remat_policy train identically to no-remat
    (rematerialization changes memory, never values)."""
    import jax
    from tests.test_models_forward import make_batch, make_cfg
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.train.optimizer import select_optimizer
    from hydragnn_tpu.train.trainer import init_state, make_train_step

    batch = make_batch()
    opt = select_optimizer({"Optimizer": {"type": "SGD",
                                          "learning_rate": 0.01}})
    ref_loss = None
    for ckpt, pol in ((False, ""), (True, ""), (True, "dots"),
                      (True, "dots_no_batch")):
        cfg = make_cfg("GIN", conv_checkpointing=ckpt, remat_policy=pol)
        model = create_model(cfg)
        state = init_state(model, batch, opt)
        step = make_train_step(model, cfg, opt)
        state, loss, _ = step(state, batch, jax.random.PRNGKey(0))
        state, loss, _ = step(state, batch, jax.random.PRNGKey(0))
        if ref_loss is None:
            ref_loss = float(loss)
        else:
            np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-6)
