"""Kill-and-resume through run_training: Training["continue"] +
["startfrom"] load an existing checkpoint (model + optimizer state) before
the epoch loop, and a resumed run reproduces the uninterrupted run's
predictions (ref: hydragnn/run_training.py:114 load_existing_model_config,
utils/model/model.py:118-149, train_validate_test.py:152-154 epoch_start).
"""

import os

import numpy as np

import hydragnn_tpu as hg
from hydragnn_tpu.config import load_config
from hydragnn_tpu.data.synthetic import deterministic_graph_data


def _base_config(raw):
    config = load_config(
        os.path.join(os.path.dirname(__file__), "inputs", "ci.json")
    )
    tr = config["NeuralNetwork"]["Training"]
    tr["EarlyStopping"] = False
    tr["Checkpoint"] = True
    tr["checkpoint_warmup"] = 0
    config["Dataset"]["path"] = {"total": raw}
    return config


def test_resume_reproduces_uninterrupted(tmp_path):
    raw = str(tmp_path / "raw")
    deterministic_graph_data(raw, number_configurations=40, seed=3)

    cwd = os.getcwd()
    os.chdir(tmp_path)
    os.environ.pop("HYDRAGNN_EPOCH", None)
    try:
        # uninterrupted run: 8 epochs
        cfg_full = _base_config(raw)
        cfg_full["NeuralNetwork"]["Training"]["num_epoch"] = 8
        *_, state_full, res_full = hg.run_training(cfg_full, chosen_seed=7)

        # interrupted run: 4 epochs, checkpointed under its log name
        cfg_a = _base_config(raw)
        cfg_a["NeuralNetwork"]["Training"]["num_epoch"] = 4
        model, cfg, full_cfg, state_a, res_a = hg.run_training(
            cfg_a, chosen_seed=7
        )
        from hydragnn_tpu.config import get_log_name_config

        log_name = get_log_name_config(full_cfg)
        assert any(
            f.startswith("checkpoint") or f == "best.msgpack"
            for f in os.listdir(os.path.join("logs", log_name))
        )

        # resume: same config, continue from the saved checkpoint, run the
        # remaining epochs (epoch_start=4 -> epochs 4..7)
        os.environ.pop("HYDRAGNN_EPOCH", None)
        cfg_b = _base_config(raw)
        tr_b = cfg_b["NeuralNetwork"]["Training"]
        tr_b["num_epoch"] = 8
        tr_b["epoch_start"] = 4
        tr_b["continue"] = 1
        tr_b["startfrom"] = log_name
        *_, state_b, res_b = hg.run_training(cfg_b, chosen_seed=7)

        # the checkpoint holds the BEST-val epoch's state (reference
        # Checkpoint semantics, model.py:323-363), so the resumed run
        # retraces the full run's trajectory from best_epoch+1: its first
        # train-epoch loss must reproduce the full run's train loss at that
        # epoch (deterministic: same step RNG + same data order)
        rmse_b = np.asarray(res_b["test_rmse"])
        assert np.all(np.isfinite(rmse_b))
        best_epoch_a = int(np.argmin(res_a["history"]["val_loss"]))
        expect = res_full["history"]["train_loss"][best_epoch_a + 1]
        got = res_b["history"]["train_loss"][0]
        np.testing.assert_allclose(got, expect, rtol=1e-4)
    finally:
        os.environ.pop("HYDRAGNN_EPOCH", None)
        os.chdir(cwd)


def test_continue_ignores_stale_epoch_env(tmp_path):
    """A prior run in the same process leaves HYDRAGNN_EPOCH exported (the
    loop writes it every epoch as a progress signal). A continue run must
    NOT read it back as the checkpoint selector — it would silently load
    that stale epoch instead of the latest state. Resume-epoch selection is
    Training["restart_epoch"] / HYDRAGNN_RESTART_EPOCH only."""
    raw = str(tmp_path / "raw")
    deterministic_graph_data(raw, number_configurations=30, seed=9)

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        cfg_a = _base_config(raw)
        cfg_a["NeuralNetwork"]["Training"]["num_epoch"] = 3
        model, cfg, full_cfg, state_a, res_a = hg.run_training(
            cfg_a, chosen_seed=21
        )
        from hydragnn_tpu.config import get_log_name_config

        log_name = get_log_name_config(full_cfg)

        # simulate the stale export of an earlier epoch in this process
        os.environ["HYDRAGNN_EPOCH"] = "0"
        cfg_b = _base_config(raw)
        tr_b = cfg_b["NeuralNetwork"]["Training"]
        tr_b["num_epoch"] = 3
        tr_b["epoch_start"] = 3  # pure load + test
        tr_b["continue"] = 1
        tr_b["startfrom"] = log_name
        *_, state_b, res_b = hg.run_training(cfg_b, chosen_seed=999)

        np.testing.assert_allclose(
            np.asarray(res_a["test_rmse"]),
            np.asarray(res_b["test_rmse"]),
            rtol=1e-5,
            err_msg="continue run loaded a stale-epoch checkpoint",
        )
    finally:
        os.environ.pop("HYDRAGNN_EPOCH", None)
        os.chdir(cwd)


def test_continue_loads_exact_state(tmp_path):
    """Loading via continue must restore the trained params exactly:
    a resumed run with 0 further epochs predicts identically to the saved
    run (the reference's tests/test_model_loadpred.py contract)."""
    raw = str(tmp_path / "raw")
    deterministic_graph_data(raw, number_configurations=30, seed=5)

    cwd = os.getcwd()
    os.chdir(tmp_path)
    os.environ.pop("HYDRAGNN_EPOCH", None)
    try:
        cfg_a = _base_config(raw)
        cfg_a["NeuralNetwork"]["Training"]["num_epoch"] = 2
        model, cfg, full_cfg, state_a, res_a = hg.run_training(
            cfg_a, chosen_seed=11
        )
        from hydragnn_tpu.config import get_log_name_config

        log_name = get_log_name_config(full_cfg)

        os.environ.pop("HYDRAGNN_EPOCH", None)
        cfg_b = _base_config(raw)
        tr_b = cfg_b["NeuralNetwork"]["Training"]
        # epoch_start == num_epoch: no further training, pure load + test
        tr_b["num_epoch"] = 2
        tr_b["epoch_start"] = 2
        tr_b["continue"] = 1
        tr_b["startfrom"] = log_name
        *_, state_b, res_b = hg.run_training(cfg_b, chosen_seed=999)

        np.testing.assert_allclose(
            np.asarray(res_a["test_rmse"]),
            np.asarray(res_b["test_rmse"]),
            rtol=1e-5,
        )
    finally:
        os.environ.pop("HYDRAGNN_EPOCH", None)
        os.chdir(cwd)
