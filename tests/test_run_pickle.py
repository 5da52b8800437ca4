"""run_training through the pickle dataset format branch
(ref: tests/test_datasetclass_inheritance pickle paths)."""

import numpy as np

from hydragnn_tpu.data.dataloader import total_to_train_val_test_pickles
from hydragnn_tpu.data.lsms import load_lsms_dataset
from hydragnn_tpu.data.synthetic import deterministic_graph_data
from hydragnn_tpu.config import load_config
import hydragnn_tpu as hg
import os


def test_run_training_pickle_format(tmp_path):
    raw = str(tmp_path / "raw")
    deterministic_graph_data(raw, number_configurations=40, seed=12)
    config = load_config(
        os.path.join(os.path.dirname(__file__), "inputs", "ci.json")
    )
    config["NeuralNetwork"]["Training"]["num_epoch"] = 2
    config["NeuralNetwork"]["Training"]["EarlyStopping"] = False
    config["NeuralNetwork"]["Training"]["Checkpoint"] = False
    total = load_lsms_dataset(config, raw)
    pkl = str(tmp_path / "pkl")
    total_to_train_val_test_pickles(total, pkl, 0.7)

    config["Dataset"]["format"] = "pickle"
    config["Dataset"]["path"] = {"total": pkl}
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        model, cfg, full_cfg, state, results = hg.run_training(config)
    finally:
        os.chdir(cwd)
    assert np.isfinite(results["test_rmse"][0])
