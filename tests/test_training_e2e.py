"""End-to-end train+predict tests on the deterministic synthetic dataset —
the primary accuracy regression gate (ref: tests/test_graphs.py:25-307).

Reference CI thresholds (ref: test_graphs.py:143-167) use 500 graphs x ~100
epochs; for speed the suite here uses a reduced set with correspondingly
relaxed thresholds. The full-size sweep lives in bench/accuracy_gate.py.
"""

import json
import os

import numpy as np
import pytest

from hydragnn_tpu.config import load_config, update_config
from hydragnn_tpu.data.synthetic import deterministic_graph_data
from hydragnn_tpu.data.lsms import load_lsms_dataset
from hydragnn_tpu.data.dataloader import create_dataloaders, split_dataset
from hydragnn_tpu.models.arch import arch_config_from_dict
from hydragnn_tpu.models.create import create_model
from hydragnn_tpu.train.trainer import train_validate_test

CONFIG = os.path.join(os.path.dirname(__file__), "inputs", "ci.json")


def _prepare(tmp_path, n_configs=120):
    path = str(tmp_path / "dataset" / "unit_test")
    deterministic_graph_data(path, number_configurations=n_configs, seed=4)
    config = load_config(CONFIG)
    total = load_lsms_dataset(config, path)
    train, val, test = split_dataset(
        total,
        config["NeuralNetwork"]["Training"]["perc_train"],
        stratify_splitting=True,
    )
    return config, train, val, test


def _run(config, train, val, test, mpnn_type, num_epoch=40, thresholds=(0.35, 0.35)):
    config["NeuralNetwork"]["Architecture"]["mpnn_type"] = mpnn_type
    config["NeuralNetwork"]["Training"]["num_epoch"] = num_epoch
    config["NeuralNetwork"]["Training"]["EarlyStopping"] = False
    config = update_config(config, train, val, test)
    loaders = create_dataloaders(
        train, val, test,
        batch_size=config["NeuralNetwork"]["Training"]["batch_size"],
    )
    cfg = arch_config_from_dict(config["NeuralNetwork"])
    model = create_model(cfg)
    state, results = train_validate_test(model, cfg, config, *loaders)
    rmse, mae = results["test_rmse"], results["test_mae"]
    for ih in range(len(rmse)):
        assert rmse[ih] < thresholds[0], f"head {ih} rmse {rmse[ih]}"
        assert mae[ih] < thresholds[1], f"head {ih} mae {mae[ih]}"
    return state, results


@pytest.mark.parametrize("mpnn_type", ["GIN", "SAGE", "PNA"])
def test_train_singlehead(tmp_path, mpnn_type):
    config, train, val, test = _prepare(tmp_path)
    _run(config, train, val, test, mpnn_type)


def test_train_multihead(tmp_path):
    config, train, val, test = _prepare(tmp_path)
    var = config["NeuralNetwork"]["Variables_of_interest"]
    var["output_names"] = ["sum_x_x2_x3", "x", "x2", "x3"]
    var["output_index"] = [0, 0, 1, 2]
    var["type"] = ["graph", "node", "node", "node"]
    config["NeuralNetwork"]["Architecture"]["task_weights"] = [1.0, 1.0, 1.0, 1.0]
    # targets must be re-extracted with the new head layout
    path = [p for p in (tmp_path / "dataset").iterdir()][0]
    total = load_lsms_dataset(config, str(path))
    train, val, test = split_dataset(total, 0.7, stratify_splitting=True)
    _run(config, train, val, test, "SAGE", thresholds=(0.45, 0.45))
