"""Reference-style JSON config files drive the full pipeline
(ref: tests/inputs/ci*.json x test_graphs.py matrix)."""

import os

import numpy as np
import pytest

from hydragnn_tpu.config import load_config, update_config
from hydragnn_tpu.data.dataloader import create_dataloaders, split_dataset
from hydragnn_tpu.data.lsms import load_lsms_dataset
from hydragnn_tpu.data.synthetic import deterministic_graph_data
from hydragnn_tpu.models.arch import arch_config_from_dict
from hydragnn_tpu.models.create import create_model
from hydragnn_tpu.train.trainer import train_validate_test

INPUTS = os.path.join(os.path.dirname(__file__), "inputs")


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ds") / "unit_test")
    deterministic_graph_data(d, number_configurations=60, seed=9)
    return d


@pytest.mark.parametrize("config_name", [
    "ci.json", "ci_multihead.json", "ci_conv_head.json", "ci_equivariant.json",
    "ci_vectoroutput.json",
])
def test_config_file_trains(config_name, data_dir):
    config = load_config(os.path.join(INPUTS, config_name))
    config["NeuralNetwork"]["Training"]["num_epoch"] = 2
    config["NeuralNetwork"]["Training"]["EarlyStopping"] = False
    config["NeuralNetwork"]["Training"]["Checkpoint"] = False
    total = load_lsms_dataset(config, data_dir)
    train, val, test = split_dataset(total, 0.7, stratify_splitting=True)
    config = update_config(config, train, val, test)
    loaders = create_dataloaders(train, val, test, batch_size=16)
    cfg = arch_config_from_dict(config["NeuralNetwork"])
    model = create_model(cfg)
    _, results = train_validate_test(model, cfg, config, *loaders)
    assert all(np.isfinite(r) for r in results["test_rmse"])
