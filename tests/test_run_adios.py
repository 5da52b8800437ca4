"""run_training through the "adios" (arraystore) format branch — every
reference JSON with ``"format": "adios"`` must run unmodified
(ref: hydragnn/preprocess/load_data.py:206-330 +
hydragnn/utils/datasets/adiosdataset.py:574-689)."""

import os

import numpy as np

from hydragnn_tpu.config import load_config
from hydragnn_tpu.data.arraystore import GraphStoreWriter
from hydragnn_tpu.data.dataloader import split_dataset
from hydragnn_tpu.data.lsms import load_lsms_dataset
from hydragnn_tpu.data.synthetic import deterministic_graph_data
import hydragnn_tpu as hg


def _write_store(tmp_path, config):
    raw = str(tmp_path / "raw")
    deterministic_graph_data(raw, number_configurations=40, seed=13)
    total = load_lsms_dataset(config, raw)
    train, val, test = split_dataset(total, 0.7)
    store = str(tmp_path / "store")
    for split, data in (
        ("trainset", train), ("valset", val), ("testset", test)
    ):
        w = GraphStoreWriter(os.path.join(store, split))
        w.extend(data)
        w.save()
    return store


def _base_config(num_epoch=2):
    config = load_config(
        os.path.join(os.path.dirname(__file__), "inputs", "ci.json")
    )
    config["NeuralNetwork"]["Training"]["num_epoch"] = num_epoch
    config["NeuralNetwork"]["Training"]["EarlyStopping"] = False
    config["NeuralNetwork"]["Training"]["Checkpoint"] = False
    return config


def test_run_training_adios_format(tmp_path):
    config = _base_config()
    store = _write_store(tmp_path, config)
    config["Dataset"]["format"] = "adios"
    config["Dataset"]["path"] = {"total": store}
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        model, cfg, full_cfg, state, results = hg.run_training(config)
    finally:
        os.chdir(cwd)
    assert np.isfinite(results["test_rmse"][0])


def test_run_training_adios_ddstore_mode(tmp_path, monkeypatch):
    """HYDRAGNN_USE_ddstore=1 wraps each split in DistDataset (single
    process: one local shard; ref run-scripts use this flag on Frontier)."""
    config = _base_config()
    store = _write_store(tmp_path, config)
    config["Dataset"]["format"] = "adios"
    config["Dataset"]["path"] = {"total": store}
    monkeypatch.setenv("HYDRAGNN_USE_ddstore", "1")
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        model, cfg, full_cfg, state, results = hg.run_training(config)
    finally:
        os.chdir(cwd)
    assert np.isfinite(results["test_rmse"][0])
