"""E2E training: GPS global attention path and MACE (the heaviest stacks),
reduced-size analogues of ref: tests/test_graphs.py GPS/MACE cases."""

import numpy as np
import pytest

from tests.test_training_e2e import _prepare, _run


def test_train_gps_gin(tmp_path):
    config, train, val, test = _prepare(tmp_path, n_configs=100)
    arch = config["NeuralNetwork"]["Architecture"]
    arch["global_attn_engine"] = "GPS"
    arch["global_attn_type"] = "multihead"
    arch["global_attn_heads"] = 2
    arch["pe_dim"] = 2
    arch["hidden_dim"] = 8
    # re-extract with PE transforms applied
    from hydragnn_tpu.data.lsms import load_lsms_dataset
    from hydragnn_tpu.data.dataloader import split_dataset

    path = [p for p in (tmp_path / "dataset").iterdir()][0]
    total = load_lsms_dataset(config, str(path))
    assert total[0].pe is not None and total[0].rel_pe is not None
    train, val, test = split_dataset(total, 0.7, stratify_splitting=True)
    _run(config, train, val, test, "GIN", num_epoch=30,
         thresholds=(0.5, 0.5))


def test_train_mace(tmp_path):
    config, train, val, test = _prepare(tmp_path, n_configs=80)
    arch = config["NeuralNetwork"]["Architecture"]
    arch.update(
        dict(mpnn_type="MACE", radius=2.0, num_radial=5, max_ell=1,
             node_max_ell=1, envelope_exponent=5, correlation=2,
             hidden_dim=8)
    )
    # MACE expects atomic-number-like inputs: shift normalized types into
    # 1..3 (the reference clamps and warns the same way,
    # ref: MACEStack.process_node_attributes:483)
    for s in train + val + test:
        s.x = np.round(s.x * 2 + 1).astype(np.float32)
    _run(config, train, val, test, "MACE", num_epoch=25,
         thresholds=(0.75, 0.8))
