"""Full-size accuracy regression gate vs the reference CI thresholds.

Reproduces the reference's primary accuracy gate (ref: tests/test_graphs.py:
25-167): 500 deterministic synthetic graphs, ~100 epochs, per-model RMSE /
sample-MAE thresholds. Run models with:

    python bench/accuracy_gate.py [--models GIN,SAGE,...] [--epochs 100]

Prints one JSON line per model: {"model", "rmse", "mae", "thr_rmse",
"thr_mae", "pass"}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# reference thresholds (ref: tests/test_graphs.py:143-157)
THRESHOLDS = {
    "SAGE": (0.20, 0.20),
    "PNA": (0.20, 0.20),
    "PNAPlus": (0.20, 0.20),
    "MFC": (0.20, 0.30),
    "GIN": (0.25, 0.20),
    "GAT": (0.60, 0.70),
    "CGCNN": (0.50, 0.40),
    "SchNet": (0.20, 0.20),
    "DimeNet": (0.50, 0.50),
    "EGNN": (0.20, 0.20),
    "PNAEq": (0.60, 0.60),
    "PAINN": (0.60, 0.70),
    # tightened from the reference's loose 0.60/0.70 (round-1 measured
    # 0.024 — the CG-oracle-verified implementation clears a far stricter
    # bar; VERDICT round-1 item 9)
    "MACE": (0.15, 0.20),
}


EDGE_THRESHOLDS = {  # ref: tests/test_graphs.py:158-161
    "CGCNN": (0.175, 0.175),
    "PNA": (0.10, 0.10),
    "PNAPlus": (0.10, 0.10),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--models", default=",".join(THRESHOLDS))
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--n_configs", type=int, default=500)
    p.add_argument("--data_dir", default=None)
    p.add_argument("--edge_features", action="store_true",
                   help="edge-length features + tighter thresholds")
    args = p.parse_args()

    import numpy as np

    from hydragnn_tpu.config import load_config, update_config
    from hydragnn_tpu.data.dataloader import create_dataloaders, split_dataset
    from hydragnn_tpu.data.lsms import load_lsms_dataset
    from hydragnn_tpu.data.synthetic import deterministic_graph_data
    from hydragnn_tpu.models.arch import arch_config_from_dict
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.train.trainer import train_validate_test

    data_dir = args.data_dir or os.path.join(
        tempfile.gettempdir(), "hydragnn_tpu_gate_dataset"
    )
    if not os.path.isdir(data_dir) or not os.listdir(data_dir):
        deterministic_graph_data(
            data_dir, number_configurations=args.n_configs, seed=4
        )

    config_path = os.path.join(
        os.path.dirname(__file__), "..", "tests", "inputs", "ci.json"
    )

    all_pass = True
    for mpnn_type in args.models.split(","):
        config = load_config(config_path)
        arch = config["NeuralNetwork"]["Architecture"]
        arch["mpnn_type"] = mpnn_type
        if args.edge_features:
            arch["edge_features"] = ["length"]
        config["NeuralNetwork"]["Training"]["num_epoch"] = args.epochs
        config["NeuralNetwork"]["Training"]["EarlyStopping"] = False
        config["NeuralNetwork"]["Training"]["Checkpoint"] = False
        if mpnn_type in ("SchNet", "PNAPlus", "PNAEq", "PAINN", "DimeNet",
                         "MACE"):
            arch.setdefault("num_radial", 6)
            arch.setdefault("num_spherical", 7)
            arch.setdefault("num_gaussians", 50)
            arch.setdefault("num_filters", 32)
            arch.setdefault("envelope_exponent", 5)
        if mpnn_type == "DimeNet":
            arch.setdefault("basis_emb_size", 8)
            arch.setdefault("int_emb_size", 64)
            arch.setdefault("out_emb_size", 128)
            arch.setdefault("num_before_skip", 1)
            arch.setdefault("num_after_skip", 2)
            arch["max_neighbours"] = 16  # static triplet slot cap
        if mpnn_type == "MACE":
            arch["max_ell"] = 1
            arch["node_max_ell"] = 1
            arch["correlation"] = 2
        total = load_lsms_dataset(config, data_dir)
        if mpnn_type == "MACE":
            for s in total:
                s.x = np.round(s.x * 2 + 1).astype(np.float32)
        train, val, test = split_dataset(total, 0.7, stratify_splitting=True)
        config = update_config(config, train, val, test)
        loaders = create_dataloaders(
            train, val, test,
            batch_size=config["NeuralNetwork"]["Training"]["batch_size"],
        )
        cfg = arch_config_from_dict(config["NeuralNetwork"])
        model = create_model(cfg)
        _, results = train_validate_test(model, cfg, config, *loaders)
        rmse = results["test_rmse"][0]
        mae = results["test_mae"][0]
        thr = (EDGE_THRESHOLDS if args.edge_features else THRESHOLDS)[
            mpnn_type
        ]
        ok = rmse < thr[0] and mae < thr[1]
        all_pass &= ok
        print(json.dumps({
            "model": mpnn_type, "rmse": round(rmse, 4), "mae": round(mae, 4),
            "thr_rmse": thr[0], "thr_mae": thr[1], "pass": ok,
        }), flush=True)
    sys.exit(0 if all_pass else 1)


if __name__ == "__main__":
    main()
