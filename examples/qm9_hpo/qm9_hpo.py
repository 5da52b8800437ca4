"""QM9 hyperparameter optimization (ref: examples/qm9_hpo/qm9_deephyper.py,
qm9_deephyper_multi.py, qm9_optuna.py).

The reference runs DeepHyper CBO (and an Optuna variant) over
{mpnn_type, num_conv_layers, hidden_dim, head depth/width}
(ref: qm9_deephyper.py:190-214). This driver runs the same search space
through hydragnn_tpu.hpo.search: ``--search cbo`` is the async
model-based search (RandomForest surrogate + LCB, constant-liar pending
fill — the DeepHyper CBO equivalent), ``--search random`` the baseline;
``--workers N`` evaluates trials concurrently like DeepHyper's parallel
evaluator.

  python examples/qm9_hpo/qm9_hpo.py --max_evals 6 --epochs 4
  python examples/qm9_hpo/qm9_hpo.py --search random
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "qm9"))


SPACE = {
    # mirrors the reference HpProblem (qm9_deephyper.py:197-206); head
    # depth and width are folded into one dim_headlayers choice the way
    # the reference composes [dim] * num_headlayers
    "NeuralNetwork.Architecture.mpnn_type":
        ["EGNN", "PNA", "SchNet", "DimeNet"],
    "NeuralNetwork.Architecture.num_conv_layers": [1, 2],
    "NeuralNetwork.Architecture.hidden_dim": [16, 32, 64],
    "NeuralNetwork.Architecture.output_heads.graph.dim_headlayers":
        [[25], [25, 25], [50, 50], [50, 25, 12]],
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--search", choices=["cbo", "random"], default="cbo")
    p.add_argument("--max_evals", type=int, default=6)
    p.add_argument("--workers", type=int, default=1)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--configs", type=int, default=120)
    p.add_argument("--data_dir", default=None,
                   help="dir of real QM9 xyz files (else synthetic)")
    args = p.parse_args()

    from qm9 import load_qm9, synthetic_molecules  # examples/qm9/qm9.py

    from hydragnn_tpu.config import update_config
    from hydragnn_tpu.data.dataloader import create_dataloaders, split_dataset
    from hydragnn_tpu.hpo.search import model_based_search, random_search
    from hydragnn_tpu.models.arch import arch_config_from_dict
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.train.trainer import train_validate_test

    radius = 4.0
    if args.data_dir and os.path.isdir(args.data_dir):
        samples = load_qm9(args.data_dir, radius, args.configs)
    else:
        samples = synthetic_molecules(args.configs, radius)
    train, val, test = split_dataset(samples, 0.8)
    print(f"qm9_hpo: {len(samples)} molecules")

    base = {
        "Verbosity": {"level": 0},
        "NeuralNetwork": {
            "Architecture": {
                "mpnn_type": "PNA",
                "radius": radius,
                "max_neighbours": 20,
                "hidden_dim": 32,
                "num_conv_layers": 2,
                "num_radial": 8,
                "num_gaussians": 32,
                "num_filters": 32,
                "envelope_exponent": 5,
                "output_heads": {
                    "graph": {
                        "num_sharedlayers": 1,
                        "dim_sharedlayers": 32,
                        "num_headlayers": 2,
                        "dim_headlayers": [25, 25],
                    }
                },
                "task_weights": [1.0],
            },
            "Variables_of_interest": {
                "input_node_features": [0],
                "output_names": ["free_energy"],
                "output_index": [0],
                "type": ["graph"],
                "output_dim": [1],
                "denormalize_output": False,
            },
            "Training": {
                "num_epoch": args.epochs,
                "perc_train": 0.8,
                "batch_size": 32,
                "Optimizer": {"type": "AdamW", "learning_rate": 3e-3},
            },
        },
    }

    def objective(cfg):
        cfg = copy.deepcopy(cfg)
        head = cfg["NeuralNetwork"]["Architecture"]["output_heads"]["graph"]
        head["num_headlayers"] = len(head["dim_headlayers"])
        cfg = update_config(cfg, train, val, test)
        loaders = create_dataloaders(
            train, val, test,
            batch_size=cfg["NeuralNetwork"]["Training"]["batch_size"],
        )
        acfg = arch_config_from_dict(cfg["NeuralNetwork"])
        model = create_model(acfg)
        _, results = train_validate_test(
            model, acfg, cfg, *loaders, verbosity=0
        )
        return float(min(results["history"]["val_loss"]))

    search = model_based_search if args.search == "cbo" else random_search
    kwargs = {"n_trials": args.max_evals, "space": SPACE, "seed": 42}
    if args.search == "cbo":
        kwargs["max_workers"] = args.workers
        kwargs["n_init"] = min(3, args.max_evals)
    best_cfg, best_val, trials = search(base, objective, **kwargs)

    arch = best_cfg["NeuralNetwork"]["Architecture"]
    print(f"\n{len(trials)} trials; best val loss {best_val:.5f}")
    print(json.dumps({
        "mpnn_type": arch["mpnn_type"],
        "num_conv_layers": arch["num_conv_layers"],
        "hidden_dim": arch["hidden_dim"],
        "dim_headlayers": arch["output_heads"]["graph"]["dim_headlayers"],
    }, indent=2))


if __name__ == "__main__":
    main()
