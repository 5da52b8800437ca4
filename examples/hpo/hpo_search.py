"""Hyperparameter search example (ref: examples/multidataset_hpo +
hydragnn/utils/hpo/deephyper.py).

The reference launches DeepHyper trials through SLURM; this driver runs the
self-contained random search (hydragnn_tpu.hpo.search) in-process: each trial
trains the CI config on the deterministic synthetic dataset and is scored by
its best validation loss. On a cluster, pair hpo.launch.slurm_launch_command
with one config file per trial instead.

  python examples/hpo/hpo_search.py --trials 4 --epochs 6
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import hydragnn_tpu as hg
from hydragnn_tpu.data.synthetic import deterministic_graph_data
from hydragnn_tpu.hpo.search import random_search


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trials", type=int, default=4)
    p.add_argument("--epochs", type=int, default=6)
    p.add_argument("--configs", type=int, default=60)
    p.add_argument("--workdir", default="dataset/hpo_unit_test")
    args = p.parse_args()

    deterministic_graph_data(
        args.workdir, number_configurations=args.configs, seed=3
    )
    base = hg.load_config(
        os.path.join(os.path.dirname(__file__), "..", "..", "tests",
                     "inputs", "ci.json")
    )
    base["Dataset"]["path"]["total"] = args.workdir
    base["NeuralNetwork"]["Training"]["num_epoch"] = args.epochs
    base["Verbosity"]["level"] = 0

    space = {
        "NeuralNetwork.Architecture.hidden_dim": [8, 16, 32],
        "NeuralNetwork.Training.Optimizer.learning_rate": [3e-3, 1e-2, 3e-2],
        "NeuralNetwork.Training.batch_size": [8, 16],
    }

    def objective(cfg):
        _, _, _, _, results = hg.run_training(cfg)
        return min(results["history"]["val_loss"])

    best_cfg, best_val, trials = random_search(
        base, objective, n_trials=args.trials, space=space, seed=0
    )
    print(f"\n{len(trials)} trials; best val loss {best_val:.5f} with:")
    print(json.dumps({
        k: best_cfg["NeuralNetwork"]["Architecture"].get(k.split(".")[-1])
        or best_cfg["NeuralNetwork"]["Training"].get(k.split(".")[-1])
        or best_cfg["NeuralNetwork"]["Training"]["Optimizer"].get(
            k.split(".")[-1])
        for k in space
    }, indent=2))


if __name__ == "__main__":
    main()
