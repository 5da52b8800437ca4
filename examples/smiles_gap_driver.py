"""Shared driver for the SMILES->HOMO-LUMO-gap examples (CSCE and OGB) —
TPU-native counterpart of the reference's examples/csce/train_gap.py and
examples/ogb/train_gap.py: CSV rows of (id, SMILES, ..., gap) parsed with
the rdkit-free SMILES parser (descriptors/smiles_utils.py), split
94/2/4, trained on a graph-level gap head.

Usage (per-example wrapper):
  python examples/csce/train_gap.py --csv <file.csv>        # real data
  python examples/csce/train_gap.py --synthetic             # smoke mode
"""

from __future__ import annotations

import argparse
import csv
import os
import random
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# simple valid SMILES for the no-download smoke mode
_SYNTH_SMILES = [
    "C", "CC", "CCC", "CCO", "CCN", "C=C", "C#N", "CO", "C=O", "CCCC",
    "CC(C)C", "c1ccccc1", "CCOC", "CC=O", "NCCN", "OCCO", "CC#N", "CNC",
]


def load_smiles_csv(path, smiles_col=1, value_col=-2, sampling=None,
                    seed=None):
    """ref: csce/train_gap.py:53-66 (row[1] = SMILES, row[-2] = gap)."""
    if seed is not None:
        random.seed(seed)
    smiles, values = [], []
    with open(path) as f:
        reader = csv.reader(f)
        next(reader)  # header
        for row in reader:
            if sampling is not None and random.random() > sampling:
                continue
            smiles.append(row[smiles_col])
            values.append(float(row[value_col]))
    return smiles, values


def write_synthetic_csv(path, n=120, seed=0):
    rng = random.Random(seed)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id", "smiles", "gap", "extra"])
        for i in range(n):
            s = rng.choice(_SYNTH_SMILES)
            # deterministic fake gap: length-correlated
            w.writerow([i, s, round(1.0 + 0.1 * len(s), 4), 0])
    return path


def main(name: str):
    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), name)
    p = argparse.ArgumentParser(description=f"{name} SMILES gap example")
    p.add_argument("--csv", default=os.path.join(here, f"{name}.csv"))
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--sampling", type=float, default=None)
    p.add_argument("--hidden_dim", type=int, default=64)
    p.add_argument("--num_conv_layers", type=int, default=4)
    p.add_argument("--num_epoch", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--mpnn_type", default="GIN")
    args = p.parse_args()

    from hydragnn_tpu.config import update_config
    from hydragnn_tpu.data.dataloader import create_dataloaders
    from hydragnn_tpu.descriptors.smiles_utils import (
        generate_graphdata_from_smilestr,
    )
    from hydragnn_tpu.models.arch import arch_config_from_dict
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.train.trainer import train_validate_test

    if args.synthetic:
        os.makedirs(here, exist_ok=True)
        args.csv = write_synthetic_csv(
            os.path.join(here, "synthetic.csv")
        )
        print(f"wrote synthetic csv: {args.csv}")

    smiles, values = load_smiles_csv(
        args.csv, sampling=args.sampling, seed=43
    )
    # fixed atom-type vocabulary so one-hot dims are stable across splits
    types = {s: k for k, s in enumerate(
        ["C", "N", "O", "F", "H", "S", "Cl", "Br", "P", "I"]
    )}
    samples = []
    for s, v in zip(smiles, values):
        try:
            samples.append(
                generate_graphdata_from_smilestr(
                    s, np.asarray([v], np.float32), types=types
                )
            )
        except (KeyError, ValueError):
            continue  # unparsable/rare-element molecules dropped (ref too)
    random.Random(0).shuffle(samples)
    n = len(samples)
    i0, i1 = int(0.94 * n), int(0.96 * n)
    train, val, test = samples[:i0], samples[i0:i1], samples[i1:]
    print(f"{name}: {n} molecules ({len(train)}/{len(val)}/{len(test)})")

    in_dim = int(train[0].x.shape[1])
    config = {
        "Verbosity": {"level": 1},
        "NeuralNetwork": {
            "Architecture": {
                "mpnn_type": args.mpnn_type,
                "hidden_dim": args.hidden_dim,
                "num_conv_layers": args.num_conv_layers,
                "output_heads": {
                    "graph": {
                        "num_sharedlayers": 2,
                        "dim_sharedlayers": args.hidden_dim,
                        "num_headlayers": 2,
                        "dim_headlayers": [args.hidden_dim,
                                           args.hidden_dim // 2],
                    }
                },
                "task_weights": [1.0],
            },
            "Variables_of_interest": {
                "input_node_features": list(range(in_dim)),
                "output_names": ["gap"],
                "output_index": [0],
                "type": ["graph"],
                "output_dim": [1],
                "denormalize_output": False,
            },
            "Training": {
                "num_epoch": args.num_epoch,
                "perc_train": 0.94,
                "batch_size": args.batch_size,
                "Optimizer": {"type": "AdamW", "learning_rate": 1e-3},
            },
        },
    }
    config = update_config(config, train, val, test)
    loaders = create_dataloaders(
        train, val, test, batch_size=args.batch_size
    )
    cfg = arch_config_from_dict(config["NeuralNetwork"])
    model = create_model(cfg)
    state, results = train_validate_test(
        model, cfg, config, *loaders, verbosity=1
    )
    print("test_rmse:", results["test_rmse"])


if __name__ == "__main__":
    main(os.environ.get("SMILES_GAP_DATASET", "csce"))
