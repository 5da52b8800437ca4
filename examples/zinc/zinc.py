"""ZINC molecular-property example: GPS global attention on bond graphs
(ref: examples/zinc/zinc.py + zinc.json — the GPS showcase of the
reference's "gps-support" branch).

The reference downloads ZINC(subset) through torch_geometric and trains a
GPS-wrapped stack with Laplacian-eigenvector positional encodings (pe_dim=6)
and relative edge encodings. This environment is hermetic, so the example
reads a ``smiles,y`` CSV (the ZINC-250k / ZINC-subset distribution format,
penalized-logP or constrained-solubility target) via --csv if given, and
otherwise generates molecules from a small SMILES grammar with an analytic
solubility-like target so the full GPS + LapPE pipeline runs anywhere —
SMILES are parsed with the framework's rdkit-free parser
(descriptors/smiles_utils.py), exactly the bond-graph + one-hot bond
edge_attr layout of the reference's zinc_pre_transform.
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from hydragnn_tpu.descriptors.smiles_utils import (
    generate_graphdata_from_smilestr,
)
from hydragnn_tpu.data.transforms import add_laplacian_eigenvector_pe

# fixed atom-type vocabulary so the feature layout is data-independent
TYPES = {"H": 0, "C": 1, "N": 2, "O": 3, "F": 4, "S": 5, "Cl": 6}


def random_smiles(rng: np.random.RandomState) -> str:
    """Small guaranteed-valid SMILES grammar: heavy-atom chains with
    branches, carbonyls, and benzene-ring units."""
    units = ["C", "C", "C", "N", "O", "C(=O)", "c1ccccc1", "C(C)", "C(N)"]
    n = rng.randint(3, 9)
    return "".join(units[rng.randint(len(units))] for _ in range(n))


def solubility_like(sample) -> float:
    """Analytic target from the molecular graph (z column sits after the
    one-hot type block): mimics penalized-logP's composition+topology mix."""
    z = sample.x[:, len(TYPES)]
    n_arom = float(sample.x[:, len(TYPES) + 1].sum())
    n_bonds = sample.num_edges / 2.0
    counts = {el: float((z == q).sum()) for el, q in
              (("C", 6), ("N", 7), ("O", 8), ("H", 1))}
    return (0.4 * counts["C"] - 0.8 * counts["O"] + 0.3 * counts["N"]
            + 0.05 * counts["H"] - 0.15 * n_arom + 0.1 * n_bonds)


def build_dataset(args):
    rng = np.random.RandomState(17)
    samples = []
    if args.csv and os.path.isfile(args.csv):
        with open(args.csv) as f:
            for i, row in enumerate(csv.DictReader(f)):
                if i >= args.max_samples:
                    break
                smiles = row.get("smiles") or row.get("SMILES")
                y = row.get("y") or row.get("logP") or row.get("penalized_logp")
                try:
                    s = generate_graphdata_from_smilestr(
                        smiles.strip(), float(y), types=TYPES
                    )
                except Exception:
                    continue
                samples.append(s)
        print(f"parsed {len(samples)} molecules from {args.csv}")
    else:
        for _ in range(args.max_samples):
            smi = random_smiles(rng)
            try:
                s = generate_graphdata_from_smilestr(smi, 0.0, types=TYPES)
            except Exception:
                continue
            s.y_graph = np.asarray([solubility_like(s)], np.float32)
            samples.append(s)
        print(f"generated {len(samples)} grammar molecules")

    # normalize target to [0, 1]
    ys = np.asarray([s.y_graph[0] for s in samples])
    lo, hi = float(ys.min()), float(ys.max())
    pe_dim = args.pe_dim
    out = []
    for s in samples:
        s.y_graph = (s.y_graph - lo) / max(hi - lo, 1e-9)
        out.append(add_laplacian_eigenvector_pe(s, k=pe_dim))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--csv", default=None, help="smiles,y CSV (ZINC dump)")
    p.add_argument("--mpnn_type", default="GIN")
    p.add_argument("--num_epoch", type=int, default=40)
    p.add_argument("--max_samples", type=int, default=800)
    p.add_argument("--pe_dim", type=int, default=6)
    p.add_argument("--no_gps", action="store_true",
                   help="ablation: plain local MPNN, no global attention")
    args = p.parse_args()

    from hydragnn_tpu.config import update_config
    from hydragnn_tpu.data.dataloader import create_dataloaders, split_dataset
    from hydragnn_tpu.models.arch import arch_config_from_dict
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.train.trainer import train_validate_test

    dataset = build_dataset(args)
    n_feat = dataset[0].x.shape[1]
    train, val, test = split_dataset(dataset, 0.7)

    # mirrors ref examples/zinc/zinc.json (GPS multihead, 8 heads, pe_dim 6)
    config = {
        "Verbosity": {"level": 1},
        "NeuralNetwork": {
            "Architecture": {
                "mpnn_type": args.mpnn_type,
                "global_attn_engine": None if args.no_gps else "GPS",
                "global_attn_type": None if args.no_gps else "multihead",
                "global_attn_heads": 0 if args.no_gps else 8,
                "pe_dim": args.pe_dim,
                "hidden_dim": 64,
                "num_conv_layers": 2,
                "radius": 7.0,
                "max_neighbours": 32,
                "output_heads": {
                    "graph": {
                        "num_sharedlayers": 2,
                        "dim_sharedlayers": 50,
                        "num_headlayers": 2,
                        "dim_headlayers": [50, 25],
                    }
                },
                "task_weights": [1.0],
            },
            "Variables_of_interest": {
                "input_node_features": list(range(n_feat)),
                "output_names": ["free_energy"],
                "output_index": [0],
                "type": ["graph"],
                "output_dim": [1],
                "denormalize_output": False,
            },
            "Training": {
                "num_epoch": args.num_epoch,
                "perc_train": 0.7,
                "batch_size": 64,
                "loss_function_type": "mse",
                "Optimizer": {"type": "AdamW", "learning_rate": 1e-3},
            },
        },
    }
    config = update_config(config, train, val, test)
    loaders = create_dataloaders(train, val, test, batch_size=64)
    cfg = arch_config_from_dict(config["NeuralNetwork"])
    model = create_model(cfg)
    state, results = train_validate_test(model, cfg, config, *loaders,
                                         verbosity=1)
    print("test rmse:", results["test_rmse"])
    return results


if __name__ == "__main__":
    main()
