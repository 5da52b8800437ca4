"""QM9 free-energy example (ref: examples/qm9/qm9.py:99-134).

The reference downloads QM9 through torch_geometric. This environment is
hermetic, so the example reads QM9 xyz files from ``--data_dir`` if present
(standard 133k-molecule xyz dump format) and otherwise generates a synthetic
molecular-like dataset with a composable analytic target so the full
pipeline runs anywhere.

Pipeline mirrors the reference: radius graph on atom positions, atomic-number
node features, graph-level target (free energy, index 10 in QM9), GIN stack.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from hydragnn_tpu.graph import GraphSample
from hydragnn_tpu.data.neighbors import radius_graph

Z_MAP = {"H": 1, "C": 6, "N": 7, "O": 8, "F": 9}


def parse_qm9_xyz(path: str, target_index: int = 10):
    with open(path) as f:
        lines = f.readlines()
    n = int(lines[0])
    props = lines[1].split()
    y = float(props[2 + target_index])  # properties start at col 2
    zs, pos = [], []
    for row in lines[2 : 2 + n]:
        cols = row.replace("*^", "e").split()
        zs.append(Z_MAP[cols[0]])
        pos.append([float(c) for c in cols[1:4]])
    return np.asarray(zs, np.float32), np.asarray(pos, np.float32), y


def load_qm9(data_dir: str, radius: float, max_samples: int):
    files = sorted(glob.glob(os.path.join(data_dir, "*.xyz")))[:max_samples]
    samples = []
    for fp in files:
        try:
            zs, pos, y = parse_qm9_xyz(fp)
        except Exception:
            continue
        ei = radius_graph(pos, radius, max_num_neighbors=32)
        samples.append(
            GraphSample(
                x=zs[:, None],
                pos=pos,
                edge_index=ei,
                y_graph=np.asarray([y], np.float32),
            )
        )
    return samples


def synthetic_molecules(n_configs: int, radius: float, seed: int = 11):
    """Molecular-like graphs: random compact clusters of 5-18 atoms with a
    smooth analytic 'free energy' = sum_z f(z) + pair terms."""
    rng = np.random.RandomState(seed)
    samples = []
    for _ in range(n_configs):
        n = rng.randint(5, 19)
        zs = rng.choice([1, 6, 7, 8, 9], n, p=[0.5, 0.3, 0.08, 0.1, 0.02])
        pos = rng.randn(n, 3).astype(np.float32) * 1.2
        ei = radius_graph(pos, radius, max_num_neighbors=32)
        src, dst = ei
        d = np.linalg.norm(pos[dst] - pos[src], axis=1)
        pair = np.exp(-d).sum() * 0.1
        y = float((zs * 0.3 + np.sqrt(zs)).sum() + pair)
        samples.append(
            GraphSample(
                x=zs.astype(np.float32)[:, None],
                pos=pos,
                edge_index=ei,
                y_graph=np.asarray([y], np.float32),
            )
        )
    return samples


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", default=None)
    p.add_argument("--mpnn_type", default="GIN")
    p.add_argument("--num_epoch", type=int, default=30)
    p.add_argument("--max_samples", type=int, default=1000)
    args = p.parse_args()

    from hydragnn_tpu.config import update_config
    from hydragnn_tpu.data.dataloader import create_dataloaders, split_dataset
    from hydragnn_tpu.models.arch import arch_config_from_dict
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.train.trainer import train_validate_test

    radius = 3.0
    if args.data_dir and os.path.isdir(args.data_dir):
        dataset = load_qm9(args.data_dir, radius, args.max_samples)
        print(f"loaded {len(dataset)} QM9 molecules from {args.data_dir}")
    else:
        dataset = synthetic_molecules(args.max_samples, radius)
        print(f"generated {len(dataset)} synthetic molecules")

    # normalize target
    ys = np.asarray([s.y_graph[0] for s in dataset])
    lo, hi = ys.min(), ys.max()
    for s in dataset:
        s.y_graph = (s.y_graph - lo) / (hi - lo)

    train, val, test = split_dataset(dataset, 0.7)
    config = {
        "Verbosity": {"level": 1},
        "NeuralNetwork": {
            "Architecture": {
                "mpnn_type": args.mpnn_type,
                "radius": radius,
                "max_neighbours": 32,
                "hidden_dim": 32,
                "num_conv_layers": 3,
                "num_gaussians": 32,
                "num_filters": 32,
                "num_radial": 8,
                "envelope_exponent": 5,
                "output_heads": {
                    "graph": {
                        "num_sharedlayers": 2,
                        "dim_sharedlayers": 32,
                        "num_headlayers": 2,
                        "dim_headlayers": [32, 32],
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
                "num_epoch": args.num_epoch,
                "perc_train": 0.7,
                "batch_size": 64,
                "Optimizer": {"type": "AdamW", "learning_rate": 0.002},
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
