"""3D Ising-model energy example (ref: examples/ising_model/
create_configurations.py + train_ising.py).

Generates spin configurations on an L^3 periodic lattice, computes the
dimensionless nearest-neighbour energy E = -(1/6) sum_i S_i * (sum_nb S_nb
+ S_i) exactly as the reference's ``E_dimensionless`` (optionally with
random spin scaling), builds the graph with the framework's PBC radius
search, and trains a stack to regress total energy from per-node features
[config, x, y, z, spin] — the reference's feature layout.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from hydragnn_tpu.graph import GraphSample
from hydragnn_tpu.data.neighbors import radius_graph_pbc
from hydragnn_tpu.data.ordering import rcm_reorder_sample


def ising_energy(spin: np.ndarray) -> float:
    """E = -(1/6) sum_i S_i * (sum of 6 PBC neighbours + S_i)
    (ref: create_configurations.py E_dimensionless)."""
    nb = sum(
        np.roll(spin, sh, axis=ax)
        for ax in range(3)
        for sh in (1, -1)
    ) + spin
    return float(-(spin * nb).sum() / 6.0)


def make_dataset(n_configs, L, scale_spin, seed=23):
    rng = np.random.RandomState(seed)
    cell = np.eye(3) * L
    xs, ys, zs = np.meshgrid(
        np.arange(L), np.arange(L), np.arange(L), indexing="ij"
    )
    pos = np.stack([xs, ys, zs], -1).reshape(-1, 3).astype(np.float32)
    ei, shifts = radius_graph_pbc(pos, cell, r=1.1, max_num_neighbors=8)
    samples = []
    for _ in range(n_configs):
        config = rng.choice([-1.0, 1.0], (L, L, L))
        spin = config * rng.random((L, L, L)) if scale_spin else config
        y = ising_energy(spin)
        x = np.concatenate(
            [config.reshape(-1, 1), pos, spin.reshape(-1, 1)], axis=1
        ).astype(np.float32)
        samples.append(
            # RCM relabeling bounds the lattice's adjacency bandwidth so
            # collate can pin a fused-SpMM sender window instead of falling
            # back to the unfused path (data/ordering.py; no-op for L^3
            # below the size threshold)
            rcm_reorder_sample(
                GraphSample(
                    x=x,
                    pos=pos,
                    edge_index=ei,
                    edge_shifts=shifts.astype(np.float32),
                    y_graph=np.asarray([y], np.float32),
                )
            )
        )
    return samples


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mpnn_type", default="GIN")
    p.add_argument("--L", type=int, default=4)
    p.add_argument("--num_epoch", type=int, default=40)
    p.add_argument("--n_configs", type=int, default=500)
    p.add_argument("--scale_spin", action="store_true")
    args = p.parse_args()

    from hydragnn_tpu.config import update_config
    from hydragnn_tpu.data.dataloader import create_dataloaders, split_dataset
    from hydragnn_tpu.models.arch import arch_config_from_dict
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.train.trainer import train_validate_test

    dataset = make_dataset(args.n_configs, args.L, args.scale_spin)
    ys = np.asarray([s.y_graph[0] for s in dataset])
    lo, hi = float(ys.min()), float(ys.max())
    for s in dataset:
        s.y_graph = (s.y_graph - lo) / max(hi - lo, 1e-9)

    train, val, test = split_dataset(dataset, 0.7)
    config = {
        "Verbosity": {"level": 1},
        "NeuralNetwork": {
            "Architecture": {
                "mpnn_type": args.mpnn_type,
                "periodic_boundary_conditions": True,
                "radius": 1.1,
                "max_neighbours": 8,
                "hidden_dim": 32,
                "num_conv_layers": 3,
                "num_gaussians": 16,
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
                "input_node_features": [0, 1, 2, 3, 4],
                "output_names": ["total_energy"],
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
                "Optimizer": {"type": "AdamW", "learning_rate": 2e-3},
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
