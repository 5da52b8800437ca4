"""Lennard-Jones energy-force training example.

Counterpart of the reference's examples/LennardJones/LennardJones.py +
LJ_data.py (ref: examples/LennardJones/LJ_data.py:207-430): perturbed FCC
configurations with periodic boundary conditions, LJ(6-12) energies and
analytic forces with a radial cutoff; a single node-head model predicts nodal
energy, graph energy = segment-sum, forces = -d(E)/d(pos) via jax.grad, loss
weights energy and forces (ref: hydragnn/models/Base.py:582-636).

Run: python examples/LennardJones/lennard_jones.py [--mpnn_type EGNN]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from hydragnn_tpu.graph import GraphSample
from hydragnn_tpu.data.neighbors import radius_graph_pbc


EPS = 1.0
SIGMA = 1.0


def lj_energy_forces(pos, cell, cutoff):
    """Total LJ energy + per-atom forces with PBC minimum-image via the
    radius graph (pair potential truncated at cutoff)."""
    # ensure_connected=False: this graph DEFINES the physics labels — the
    # connectivity repair (cutoff growth / artificial edges) applies only
    # to MODEL graphs, never to target generation (it would silently
    # change the LJ energy/forces beyond the declared physics cutoff)
    edge_index, shifts = radius_graph_pbc(pos, cell, cutoff, max_num_neighbors=64,
                                          ensure_connected=False)
    src, dst = edge_index
    vec = pos[dst] - pos[src] + shifts
    d = np.linalg.norm(vec, axis=1)
    d = np.maximum(d, 1e-9)
    sr6 = (SIGMA / d) ** 6
    # pair energy counted once per directed edge -> half
    e_pair = 4.0 * EPS * (sr6 ** 2 - sr6)
    energy = 0.5 * float(e_pair.sum())
    # dE/dd per pair; force on dst atom along +vec/d
    dE_dd = 4.0 * EPS * (-12.0 * sr6 ** 2 + 6.0 * sr6) / d
    f_edge = -dE_dd[:, None] * (vec / d[:, None])
    forces = np.zeros_like(pos)
    np.add.at(forces, dst, f_edge)
    per_atom_energy = np.zeros(pos.shape[0])
    np.add.at(per_atom_energy, dst, 0.5 * e_pair)
    return energy, forces, per_atom_energy, edge_index, shifts


def make_dataset(n_configs=300, uc=3, a=1.679, cutoff=2.5, jitter=0.1,
                 seed=17, model_neighbors=5, model_radius=5.0):
    """Perturbed FCC argon-like supercells (ref: LJ_data.py:268-380).

    ``jitter`` is the reference's relative_maximum_atomic_displacement
    (LJ_data.py:79,218 = 0.1): each coordinate displaces uniformly by
    +-jitter/2 of the lattice constant."""
    rng = np.random.RandomState(seed)
    base = np.array(
        [[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]]
    )
    samples = []
    for _ in range(n_configs):
        pts = []
        for i in range(uc):
            for j in range(uc):
                for k in range(uc):
                    pts.append((base + np.array([i, j, k])) * a)
        pos = np.concatenate(pts, axis=0)
        pos = pos + rng.uniform(-jitter / 2, jitter / 2, pos.shape) * a
        cell = np.eye(3) * (uc * a)
        energy, forces, node_e, _, _ = lj_energy_forces(pos, cell, cutoff)
        # model graph: default 5 nearest neighbors (ref: LJ.json
        # max_neighbours=5 — low degree keeps EGNN's sum aggregation
        # well-scaled), separate from the physics cutoff used for the LJ
        # targets above. For force-accuracy runs pass model_neighbors high
        # enough to cover every pair inside the physics cutoff
        # (bench/real_data.py) — a truncated graph caps learnable force
        # accuracy.
        edge_index, shifts = radius_graph_pbc(
            pos, cell, model_radius, max_num_neighbors=model_neighbors
        )
        n = pos.shape[0]
        # per-atom scaling keeps the extensive energy O(1) so fp32 training is
        # well-conditioned regardless of supercell size (forces scaled
        # consistently: both targets divided by n)
        samples.append(
            GraphSample(
                x=np.ones((n, 1), np.float32),
                pos=pos.astype(np.float32),
                edge_index=edge_index,
                edge_shifts=shifts,
                energy=np.float32(energy / n),
                forces=(forces / n).astype(np.float32),
            )
        )
    return samples


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mpnn_type", default="EGNN")
    p.add_argument("--num_epoch", type=int, default=30)
    p.add_argument("--n_configs", type=int, default=200)
    p.add_argument("--hidden_dim", type=int, default=32)
    args = p.parse_args()

    from hydragnn_tpu.config import update_config
    from hydragnn_tpu.data.dataloader import create_dataloaders, split_dataset
    from hydragnn_tpu.models.arch import arch_config_from_dict
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.train.trainer import train_validate_test

    dataset = make_dataset(n_configs=args.n_configs)
    train, val, test = split_dataset(dataset, 0.8)

    config = {
        "Verbosity": {"level": 1},
        "NeuralNetwork": {
            "Architecture": {
                "mpnn_type": args.mpnn_type,
                "radius": 5.0,
                "max_neighbours": 5,
                "hidden_dim": args.hidden_dim,
                "num_conv_layers": 3,
                "num_gaussians": 32,
                "num_filters": args.hidden_dim,
                "num_radial": 8,
                "envelope_exponent": 5,
                # geometric-stack extras (used by MACE; ignored elsewhere)
                "max_ell": 1,
                "node_max_ell": 1,
                "correlation": 2,
                "output_heads": {
                    "node": {
                        "num_headlayers": 2,
                        "dim_headlayers": [32, 32],
                        "type": "mlp",
                    }
                },
                "task_weights": [1.0],
            },
            "Variables_of_interest": {
                "input_node_features": [0],
                "output_names": ["energy"],
                "output_index": [0],
                "type": ["node"],
                "output_dim": [1],
                "denormalize_output": False,
            },
            "Training": {
                "num_epoch": args.num_epoch,
                "perc_train": 0.8,
                "compute_grad_energy": True,
                "batch_size": 16,
                "Optimizer": {"type": "AdamW", "learning_rate": 0.005},
            },
        },
    }
    config = update_config(config, train, val, test)
    loaders = create_dataloaders(train, val, test, batch_size=16)
    cfg = arch_config_from_dict(config["NeuralNetwork"])
    model = create_model(cfg)
    state, results = train_validate_test(
        model, cfg, config, *loaders, verbosity=1
    )
    print("final val loss:", results["history"]["val_loss"][-1])
    return state, results


if __name__ == "__main__":
    main()
