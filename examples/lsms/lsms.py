"""LSMS binary-alloy example (ref: examples/lsms/lsms.py + utils/lsms/*).

The reference trains on LSMS-1/LSMS-3 first-principles datasets (FePt, FeSi,
CuAu binary alloys) stored as LSMS-format text files, after converting total
energies to formation enthalpies (`convert_raw_data_energy_to_formation_
enthalpy.py`). Those datasets are not redistributable, so this driver
generates a physically-shaped surrogate: random binary occupancies on a BCC
lattice with a pair-interaction alloy energy (nearest-neighbour Ising-like
mixing term + per-species reference energies), written in the exact LSMS
text layout (energy header line; per-atom rows "type id x y z ...").

Pipeline (identical to the reference's):
  1. write LSMS text files (incl. the two pure-element configurations the
     enthalpy conversion requires),
  2. ``convert_raw_data_energy_to_gibbs`` — rewrite headers with the
     formation Gibbs energy (hydragnn_tpu.lsms.enthalpy; ref:
     utils/lsms/convert_raw_data_energy_to_gibbs.py),
  3. ``run_training`` with ``Dataset.format == "LSMS"`` — parse, minmax
     normalize, radius graph, compositional stratified split, train.

Usage: python examples/lsms/lsms.py [--mpnn_type GIN] [--configs 400]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

FE, PT = 26.0, 78.0  # atomic numbers of the binary species
E_REF = {FE: -0.8, PT: -1.1}  # per-atom reference energies (surrogate)
J_MIX = {  # nearest-neighbour pair energies (surrogate alloy model)
    (FE, FE): -0.10,
    (PT, PT): -0.12,
    (FE, PT): -0.16,
    (PT, FE): -0.16,
}


def bcc_positions(L: int) -> np.ndarray:
    xs, ys, zs = np.meshgrid(np.arange(L), np.arange(L), np.arange(L),
                             indexing="ij")
    corner = np.stack([xs, ys, zs], -1).reshape(-1, 3).astype(np.float64)
    center = corner + 0.5
    return np.concatenate([corner, center], axis=0)


def alloy_energy(types: np.ndarray, edge_index: np.ndarray) -> float:
    e = sum(E_REF[t] for t in types)
    s, r = edge_index
    for a, b in zip(types[s], types[r]):
        e += 0.5 * J_MIX[(a, b)]
    return float(e)


def write_lsms_file(path: str, types: np.ndarray, pos: np.ndarray,
                    energy: float) -> None:
    rows = []
    for i, (t, p) in enumerate(zip(types, pos)):
        rows.append(
            f"{t:.1f}\t{float(i):.1f}\t{p[0]:.4f}\t{p[1]:.4f}\t{p[2]:.4f}"
        )
    with open(path, "w") as f:
        f.write(f"{energy!r}\n" + "\n".join(rows))


def generate_dataset(path: str, n_configs: int, L: int, seed: int = 17) -> None:
    from hydragnn_tpu.data.neighbors import radius_graph

    os.makedirs(path, exist_ok=True)
    rng = np.random.RandomState(seed)
    pos = bcc_positions(L)
    n = pos.shape[0]
    edge_index = radius_graph(pos.astype(np.float32), 0.9,
                              max_num_neighbors=8)
    # two pure configurations first — required by the enthalpy conversion
    for k, t in enumerate((FE, PT)):
        types = np.full(n, t)
        write_lsms_file(os.path.join(path, f"output{k}.txt"), types, pos,
                        alloy_energy(types, edge_index))
    for k in range(2, n_configs + 2):
        comp = rng.uniform(0.05, 0.95)
        types = np.where(rng.rand(n) < comp, FE, PT)
        write_lsms_file(os.path.join(path, f"output{k}.txt"), types, pos,
                        alloy_energy(types, edge_index))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mpnn_type", default="GIN")
    p.add_argument("--configs", type=int, default=400)
    p.add_argument("--L", type=int, default=3)
    p.add_argument("--num_epoch", type=int, default=30)
    p.add_argument("--data_dir", default="dataset/lsms_fept",
                   help="existing LSMS text dir (generated if absent)")
    args = p.parse_args()

    import hydragnn_tpu as hg
    from hydragnn_tpu.lsms.enthalpy import convert_raw_data_energy_to_gibbs

    if not os.path.isdir(args.data_dir) or not os.listdir(args.data_dir):
        print(f"generating surrogate FePt LSMS data in {args.data_dir}")
        generate_dataset(args.data_dir, args.configs, args.L)

    gibbs_dir = convert_raw_data_energy_to_gibbs(
        args.data_dir, [FE, PT], temperature_kelvin=0.0, overwrite_data=True
    )
    print("formation-energy dataset:", gibbs_dir)

    config = {
        "Verbosity": {"level": 1},
        "Dataset": {
            "name": "lsms_fept",
            "format": "LSMS",
            "compositional_stratified_splitting": True,
            "rotational_invariance": False,
            "path": {"total": gibbs_dir},
            "node_features": {
                "name": ["atom_type"],
                "dim": [1],
                "column_index": [0],
            },
            "graph_features": {
                "name": ["formation_energy"],
                "dim": [1],
                "column_index": [0],
            },
        },
        "NeuralNetwork": {
            "Architecture": {
                "mpnn_type": args.mpnn_type,
                "radius": 0.9,
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
                "input_node_features": [0],
                "output_names": ["formation_energy"],
                "output_index": [0],
                "type": ["graph"],
                "output_dim": [1],
                "denormalize_output": True,
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
    model, arch_cfg, full_cfg, state, results = hg.run_training(config)
    print("test rmse:", results["test_rmse"])
    return results


if __name__ == "__main__":
    main()
