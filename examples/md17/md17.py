"""MD17 molecular-dynamics energy example (ref: examples/md17/md17.py).

The reference downloads MD17 via torch_geometric. Hermetic counterpart:
reads an MD17 ``.npz`` (keys R [T,n,3], z [n], E [T,1], F [T,n,3] — the
official sGDML dump format) from --npz if given, else generates a synthetic
MD-like trajectory (harmonic molecule + thermal noise with consistent
energies/forces). Trains SchNet on energy (add --forces for energy+force
training via nested autodiff).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from hydragnn_tpu.graph import GraphSample
from hydragnn_tpu.data.neighbors import radius_graph


def load_md17_npz(path: str, max_samples: int, radius: float, forces: bool):
    data = np.load(path)
    R, z, E = data["R"], data["z"], data["E"].reshape(-1)
    F = data.get("F")
    n = len(z)
    # energy-only training may standardize freely; with forces the E and F
    # units MUST stay consistent (F = -dE/dpos), so only the mean is
    # removed — a mismatched per-quantity rescale makes the force target
    # physically unreachable and caps accuracy
    if forces and F is not None:
        E = E - E.mean()
    else:
        E = (E - E.mean()) / max(E.std(), 1e-9)
    samples = []
    for t in range(min(len(R), max_samples)):
        pos = R[t].astype(np.float32)
        ei = radius_graph(pos, radius, max_num_neighbors=32)
        kw = {}
        if forces and F is not None:
            kw = dict(energy=np.float32(E[t]),
                      forces=F[t].astype(np.float32))
        else:
            kw = dict(y_graph=np.asarray([E[t]], np.float32))
        samples.append(
            GraphSample(
                x=z.astype(np.float32)[:, None], pos=pos, edge_index=ei, **kw
            )
        )
    return samples


def synthetic_md(n_samples: int, radius: float, forces: bool, seed: int = 5):
    """Harmonic 9-atom molecule: E = 0.5 k sum |r - r0|^2, F = -k (r - r0)."""
    rng = np.random.RandomState(seed)
    n = 9
    r0 = rng.randn(n, 3).astype(np.float32) * 1.5
    z = rng.choice([1, 6, 8], n).astype(np.float32)
    k = 2.0
    samples = []
    for _ in range(n_samples):
        disp = rng.randn(n, 3).astype(np.float32) * 0.2
        pos = r0 + disp
        E = 0.5 * k * float((disp ** 2).sum())
        F = -k * disp
        ei = radius_graph(pos, radius, max_num_neighbors=32)
        if forces:
            kw = dict(energy=np.float32(E / n), forces=(F / n))
        else:
            kw = dict(y_graph=np.asarray([E], np.float32))
        samples.append(GraphSample(x=z[:, None], pos=pos, edge_index=ei, **kw))
    return samples


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--npz", default=None)
    p.add_argument("--mpnn_type", default="SchNet")
    p.add_argument("--num_epoch", type=int, default=30)
    p.add_argument("--max_samples", type=int, default=1000)
    p.add_argument("--forces", action="store_true")
    args = p.parse_args()

    from hydragnn_tpu.config import update_config
    from hydragnn_tpu.data.dataloader import create_dataloaders, split_dataset
    from hydragnn_tpu.models.arch import arch_config_from_dict
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.train.trainer import train_validate_test

    radius = 4.0
    if args.npz and os.path.exists(args.npz):
        dataset = load_md17_npz(args.npz, args.max_samples, radius, args.forces)
    else:
        dataset = synthetic_md(args.max_samples, radius, args.forces)
    train, val, test = split_dataset(dataset, 0.8)

    heads = (
        {"node": {"num_headlayers": 2, "dim_headlayers": [32, 32],
                  "type": "mlp"}}
        if args.forces
        else {"graph": {"num_sharedlayers": 2, "dim_sharedlayers": 32,
                        "num_headlayers": 2, "dim_headlayers": [32, 32]}}
    )
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
                "output_heads": heads,
                "task_weights": [1.0],
            },
            "Variables_of_interest": {
                "input_node_features": [0],
                "output_names": ["energy"],
                "output_index": [0],
                "type": ["node" if args.forces else "graph"],
                "output_dim": [1],
                "denormalize_output": False,
            },
            "Training": {
                "num_epoch": args.num_epoch,
                "perc_train": 0.8,
                "compute_grad_energy": bool(args.forces),
                "batch_size": 32,
                "Optimizer": {"type": "AdamW", "learning_rate": 0.003},
            },
        },
    }
    config = update_config(config, train, val, test)
    loaders = create_dataloaders(train, val, test, batch_size=32)
    cfg = arch_config_from_dict(config["NeuralNetwork"])
    model = create_model(cfg)
    state, results = train_validate_test(model, cfg, config, *loaders,
                                         verbosity=1)
    print("test rmse:", results["test_rmse"])
    return results


if __name__ == "__main__":
    main()
