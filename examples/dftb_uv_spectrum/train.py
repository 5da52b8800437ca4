"""DFTB UV-spectrum example: per-molecule directories (smiles.pdb +
EXC.DAT / EXC-smooth.DAT) -> molecular graphs -> high-dimensional
graph-level spectrum regression
(ref: examples/dftb_uv_spectrum/train_discrete_uv_spectrum.py and
train_smooth_uv_spectrum.py — rdkit MolFromPDBFile with proximity
bonding; here the rdkit-free equivalent: a plain PDB coordinate parser +
covalent-radii bond perception from hydragnn_tpu.descriptors.xyz2graph).

Tasks:
  --task discrete  EXC.DAT: 50 excitation energies + 50 oscillator
                   strengths -> two 50-dim graph heads (ref:
                   train_discrete_uv_spectrum.py:64-68)
  --task smooth    EXC-smooth.DAT: smoothed spectrum on a fixed frequency
                   grid -> one wide graph head (37500 points in the real
                   data; --n_points for smoke runs) (ref:
                   train_smooth_uv_spectrum.py:62-66)

Real data:  python examples/dftb_uv_spectrum/train.py --data <gdb9-ex dir>
Smoke:      python examples/dftb_uv_spectrum/train.py --synthetic
"""

from __future__ import annotations

import argparse
import os
import random
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

# GDB-9 chemical space (ref: train_*_uv_spectrum.py dftb_node_types)
DFTB_NODE_TYPES = {"C": 0, "F": 1, "H": 2, "N": 3, "O": 4, "S": 5}
_Z = {"H": 1, "C": 6, "N": 7, "O": 8, "F": 9, "S": 16}


def read_pdb(path):
    """Minimal PDB reader: element symbols + coordinates from
    ATOM/HETATM records (rdkit MolFromPDBFile's input subset)."""
    syms, pos = [], []
    with open(path) as f:
        for line in f:
            if not line.startswith(("ATOM", "HETATM")):
                continue
            el = line[76:78].strip() if len(line) >= 78 else ""
            if not el:
                el = "".join(c for c in line[12:16].strip() if c.isalpha())
                el = el[:2].capitalize() if el[:2].capitalize() in _Z else el[0]
            syms.append(el.capitalize() if len(el) > 1 else el.upper())
            pos.append([float(line[30:38]), float(line[38:46]),
                        float(line[46:54])])
    return syms, np.asarray(pos, np.float64)


def mol_to_sample(moldir, task, n_points):
    """smiles.pdb + spectrum file -> GraphSample. Node features mirror the
    reference's rdkit featurization: 6-type one-hot + [z, aromatic, sp,
    sp2, sp3, numH] = 12 input features (ref:
    smiles_utils.generate_graphdata_from_rdkit_molecule)."""
    from hydragnn_tpu.descriptors.xyz2graph import xyz2graph
    from hydragnn_tpu.graph import GraphSample

    syms, pos = read_pdb(os.path.join(moldir, "smiles.pdb"))
    zs = [_Z[s] for s in syms]
    g = xyz2graph(zs, pos, allow_charged_fragments=False)
    ei, bo = g["edge_index"], g["bond_order"]

    n = len(zs)
    type_idx = np.asarray([DFTB_NODE_TYPES[s] for s in syms])
    x1 = np.eye(len(DFTB_NODE_TYPES), dtype=np.float32)[type_idx]
    n_double = np.zeros(n)
    n_triple = np.zeros(n)
    num_h = np.zeros(n)
    for (s_, d_), o in zip(ei.T, bo):
        if o >= 3:
            n_triple[d_] += 1
        elif o >= 2:
            n_double[d_] += 1
        if zs[s_] == 1:
            num_h[d_] += 1
    sp = ((n_triple > 0) | (n_double >= 2)).astype(np.float32)
    sp2 = ((sp == 0) & (n_double == 1)).astype(np.float32)
    sp3 = ((sp == 0) & (sp2 == 0)).astype(np.float32)
    x2 = np.stack(
        [np.asarray(zs, np.float32), np.zeros(n, np.float32), sp, sp2, sp3,
         num_h.astype(np.float32)], axis=1
    )
    x = np.concatenate([x1, x2], axis=1)

    if task == "discrete":
        dat = np.loadtxt(os.path.join(moldir, "EXC.DAT"), skiprows=4,
                         usecols=(0, 1), dtype=np.float32)
        y = dat.T.ravel()  # [energies..., oscillator strengths...]
    else:
        y = np.loadtxt(os.path.join(moldir, "EXC-smooth.DAT"), usecols=1,
                       dtype=np.float32)
    if n_points is not None:
        if task == "discrete":
            per_head = len(y) // 2
            k = min(n_points, per_head)
            y = np.concatenate([y[:k], y[per_head:per_head + k]])
        else:
            y = y[:n_points]
    return GraphSample(
        x=x.astype(np.float32),
        pos=pos.astype(np.float32),
        edge_index=ei,
        y_graph=np.asarray(y, np.float32),
    )


# --- synthetic GDB9-like molecules (no-download smoke path) ---------------

_TEMPLATES = [
    # (symbols, coordinates) — small organic molecules with real geometry
    (["C", "H", "H", "H", "H"],
     [[0, 0, 0], [0.63, 0.63, 0.63], [-0.63, -0.63, 0.63],
      [-0.63, 0.63, -0.63], [0.63, -0.63, -0.63]]),
    (["O", "H", "H"], [[0, 0, 0], [0.76, 0.59, 0], [-0.76, 0.59, 0]]),
    (["C", "C", "O", "H", "H", "H", "H", "H", "H"],
     [[0, 0, 0], [1.51, 0, 0], [2.07, 1.25, 0],
      [-0.39, 1.02, 0], [-0.39, -0.51, 0.89], [-0.39, -0.51, -0.89],
      [1.9, -0.52, 0.88], [1.9, -0.52, -0.88], [3.03, 1.18, 0]]),
    (["N", "H", "H", "H"],
     [[0, 0, 0], [0.94, 0.33, 0], [-0.47, 0.33, 0.82], [-0.47, 0.33, -0.82]]),
]


def synthesize(data_dir, n_mol, n_exc, n_points, seed=5):
    rng = np.random.RandomState(seed)
    for k in range(n_mol):
        moldir = os.path.join(data_dir, f"mol_{k:06d}")
        os.makedirs(moldir, exist_ok=True)
        syms, coords = _TEMPLATES[k % len(_TEMPLATES)]
        pos = np.asarray(coords, np.float64) + rng.randn(len(syms), 3) * 0.03
        with open(os.path.join(moldir, "smiles.pdb"), "w") as f:
            for i, (s, p) in enumerate(zip(syms, pos)):
                f.write(
                    f"HETATM{i + 1:5d} {s:<3s} UNL     1    "
                    f"{p[0]:8.3f}{p[1]:8.3f}{p[2]:8.3f}  1.00  0.00"
                    f"          {s:>2s}\n"
                )
            f.write("END\n")
        # discrete: n_exc excitation energies (eV, sorted) + strengths
        e = np.sort(rng.uniform(2.0, 10.0, n_exc)).astype(np.float32)
        osc = np.abs(rng.randn(n_exc)).astype(np.float32) * 0.3
        with open(os.path.join(moldir, "EXC.DAT"), "w") as f:
            f.write("#\n#\n#\n#\n")
            for a, b in zip(e, osc):
                f.write(f"{a:.5f} {b:.5f}\n")
        # smooth: Gaussian-broadened spectrum on a fixed grid
        grid = np.linspace(0.0, 12.0, n_points, dtype=np.float32)
        spec = np.zeros_like(grid)
        for a, b in zip(e, osc):
            spec += b * np.exp(-0.5 * ((grid - a) / 0.15) ** 2)
        np.savetxt(os.path.join(moldir, "EXC-smooth.DAT"),
                   np.stack([grid, spec], 1), fmt="%.6f")
    print(f"wrote {n_mol} synthetic molecule dirs -> {data_dir}")


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    p = argparse.ArgumentParser()
    p.add_argument("--task", choices=["discrete", "smooth"],
                   default="discrete")
    p.add_argument("--data", default=os.path.join(here, "dataset"))
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--n_mol", type=int, default=120)
    p.add_argument("--n_exc", type=int, default=20)
    p.add_argument("--n_points", type=int, default=None,
                   help="truncate spectra to this many points per head")
    p.add_argument("--hidden_dim", type=int, default=64)
    p.add_argument("--num_conv_layers", type=int, default=4)
    p.add_argument("--num_epoch", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--mpnn_type", default="PNA")
    args = p.parse_args()

    if args.synthetic:
        if args.n_points is None:
            args.n_points = 64
        synthesize(args.data, args.n_mol, args.n_exc,
                   max(args.n_points, 64))

    from hydragnn_tpu.config import update_config
    from hydragnn_tpu.data.dataloader import create_dataloaders
    from hydragnn_tpu.models.arch import arch_config_from_dict
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.train.trainer import train_validate_test

    dirlist = sorted(
        d for d in os.listdir(args.data)
        if os.path.isdir(os.path.join(args.data, d))
    )
    samples = [
        mol_to_sample(os.path.join(args.data, d), args.task, args.n_points)
        for d in dirlist
    ]
    random.Random(0).shuffle(samples)
    n = len(samples)
    i0, i1 = int(0.8 * n), int(0.9 * n)
    train, val, test = samples[:i0], samples[i0:i1], samples[i1:]
    print(f"dftb[{args.task}]: {n} molecules "
          f"({len(train)}/{len(val)}/{len(test)}), "
          f"y dim {train[0].y_graph.shape[0]}")

    ydim = int(train[0].y_graph.shape[0])
    if args.task == "discrete":
        heads = {
            "output_names": ["frequencies", "intensities"],
            "output_index": [0, 1],
            "type": ["graph", "graph"],
            "output_dim": [ydim // 2, ydim // 2],
        }
        task_weights = [1.0, 1.0]
    else:
        heads = {
            "output_names": ["spectrum"],
            "output_index": [0],
            "type": ["graph"],
            "output_dim": [ydim],
        }
        task_weights = [1.0]

    config = {
        "Verbosity": {"level": 1},
        "NeuralNetwork": {
            "Architecture": {
                "mpnn_type": args.mpnn_type,
                "hidden_dim": args.hidden_dim,
                "num_conv_layers": args.num_conv_layers,
                "output_heads": {
                    "graph": {
                        "num_sharedlayers": 1,
                        "dim_sharedlayers": args.hidden_dim,
                        "num_headlayers": 2,
                        "dim_headlayers": [args.hidden_dim, args.hidden_dim],
                    }
                },
                "task_weights": task_weights,
            },
            "Variables_of_interest": {
                "input_node_features": list(range(12)),
                "denormalize_output": False,
                **heads,
            },
            "Training": {
                "num_epoch": args.num_epoch,
                "perc_train": 0.8,
                "batch_size": args.batch_size,
                "Optimizer": {"type": "AdamW", "learning_rate": 1e-3},
            },
        },
    }
    config = update_config(config, train, val, test)
    loaders = create_dataloaders(train, val, test,
                                 batch_size=args.batch_size)
    cfg = arch_config_from_dict(config["NeuralNetwork"])
    model = create_model(cfg)
    state, results = train_validate_test(
        model, cfg, config, *loaders, verbosity=1
    )
    print("test_rmse:", results["test_rmse"])


if __name__ == "__main__":
    main()
