"""NiNb EAM bulk-alloy example (ref: examples/eam/eam.py + the four
NiNb_EAM_*.json configs).

The reference trains on the OLCF NiNb solid-solution EAM dataset
(10.13139_OLCF_1890159): AtomEye CFG snapshots with per-atom energies and
forces in the auxiliary columns plus a ``.bulk`` sidecar carrying the bulk
modulus, loaded through CFGDataset (ref: utils/datasets/cfgdataset.py).
That dataset requires an OLCF download, so ``--synthetic`` generates the
same shape from a surrogate EAM potential (pair term + sqrt-embedding) on
rattled FCC NiNb solid solutions, written in the exact extended-CFG layout
the real dumps use — the real parser, normalizer, PBC radius-graph builder
and trainer run either way (hydragnn_tpu/data/rawdataset.py).

Tasks (pick with --inputfile, same names as the reference):
  NiNb_EAM_energy.json     node atomic_energy head
  NiNb_EAM_bulk.json       graph bulk-modulus head
  NiNb_EAM_multitask.json  node atomic_energy + atomic_forces heads

Usage:
  python examples/eam/eam.py --synthetic [--configs 160]
  python examples/eam/eam.py --inputfile NiNb_EAM_multitask.json \
      --raw <download>/NiNb_solid_solution
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

NI, NB = 28, 41
MASS = {NI: 58.6934, NB: 92.90637}
# surrogate EAM parameters (Ni/Nb-flavored; arbitrary but physical shape)
PAIR_A = {NI: 0.45, NB: 0.60}
PAIR_R0 = {NI: 2.49, NB: 2.86}
RHO_BETA = {NI: 1.8, NB: 1.6}
CUT = 4.2


def fcc_solid_solution(rng, n_side=3, x_nb=None):
    """Rattled FCC lattice with random Ni/Nb occupancy."""
    a = 3.57
    base = np.array(
        [[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]]
    )
    cells = np.stack(
        np.meshgrid(*[np.arange(n_side)] * 3, indexing="ij"), -1
    ).reshape(-1, 3)
    frac = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) / n_side
    cell = np.eye(3) * a * n_side
    pos = frac @ cell
    pos += rng.randn(*pos.shape) * 0.06
    if x_nb is None:
        x_nb = rng.uniform(0.05, 0.5)
    zs = np.where(rng.rand(len(pos)) < x_nb, NB, NI)
    return zs, pos, cell


def eam_energy_forces(zs, pos, cell):
    """Surrogate EAM: E_i = sum_j phi(r_ij)/2 - sqrt(rho_i); analytic forces."""
    from hydragnn_tpu.data.neighbors import radius_graph_pbc

    # ensure_connected=False: physics-label graph (see LennardJones note)
    ei, shifts = radius_graph_pbc(
        pos.astype(np.float32), cell.astype(np.float32), CUT,
        max_num_neighbors=48, ensure_connected=False,
    )
    s, r = ei
    d = pos[r] - pos[s] + shifts  # Cartesian shifts (data/neighbors.py:85-103)
    dist = np.linalg.norm(d, axis=1)
    u = d / dist[:, None]
    A = 0.5 * (np.vectorize(PAIR_A.get)(zs[s])
               + np.vectorize(PAIR_A.get)(zs[r]))
    r0 = 0.5 * (np.vectorize(PAIR_R0.get)(zs[s])
                + np.vectorize(PAIR_R0.get)(zs[r]))
    phi = A * np.exp(-2.2 * (dist - r0)) - A
    dphi = -2.2 * A * np.exp(-2.2 * (dist - r0))
    beta = np.vectorize(RHO_BETA.get)(zs[s])
    rho_c = np.exp(-beta * (dist - 2.5))
    drho = -beta * rho_c
    n = len(zs)
    rho = np.zeros(n)
    np.add.at(rho, r, rho_c)
    rho = np.maximum(rho, 1e-8)
    node_e = -np.sqrt(rho)
    np.add.at(node_e, r, 0.5 * phi)
    # dE/dr_i = sum over edges into/out of i of (phi' + F'_r rho'_sr) u
    Fp_r = -0.5 / np.sqrt(rho)
    dEdr_edge = 0.5 * dphi + Fp_r[r] * drho + 0.5 * dphi + Fp_r[s] * drho
    forces = np.zeros_like(pos)
    np.add.at(forces, r, -dEdr_edge[:, None] * u)
    np.add.at(forces, s, dEdr_edge[:, None] * u)
    return node_e, forces


def write_cfg(path, zs, pos, cell, node_e, forces):
    """Extended CFG with auxiliary c_peratom/fx/fy/fz columns — the NiNb
    EAM dump layout (ref: cfgdataset.py:55-65)."""
    frac = pos @ np.linalg.inv(cell)
    lines = [f"Number of particles = {len(zs)}", "A = 1.0 Angstrom"]
    for i in range(3):
        for j in range(3):
            lines.append(f"H0({i + 1},{j + 1}) = {cell[i, j]:.8f}")
    lines += [".NO_VELOCITY.", "entry_count = 7",
              "auxiliary[0] = c_peratom", "auxiliary[1] = fx",
              "auxiliary[2] = fy", "auxiliary[3] = fz"]
    sym = {NI: "Ni", NB: "Nb"}
    for z in (NI, NB):
        idx = np.nonzero(zs == z)[0]
        if not len(idx):
            continue
        lines += [f"{MASS[z]}", sym[z]]
        for i in idx:
            row = list(frac[i]) + [node_e[i]] + list(forces[i])
            lines.append(" ".join(f"{v:.8f}" for v in row))
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def synthesize(raw_dir, n_configs, seed=7):
    rng = np.random.RandomState(seed)
    os.makedirs(raw_dir, exist_ok=True)
    for k in range(n_configs):
        zs, pos, cell = fcc_solid_solution(rng)
        node_e, forces = eam_energy_forces(zs, pos, cell)
        stem = os.path.join(raw_dir, f"NiNb_{k:05d}")
        write_cfg(stem + ".cfg", zs, pos, cell, node_e, forces)
        # bulk modulus surrogate: Vegard-like mix + noise (GPa)
        x_nb = float((zs == NB).mean())
        bulk = 180.0 * (1 - x_nb) + 170.0 * x_nb + rng.randn() * 2.0
        # real OLCF .bulk sidecars carry three tokens with the bulk
        # modulus at token 2 (ref config NiNb_EAM_bulk.json graph_features
        # column_index [2]; cfg_raw_dataset_loader.py:96-104 indexes the
        # first line's tokens at that column) — emit the same layout
        e_total = float(node_e.sum())
        with open(stem + ".bulk", "w") as f:
            f.write(f"{e_total:.6f} {x_nb:.4f} {bulk:.4f}\n")
    print(f"wrote {n_configs} CFG+bulk configs -> {raw_dir}")


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    p = argparse.ArgumentParser()
    p.add_argument("--inputfile", default="NiNb_EAM_energy.json")
    p.add_argument("--raw", default=os.path.join(here, "dataset", "raw"))
    p.add_argument("--synthetic", action="store_true",
                   help="generate surrogate NiNb CFG data first")
    p.add_argument("--configs", type=int, default=160)
    p.add_argument("--num_epoch", type=int, default=None)
    p.add_argument("--preonly", action="store_true",
                   help="generate data only, no training")
    args = p.parse_args()

    if args.synthetic:
        synthesize(args.raw, args.configs)
        if args.preonly:
            return

    from hydragnn_tpu.run import run_training

    with open(os.path.join(here, args.inputfile)) as f:
        config = json.load(f)
    config["Dataset"]["path"] = {"total": args.raw}
    if args.num_epoch is not None:
        config["NeuralNetwork"]["Training"]["num_epoch"] = args.num_epoch
    run_training(config)


if __name__ == "__main__":
    main()
