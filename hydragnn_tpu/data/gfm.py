"""GFM (graph foundation model) dataset ingestion — the five SC25 datasets.

Readers for the raw public formats the reference's example drivers parse
(ref: examples/ani1_x/train.py, qm7x/train.py, mptrj/train.py,
alexandria/train.py, transition1x/train.py + transition1x/dataloader.py),
yielding a common record type, plus conversion to ``GraphSample`` (radius
graph, optional PBC) and sharded arraystore writing. The example drivers in
``examples/`` are thin wrappers over this module.

Records: dict with ``numbers`` [n], ``positions`` [n, 3], ``energy`` float,
``forces`` [n, 3] (optional), ``cell`` [3, 3] + ``pbc`` [3] (optional).
"""

from __future__ import annotations

import bz2
import glob
import json
import os
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from hydragnn_tpu.graph import GraphSample

# L2-norm threshold for atomic forces in eV/A (ref: each driver's
# forces_norm_threshold = 1000.0)
FORCES_NORM_THRESHOLD = 1000.0


def _forces_ok(forces: Optional[np.ndarray]) -> bool:
    if forces is None:
        return True
    return bool(np.all(np.linalg.norm(forces, axis=1) < FORCES_NORM_THRESHOLD))


def read_ani1x(
    path: str,
    energy_key: str = "wb97x_dz.energy",
    forces_key: str = "wb97x_dz.forces",
    limit: Optional[int] = None,
) -> Iterator[Dict]:
    """ANI-1x release h5: one group per formula with stacked conformations
    (ref: examples/ani1_x/train.py:99-249 iter_data_buckets)."""
    import h5py

    fname = (
        path if path.endswith(".h5")
        else os.path.join(path, "ani1x-release.h5")
    )
    n = 0
    with h5py.File(fname, "r") as f:
        for formula in f.keys():
            grp = f[formula]
            numbers = np.asarray(grp["atomic_numbers"])
            coords = np.asarray(grp["coordinates"])
            energies = np.asarray(grp[energy_key])
            forces = np.asarray(grp[forces_key])
            # drop NaN frames (ref: iter_data_buckets mask)
            mask = ~np.isnan(energies)
            for i in np.nonzero(mask)[0]:
                yield {
                    "numbers": numbers,
                    "positions": coords[i].astype(np.float32),
                    "energy": float(energies[i]),
                    "forces": forces[i].astype(np.float32),
                }
                n += 1
                if limit is not None and n >= limit:
                    return


def read_qm7x(path: str, limit: Optional[int] = None) -> Iterator[Dict]:
    """qm7x set hdf5 files: fMOL[idmol][idconf] groups with atXYZ/atNUM/
    ePBE0/pbe0FOR (ref: examples/qm7x/train.py:145-230)."""
    import h5py

    files = (
        [path] if path.endswith((".hdf5", ".h5"))
        else sorted(glob.glob(os.path.join(path, "*.hdf5")))
    )
    n = 0
    for fname in files:
        with h5py.File(fname, "r") as fmol:
            for mol_id in fmol.keys():
                for conf_id in fmol[mol_id].keys():
                    g = fmol[mol_id][conf_id]
                    yield {
                        "numbers": np.asarray(g["atNUM"]).ravel(),
                        "positions": np.asarray(g["atXYZ"], np.float32),
                        "energy": float(np.asarray(g["ePBE0"]).ravel()[0]),
                        "forces": np.asarray(g["pbe0FOR"], np.float32),
                    }
                    n += 1
                    if limit is not None and n >= limit:
                        return


_SYMBOLS = (
    "H He Li Be B C N O F Ne Na Mg Al Si P S Cl Ar K Ca Sc Ti V Cr Mn Fe "
    "Co Ni Cu Zn Ga Ge As Se Br Kr Rb Sr Y Zr Nb Mo Tc Ru Rh Pd Ag Cd In "
    "Sn Sb Te I Xe Cs Ba La Ce Pr Nd Pm Sm Eu Gd Tb Dy Ho Er Tm Yb Lu Hf "
    "Ta W Re Os Ir Pt Au Hg Tl Pb Bi Po At Rn Fr Ra Ac Th Pa U Np Pu Am "
    "Cm Bk Cf Es Fm Md No Lr Rf Db Sg Bh Hs Mt Ds Rg Cn Nh Fl Mc Lv Ts Og"
).split()
_Z = {s: i + 1 for i, s in enumerate(_SYMBOLS)}


def element_z(symbol: str) -> int:
    return _Z[symbol]


def read_mptrj(
    path: str, energy_per_atom: bool = True, limit: Optional[int] = None
) -> Iterator[Dict]:
    """MPtrj_2022.9_full.json: {mp_id: {traj_id: {structure, energy, force,
    ...}}} with pymatgen structure dicts — fractional coords x lattice,
    implicit 3D periodicity (ref: examples/mptrj/train.py:100-200)."""
    fname = (
        path if path.endswith(".json")
        else os.path.join(path, "MPtrj_2022.9_full.json")
    )
    with open(fname) as f:
        d = json.load(f)
    n = 0
    for mp_id, trajs in d.items():
        for traj_id, k in trajs.items():
            st = k["structure"]
            lattice = np.asarray(st["lattice"]["matrix"], np.float32)
            frac = np.asarray(
                [site["abc"] for site in st["sites"]], np.float32
            )
            numbers = np.asarray(
                [
                    element_z(site["species"][0]["element"])
                    for site in st["sites"]
                ]
            )
            energy = (
                k["energy_per_atom"]
                if energy_per_atom
                else k.get("corrected_total_energy", k.get("energy"))
            )
            yield {
                "numbers": numbers,
                "positions": frac @ lattice,
                "energy": float(energy),
                "forces": np.asarray(k["force"], np.float32),
                "cell": lattice,
                "pbc": np.array([True, True, True]),
            }
            n += 1
            if limit is not None and n >= limit:
                return


def read_alexandria(
    path: str, limit: Optional[int] = None
) -> Iterator[Dict]:
    """Alexandria json.bz2 shards: {"entries": [ComputedStructureEntry
    dicts]} with per-site forces (ref: examples/alexandria/train.py:119-403)."""
    files = (
        [path] if path.endswith((".json.bz2", ".json"))
        else sorted(
            glob.glob(os.path.join(path, "**/*.json.bz2"), recursive=True)
        )
    )
    n = 0
    for fname in files:
        if fname.endswith(".bz2"):
            with open(fname, "rb") as f:
                data = json.loads(bz2.decompress(f.read()).decode("utf-8"))
        else:
            with open(fname) as f:
                data = json.load(f)
        for entry in data["entries"]:
            st = entry["structure"]
            pos = np.asarray(
                [site["xyz"] for site in st["sites"]], np.float32
            )
            numbers = np.asarray(
                [
                    element_z(site["species"][0]["element"])
                    for site in st["sites"]
                ]
            )
            forces = np.asarray(
                [site["properties"]["forces"] for site in st["sites"]],
                np.float32,
            )
            cell = np.asarray(st["lattice"]["matrix"], np.float32)
            pbc = np.asarray(
                st["lattice"].get("pbc", (True, True, True)), bool
            )
            yield {
                "numbers": numbers,
                "positions": pos,
                "energy": float(entry["energy"]),
                "forces": forces,
                "cell": cell,
                "pbc": pbc,
            }
            n += 1
            if limit is not None and n >= limit:
                return


def read_transition1x(
    path: str,
    datasplit: str = "data",
    limit: Optional[int] = None,
) -> Iterator[Dict]:
    """transition1x-release.h5: split/formula/rxn/ groups with stacked
    frames of positions + wB97x_6-31G(d) energy/forces
    (ref: examples/transition1x/dataloader.py:22-97)."""
    import h5py

    fname = (
        path if path.endswith(".h5")
        else os.path.join(path, "transition1x-release.h5")
    )
    n = 0
    with h5py.File(fname, "r") as f:
        split = f[datasplit]
        for formula in split.keys():
            for rxn, subgrp in split[formula].items():
                groups = (
                    [subgrp[k] for k in subgrp.keys()
                     if "positions" in subgrp[k]]
                    if "positions" not in subgrp
                    else [subgrp]
                )
                for grp in groups:
                    numbers = np.asarray(grp["atomic_numbers"]).ravel()
                    energies = np.asarray(grp["wB97x_6-31G(d).energy"])
                    forces = np.asarray(grp["wB97x_6-31G(d).forces"])
                    positions = np.asarray(grp["positions"])
                    for i in range(positions.shape[0]):
                        yield {
                            "numbers": numbers,
                            "positions": positions[i].astype(np.float32),
                            "energy": float(energies[i]),
                            "forces": forces[i].astype(np.float32),
                        }
                        n += 1
                        if limit is not None and n >= limit:
                            return


def iter_extxyz_frames(path: str, limit: Optional[int] = None) -> Iterator[Dict]:
    """Multi-frame extended-XYZ reader with Properties= column parsing
    (forces columns included) — the OC22/ODAC23 trajectory dump format
    (ref: examples/open_catalyst_2022/train.py:49 ``ase.io.read`` over
    trajectory files). Accepts a file or a directory of ``*.xyz``/
    ``*.extxyz`` files."""
    import glob as _glob
    import re as _re

    if os.path.isdir(path):
        files = sorted(
            _glob.glob(os.path.join(path, "*.xyz"))
            + _glob.glob(os.path.join(path, "*.extxyz"))
        )
    else:
        files = [path]
    from hydragnn_tpu.data.raw_loaders import _SYMBOL_Z

    n_out = 0
    for fp in files:
        with open(fp) as f:
            lines = f.readlines()
        i = 0
        while i < len(lines):
            line = lines[i].strip()
            if not line:
                i += 1
                continue
            nat = int(line.split()[0])
            comment = lines[i + 1]
            cell = None
            m = _re.search(r'Lattice="([^"]+)"', comment)
            if m:
                cell = np.array(
                    [float(x) for x in m.group(1).split()]
                ).reshape(3, 3)
            energy = None
            m = _re.search(r"\benergy=([-\d.eE+]+)", comment)
            if m:
                energy = float(m.group(1))
            pbc = np.array([cell is not None] * 3)
            m = _re.search(r'pbc="([^"]+)"', comment)
            if m:
                pbc = np.array(
                    [t in ("T", "True", "1") for t in m.group(1).split()]
                )
            # Properties=species:S:1:pos:R:3:forces:R:3 -> column layout.
            # Species/pos/forces offsets all come from the same parse so a
            # frame with extra per-atom fields before pos still reads
            # correctly (default layout when no Properties= spec present).
            species_col, pos_col, force_col = 0, 1, None
            m = _re.search(r"Properties=(\S+)", comment)
            if m:
                toks = m.group(1).split(":")
                col = 0
                for k in range(0, len(toks), 3):
                    width = int(toks[k + 2])
                    if toks[k] == "forces":
                        force_col = col
                    elif toks[k] == "species":
                        species_col = col
                    elif toks[k] == "pos":
                        pos_col = col
                    col += width
            numbers, pos, forces = [], [], []
            for row in lines[i + 2 : i + 2 + nat]:
                c = row.split()
                s = c[species_col]
                numbers.append(_SYMBOL_Z.get(s) or int(float(s)))
                pos.append([float(v) for v in c[pos_col : pos_col + 3]])
                if force_col is not None and len(c) >= force_col + 3:
                    forces.append(
                        [float(v) for v in c[force_col : force_col + 3]]
                    )
            if energy is not None:
                yield {
                    "numbers": np.asarray(numbers, np.int64),
                    "positions": np.asarray(pos, np.float32),
                    "cell": cell,
                    "pbc": pbc,
                    "energy": energy,
                    "forces": (
                        np.asarray(forces, np.float32)
                        if len(forces) == nat else None
                    ),
                }
                n_out += 1
                if limit is not None and n_out >= limit:
                    return
            i += 2 + nat


def read_oc22(path: str, limit: Optional[int] = None) -> Iterator[Dict]:
    """Open Catalyst 2022: extxyz trajectory frames, PBC slabs, TOTAL DFT
    energy + forces (ref: examples/open_catalyst_2022/train.py:75-160)."""
    return iter_extxyz_frames(path, limit=limit)


def read_odac23(path: str, limit: Optional[int] = None) -> Iterator[Dict]:
    """Open Direct Air Capture 2023: MOF + CO2/H2O sorbate frames, same
    trajectory dump format (ref: examples/open_direct_air_capture_2023/
    download_dataset.sh)."""
    return iter_extxyz_frames(path, limit=limit)


def _iter_asedb(path: str, limit: Optional[int] = None) -> Iterator[Dict]:
    import glob as _glob

    from hydragnn_tpu.data.asedb import read_ase_sqlite

    if os.path.isdir(path):
        files = sorted(
            _glob.glob(os.path.join(path, "*.db"))
            + _glob.glob(os.path.join(path, "*.aselmdb"))
        )
    else:
        files = [path]
    n = 0
    for fp in files:
        for rec in read_ase_sqlite(fp):
            if rec["energy"] is None:
                continue
            yield rec
            n += 1
            if limit is not None and n >= limit:
                return


def read_omat24(path: str, limit: Optional[int] = None) -> Iterator[Dict]:
    """Open Materials 2024: ASE-DB shards of rattled/AIMD inorganic
    crystals, PBC energy+forces (ref: examples/open_materials_2024/
    omat24.py:96 AseDBDataset)."""
    return _iter_asedb(path, limit=limit)


def read_omol25(path: str, limit: Optional[int] = None) -> Iterator[Dict]:
    """Open Molecules 2025: ASE-DB shards of molecules/complexes, no PBC
    (ref: examples/open_molecules_2025/omol25.py AseDBDataset)."""
    return _iter_asedb(path, limit=limit)


READERS = {
    "ani1x": read_ani1x,
    "qm7x": read_qm7x,
    "mptrj": read_mptrj,
    "alexandria": read_alexandria,
    "transition1x": read_transition1x,
    "oc22": read_oc22,
    "odac23": read_odac23,
    "omat24": read_omat24,
    "omol25": read_omol25,
}


def write_synthetic_raw(name: str, path: str, n_mol: int = 4,
                        n_conf: int = 3, seed: int = 0) -> str:
    """Write a tiny synthetic raw file in the REAL on-disk format of each
    dataset (exercises the production parsers without network access;
    useful for CI and the examples' --synthetic mode). Returns the file
    path the matching reader accepts."""
    rng = np.random.RandomState(seed)
    os.makedirs(path, exist_ok=True)

    def mol(nat):
        pos = (rng.randn(nat, 3) * 1.5).astype(np.float32)
        numbers = rng.choice([1, 6, 7, 8], nat)
        e = float(rng.randn())
        forces = rng.randn(nat, 3).astype(np.float32)
        return numbers, pos, e, forces

    if name == "ani1x":
        import h5py

        fname = os.path.join(path, "ani1x-release.h5")
        with h5py.File(fname, "w") as f:
            for i in range(n_mol):
                nat = int(rng.randint(3, 7))
                numbers, _, _, _ = mol(nat)
                g = f.create_group(f"C{i}H{nat}")
                g["atomic_numbers"] = numbers
                g["coordinates"] = np.stack(
                    [mol(nat)[1] for _ in range(n_conf)]
                )
                g["wb97x_dz.energy"] = rng.randn(n_conf)
                g["wb97x_dz.forces"] = rng.randn(n_conf, nat, 3)
        return fname
    if name == "qm7x":
        import h5py

        fname = os.path.join(path, "1000.hdf5")
        with h5py.File(fname, "w") as f:
            for i in range(n_mol):
                m = f.create_group(f"Geom-m{i}")
                nat = int(rng.randint(3, 7))
                numbers, _, _, _ = mol(nat)
                for j in range(n_conf):
                    g = m.create_group(f"Geom-m{i}-i1-c1-opt{j}")
                    g["atNUM"] = numbers
                    g["atXYZ"] = mol(nat)[1]
                    g["ePBE0"] = np.asarray([rng.randn()])
                    g["pbe0FOR"] = rng.randn(nat, 3)
        return fname
    if name == "mptrj":
        fname = os.path.join(path, "MPtrj_2022.9_full.json")
        d = {}
        for i in range(n_mol):
            trajs = {}
            for j in range(n_conf):
                nat = int(rng.randint(2, 6))
                lattice = (np.eye(3) * 5.0 + rng.rand(3, 3)).tolist()
                sites = [
                    {
                        "abc": rng.rand(3).tolist(),
                        "species": [{"element": rng.choice(
                            ["Li", "Fe", "O", "Si"])}],
                    }
                    for _ in range(nat)
                ]
                trajs[f"mp-{i}-{j}"] = {
                    "structure": {
                        "lattice": {"matrix": lattice},
                        "sites": sites,
                    },
                    "energy_per_atom": float(rng.randn()),
                    "corrected_total_energy": float(rng.randn()) * nat,
                    "force": rng.randn(nat, 3).tolist(),
                }
            d[f"mp-{i}"] = trajs
        with open(fname, "w") as f:
            json.dump(d, f)
        return fname
    if name == "alexandria":
        fname = os.path.join(path, "alexandria_000.json.bz2")
        entries = []
        for i in range(n_mol * n_conf):
            nat = int(rng.randint(2, 6))
            lattice = (np.eye(3) * 5.0 + rng.rand(3, 3)).tolist()
            sites = [
                {
                    "xyz": (rng.rand(3) * 5.0).tolist(),
                    "species": [{"element": rng.choice(
                        ["Na", "Cl", "O", "Al"])}],
                    "properties": {"forces": rng.randn(3).tolist(),
                                   "magmom": 0.0},
                }
                for _ in range(nat)
            ]
            entries.append({
                "structure": {
                    "lattice": {"matrix": lattice,
                                "pbc": (True, True, True)},
                    "sites": sites,
                },
                "energy": float(rng.randn()) * nat,
                "data": {"mat_id": f"agm-{i}"},
            })
        with open(fname, "wb") as f:
            f.write(bz2.compress(json.dumps(
                {"entries": entries}).encode("utf-8")))
        return fname
    if name == "transition1x":
        import h5py

        fname = os.path.join(path, "transition1x-release.h5")
        with h5py.File(fname, "w") as f:
            data = f.create_group("data")
            for i in range(n_mol):
                nat = int(rng.randint(3, 7))
                numbers, _, _, _ = mol(nat)
                rxn = data.create_group(f"C{i}H{nat}").create_group(
                    f"rxn{i}"
                )
                for part in ("reactant", "product", "transition_state"):
                    g = rxn.create_group(part)
                    g["atomic_numbers"] = numbers
                    g["positions"] = np.stack(
                        [mol(nat)[1] for _ in range(n_conf)]
                    )
                    g["wB97x_6-31G(d).energy"] = rng.randn(n_conf)
                    g["wB97x_6-31G(d).forces"] = rng.randn(n_conf, nat, 3)
        return fname
    if name in ("oc22", "odac23"):
        # multi-frame extended XYZ with Lattice + forces columns
        fname = os.path.join(path, f"{name}_trajectories.extxyz")
        sym = {1: "H", 6: "C", 8: "O", 29: "Cu", 30: "Zn"}
        with open(fname, "w") as f:
            for i in range(n_mol * n_conf):
                nat = int(rng.randint(6, 12))
                numbers, pos, e, forces = mol(nat)
                numbers = rng.choice([1, 6, 8, 29, 30], nat)
                a = 8.0 + rng.rand() * 2
                pos = (pos % a).astype(np.float32)
                f.write(f"{nat}\n")
                f.write(
                    f'Lattice="{a} 0 0 0 {a} 0 0 0 {a}" '
                    'Properties=species:S:1:pos:R:3:forces:R:3 '
                    f'energy={e * nat:.6f} pbc="T T T"\n'
                )
                for z, p, fo in zip(numbers, pos, forces):
                    f.write(
                        f"{sym[int(z)]} "
                        + " ".join(f"{v:.6f}" for v in p)
                        + " "
                        + " ".join(f"{v:.6f}" for v in fo)
                        + "\n"
                    )
        return path
    if name in ("omat24", "omol25"):
        from hydragnn_tpu.data.asedb import write_ase_sqlite

        recs = []
        for i in range(n_mol * n_conf):
            nat = int(rng.randint(4, 10))
            numbers, pos, e, forces = mol(nat)
            rec = {
                "numbers": numbers,
                "positions": pos,
                "energy": e,
                "forces": forces,
                "key_value_pairs": {"source": name},
            }
            if name == "omat24":
                a = 6.0 + rng.rand() * 2
                rec["cell"] = np.eye(3) * a
                rec["pbc"] = [True, True, True]
                rec["positions"] = (pos % a).astype(np.float32)
            recs.append(rec)
        # two shards, like the real release's sharded aselmdb layout
        half = len(recs) // 2
        write_ase_sqlite(os.path.join(path, f"{name}_0000.db"), recs[:half])
        write_ase_sqlite(os.path.join(path, f"{name}_0001.db"), recs[half:])
        return path
    raise ValueError(name)


def record_to_sample(
    rec: Dict,
    radius: float,
    max_neighbours: int = 64,
    energy_per_atom: bool = True,
) -> Optional[GraphSample]:
    """Common conversion (ref: each driver's Data construction): node
    features x = atomic number, graph energy target (per atom by default,
    SC25 convention), nodal forces; radius graph with PBC when a cell is
    present; force-norm screening."""
    from hydragnn_tpu.data.neighbors import radius_graph, radius_graph_pbc

    pos = np.asarray(rec["positions"], np.float32)
    numbers = np.asarray(rec["numbers"], np.float32).reshape(-1, 1)
    forces = rec.get("forces")
    if forces is not None:
        forces = np.asarray(forces, np.float32)
        if not _forces_ok(forces):
            return None
    energy = float(rec["energy"])
    if energy_per_atom and not rec.get("energy_is_per_atom", False):
        energy = energy / max(pos.shape[0], 1)
    shifts = None
    if rec.get("cell") is not None and np.any(rec.get("pbc", False)):
        ei, shifts = radius_graph_pbc(
            pos, np.asarray(rec["cell"], np.float32), radius,
            max_num_neighbors=max_neighbours,
        )
    else:
        ei = radius_graph(pos, radius, max_num_neighbors=max_neighbours)
    return GraphSample(
        x=numbers,
        pos=pos,
        edge_index=ei,
        edge_shifts=shifts,
        y_graph=np.asarray([energy], np.float32),
        energy=np.asarray([energy], np.float32),
        forces=forces,
    )


def ingest(
    name: str,
    raw_path: str,
    store_root: str,
    radius: float = 5.0,
    max_neighbours: int = 64,
    perc_train: float = 0.9,
    energy_per_atom: bool = True,
    limit: Optional[int] = None,
    shard_rank: int = 0,
) -> int:
    """Read a raw dataset, build graphs, split, write arraystore shards
    (trainset/valset/testset groups — the AdiosWriter step of each
    reference driver). Returns the number of samples written."""
    from hydragnn_tpu.data.arraystore import GraphStoreWriter
    from hydragnn_tpu.data.dataloader import split_dataset

    reader = READERS[name]
    samples: List[GraphSample] = []
    for rec in reader(raw_path, limit=limit):
        s = record_to_sample(
            rec, radius, max_neighbours, energy_per_atom
        )
        if s is not None and s.num_edges > 0:
            samples.append(s)
    train, val, test = split_dataset(samples, perc_train)
    for split, data in (
        ("trainset", train), ("valset", val), ("testset", test)
    ):
        w = GraphStoreWriter(
            os.path.join(store_root, split), rank=shard_rank,
            attrs={"dataset": name, "ndata": len(data)},
        )
        w.extend(data)
        w.save()
    return len(samples)
