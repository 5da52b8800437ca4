"""Raw-format readers: extended-XYZ and AtomEye CFG (ase-free).

Replaces the reference's ASE-backed CFG/XYZ loaders (ref:
hydragnn/preprocess/cfg_raw_dataset_loader.py, utils/datasets/cfgdataset.py,
xyzdataset.py). Each returns (atomic_numbers [n], positions [n,3],
cell [3,3] or None, info dict).
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import numpy as np

_SYMBOL_Z = {
    "H": 1, "He": 2, "Li": 3, "Be": 4, "B": 5, "C": 6, "N": 7, "O": 8,
    "F": 9, "Ne": 10, "Na": 11, "Mg": 12, "Al": 13, "Si": 14, "P": 15,
    "S": 16, "Cl": 17, "Ar": 18, "K": 19, "Ca": 20, "Sc": 21, "Ti": 22,
    "V": 23, "Cr": 24, "Mn": 25, "Fe": 26, "Co": 27, "Ni": 28, "Cu": 29,
    "Zn": 30, "Ga": 31, "Ge": 32, "As": 33, "Se": 34, "Br": 35, "Kr": 36,
    "Rb": 37, "Sr": 38, "Y": 39, "Zr": 40, "Nb": 41, "Mo": 42, "Ru": 44,
    "Rh": 45, "Pd": 46, "Ag": 47, "Cd": 48, "In": 49, "Sn": 50, "Sb": 51,
    "Te": 52, "I": 53, "Xe": 54, "Cs": 55, "Ba": 56, "W": 74, "Re": 75,
    "Os": 76, "Ir": 77, "Pt": 78, "Au": 79, "Hg": 80, "Pb": 82, "Bi": 83,
}


def read_xyz(path: str) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray], Dict]:
    """Plain or extended XYZ. Extended-XYZ 'Lattice=\"...\"' parsed if present."""
    with open(path) as f:
        lines = f.readlines()
    n = int(lines[0].split()[0])
    comment = lines[1]
    cell = None
    m = re.search(r'Lattice="([^"]+)"', comment)
    if m:
        v = np.array([float(x) for x in m.group(1).split()])
        cell = v.reshape(3, 3)
    info: Dict = {"comment": comment.strip()}
    for kv in re.finditer(r"(\w+)=([-\d.eE+]+)", comment):
        try:
            info[kv.group(1)] = float(kv.group(2))
        except ValueError:
            pass
    zs, pos = [], []
    for row in lines[2 : 2 + n]:
        cols = row.split()
        sym = cols[0]
        z = _SYMBOL_Z.get(sym) or int(float(sym))
        zs.append(z)
        pos.append([float(c) for c in cols[1:4]])
    return (
        np.asarray(zs, np.float32),
        np.asarray(pos, np.float32),
        None if cell is None else cell.astype(np.float32),
        info,
    )


def read_cfg(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray, Dict]:
    """AtomEye (extended) CFG: H0 cell matrix + fractional coordinates
    (ref: CFG_RawDataLoader parsing via ase.io)."""
    with open(path) as f:
        lines = [l.strip() for l in f if l.strip() and not l.startswith("#")]
    n = None
    H = np.zeros((3, 3))
    entry_count = 3
    aux_count = 0
    i = 0
    body_start = None
    no_velocity = False
    for i, line in enumerate(lines):
        m = re.match(r"Number of particles\s*=\s*(\d+)", line)
        if m:
            n = int(m.group(1))
            continue
        m = re.match(
            r"H0\((\d),(\d)\)\s*=\s*([-\d.eE+]+)", line
        )
        if m:
            H[int(m.group(1)) - 1, int(m.group(2)) - 1] = float(m.group(3))
            continue
        if line.startswith(".NO_VELOCITY."):
            no_velocity = True
            continue
        m = re.match(r"entry_count\s*=\s*(\d+)", line)
        if m:
            entry_count = int(m.group(1))
            continue
        if re.match(r"auxiliary\[", line):
            aux_count += 1
            continue
        if n is not None and re.match(r"^[-\d.eE+]+(\s|$)", line):
            # body can be (a) mass line, symbol line, coord lines (extended)
            # or (b) rows of mass sym x y z ... (standard)
            body_start = i
            break
    assert n is not None, f"no particle count in {path}"
    zs, fracs, masses, aux_rows = [], [], [], []
    # columns after the fractional xyz (+velocities unless .NO_VELOCITY.) are
    # the ``auxiliary[k]`` per-atom properties (ref: cfgdataset.py reads
    # c_peratom/fx/fy/fz from ase_object.arrays)
    vel_cols = 0 if no_velocity else 3
    j = body_start
    cur_z = None
    cur_mass = None
    while j < len(lines) and len(fracs) < n:
        toks = lines[j].split()
        if len(toks) == 1 and re.match(r"^[\d.]+$", toks[0]):
            # extended CFG: mass line followed by symbol line
            cur_mass = float(toks[0])
            sym = lines[j + 1].split()[0]
            cur_z = _SYMBOL_Z.get(sym) or int(float(sym))
            j += 2
            continue
        if len(toks) >= 5 and toks[1] in _SYMBOL_Z:
            # standard CFG row: mass symbol x y z [vel] [aux...]
            zs.append(_SYMBOL_Z[toks[1]])
            masses.append(float(toks[0]))
            fracs.append([float(toks[2]), float(toks[3]), float(toks[4])])
            aux_rows.append([float(t) for t in toks[5 + vel_cols:]])
        else:
            assert cur_z is not None, f"coordinate row before species in {path}"
            zs.append(cur_z)
            masses.append(cur_mass if cur_mass is not None else 0.0)
            fracs.append([float(toks[0]), float(toks[1]), float(toks[2])])
            aux_rows.append([float(t) for t in toks[3 + vel_cols:]])
        j += 1
    fracs = np.asarray(fracs)
    pos = fracs @ H
    n_aux = min((len(r) for r in aux_rows), default=0)
    aux = np.asarray(
        [r[:n_aux] for r in aux_rows], np.float32
    ).reshape(len(aux_rows), n_aux)
    return (
        np.asarray(zs, np.float32),
        pos.astype(np.float32),
        H.astype(np.float32),
        {"masses": np.asarray(masses, np.float32), "aux": aux},
    )
