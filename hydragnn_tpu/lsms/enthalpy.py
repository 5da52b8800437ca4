"""Total energy -> formation enthalpy / Gibbs energy conversion for LSMS
binary-alloy data (ref:
hydragnn/utils/lsms/convert_total_energy_to_formation_gibbs.py:22-220).

H_f = E_total/N - sum_i c_i * E_pure_i ;  G_f = H_f - T * S_mix with the
ideal mixing entropy S = -k_B [c ln c + (1-c) ln(1-c)].
"""

from __future__ import annotations

import math
import os
import shutil
from typing import Dict, List, Sequence, Tuple

import numpy as np

KB_RYDBERG = 6.3336e-6  # Boltzmann constant in Rydberg/K


def mixing_entropy(composition: float, kb: float = KB_RYDBERG) -> float:
    c = min(max(composition, 1e-12), 1 - 1e-12)
    return -kb * (c * math.log(c) + (1 - c) * math.log(1 - c))


def compute_formation_enthalpy(
    elements_list: Sequence[float],
    pure_elements_energy: Dict[float, float],
    total_energy: float,
    atom_types: np.ndarray,
) -> Tuple[float, float, float, float]:
    """Returns (composition_of_element1, linear_mixing_energy,
    formation_enthalpy, entropy). Binary alloys only (ref: :143-220)."""
    elements_list = sorted(elements_list)
    assert len(elements_list) == 2, "binary alloys only"
    elements, counts = np.unique(atom_types, return_counts=True)
    for e in elements:
        assert e in elements_list, f"unexpected element {e}"
    cdict = {e: 0 for e in elements_list}
    for e, c in zip(elements, counts):
        cdict[e] = int(c)
    n = sum(cdict.values())
    comp1 = cdict[elements_list[0]] / n
    linear_mixing = n * (
        comp1 * pure_elements_energy[elements_list[0]]
        + (1 - comp1) * pure_elements_energy[elements_list[1]]
    )
    formation_enthalpy = (total_energy - linear_mixing) / n
    return comp1, linear_mixing, formation_enthalpy, mixing_entropy(comp1)


def convert_raw_data_energy_to_gibbs(
    dir: str,
    elements_list: Sequence[float],
    temperature_kelvin: float = 0.0,
    overwrite_data: bool = False,
) -> str:
    """Rewrite LSMS files replacing total energy with formation Gibbs energy
    (ref: :30-141). Returns the output directory."""
    dir = dir.rstrip("/")
    new_dir = dir + "_gibbs_energy/"
    if os.path.exists(new_dir) and overwrite_data:
        shutil.rmtree(new_dir)
    os.makedirs(new_dir, exist_ok=True)

    elements_list = sorted(elements_list)
    pure: Dict[float, float] = {}
    files = sorted(os.listdir(dir))
    for fname in files:
        with open(os.path.join(dir, fname)) as f:
            txt = f.readlines()
        e_tot = float(txt[0].split()[0])
        atoms = np.loadtxt(txt[1:])
        types = np.unique(np.atleast_2d(atoms)[:, 0])
        if len(types) == 1:
            pure[float(types[0])] = e_tot / np.atleast_2d(atoms).shape[0]
    assert len(pure) == 2, "Must have two single element files."

    for fname in files:
        path = os.path.join(dir, fname)
        with open(path) as f:
            txt = f.readlines()
        e_txt = txt[0].split()[0]
        atoms = np.atleast_2d(np.loadtxt(txt[1:]))
        comp1, _, h_f, s = compute_formation_enthalpy(
            elements_list, pure, float(e_txt), atoms[:, 0]
        )
        g_f = h_f - temperature_kelvin * s
        txt[0] = txt[0].replace(e_txt, str(g_f))
        with open(os.path.join(new_dir, fname), "w") as f:
            f.write("".join(txt))
    return new_dir
