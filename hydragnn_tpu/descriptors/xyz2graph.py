"""Bond perception from free atoms (xyz -> molecular graph), rdkit-free.

TPU-framework equivalent of the reference's vendored ``xyz2mol`` tool
(ref: hydragnn/utils/descriptors_and_embeddings/xyz2mol.py, 1007 LoC; the
Jensen implementation of Kim & Kim, Bull. Korean Chem. Soc. 2015, 36,
1769-1777).  The reference only ever calls it to derive a SMILES string in
three example drivers (examples/ani1_x/train.py:152, qm7x/train.py:245,
transition1x/train.py:187) and all three call sites are commented out — the
live contract is "atomic numbers + coordinates -> connectivity + bond orders
+ formal charges", which is exactly what this module provides without the
rdkit/networkx mol machinery:

1. connectivity (AC) from covalent radii (ref xyz2mol.py ``get_AC``; radii
   from Cordero et al. 2008, the same table rdkit uses),
2. bond orders + formal charges by the Kim & Kim valence-saturation search
   (ref xyz2mol.py ``AC2BO``/``get_BO``/``get_UA_pairs``): enumerate per-atom
   valence assignments, pair up unsaturated atoms along existing bonds via
   maximum matching, increment bond orders until no pairing remains, accept
   the first assignment whose formal charges reproduce the total charge.

Everything is plain NumPy + stdlib; suitable for host-side dataset
preprocessing (the same place the reference runs it).
"""

from __future__ import annotations

import itertools
from typing import List, Optional, Sequence, Tuple

import numpy as np

# Covalent radii (Angstrom), Cordero et al., Dalton Trans. 2008, 2832-2838
# (single-bond radii; C is sp3). Index = atomic number. 0.0 -> unknown.
_COVALENT_RADII = {
    1: 0.31, 2: 0.28, 3: 1.28, 4: 0.96, 5: 0.84, 6: 0.76, 7: 0.71, 8: 0.66,
    9: 0.57, 10: 0.58, 11: 1.66, 12: 1.41, 13: 1.21, 14: 1.11, 15: 1.07,
    16: 1.05, 17: 1.02, 18: 1.06, 19: 2.03, 20: 1.76, 21: 1.70, 22: 1.60,
    23: 1.53, 24: 1.39, 25: 1.39, 26: 1.32, 27: 1.26, 28: 1.24, 29: 1.32,
    30: 1.22, 31: 1.22, 32: 1.20, 33: 1.19, 34: 1.20, 35: 1.20, 36: 1.16,
    37: 2.20, 38: 1.95, 39: 1.90, 40: 1.75, 41: 1.64, 42: 1.54, 43: 1.47,
    44: 1.46, 45: 1.42, 46: 1.39, 47: 1.45, 48: 1.44, 49: 1.42, 50: 1.39,
    51: 1.39, 52: 1.38, 53: 1.39, 54: 1.40, 55: 2.44, 56: 2.15, 57: 2.07,
    72: 1.75, 73: 1.70, 74: 1.62, 75: 1.51, 76: 1.44, 77: 1.41, 78: 1.36,
    79: 1.36, 80: 1.32, 81: 1.45, 82: 1.46, 83: 1.48,
}

# Allowed total valences per element, tried in order (ref xyz2mol.py
# ``atomic_valence``); atoms not listed fall back to their AC degree.
_ATOMIC_VALENCE = {
    1: [1], 5: [3, 4], 6: [4], 7: [3, 4], 8: [2, 1, 3], 9: [1], 14: [4],
    15: [5, 3], 16: [6, 3, 2], 17: [1], 32: [4], 35: [1], 53: [1],
}

# Valence electrons (ref xyz2mol.py ``atomic_valence_electrons``).
_VALENCE_ELECTRONS = {
    1: 1, 5: 3, 6: 4, 7: 5, 8: 6, 9: 7, 14: 4, 15: 5, 16: 6, 17: 7,
    32: 4, 35: 7, 53: 7,
}


def connectivity_from_positions(
    atomic_numbers: Sequence[int],
    positions: np.ndarray,
    covalent_factor: float = 1.3,
) -> np.ndarray:
    """0/1 adjacency: bond iff distance < factor * (r_cov_i + r_cov_j).

    ref: xyz2mol.py ``get_AC`` (same criterion; rdkit radii ~ Cordero).
    """
    z = np.asarray(atomic_numbers, dtype=np.int64)
    pos = np.asarray(positions, dtype=np.float64).reshape(len(z), 3)
    radii = np.array([_COVALENT_RADII.get(int(a), 1.5) for a in z])
    d = np.linalg.norm(pos[:, None, :] - pos[None, :, :], axis=-1)
    cut = covalent_factor * (radii[:, None] + radii[None, :])
    ac = (d < cut).astype(np.int64)
    np.fill_diagonal(ac, 0)
    return ac


def _get_ua(max_valences, bo_valences) -> Tuple[List[int], List[int]]:
    """Unsaturated atoms + their remaining degree of unsaturation."""
    ua, du = [], []
    for i, (mv, v) in enumerate(zip(max_valences, bo_valences)):
        if mv - v > 0:
            ua.append(i)
            du.append(mv - v)
    return ua, du


def _ua_bonds(ua: List[int], ac: np.ndarray) -> List[Tuple[int, int]]:
    return [
        (i, j) for i, j in itertools.combinations(ua, 2) if ac[i, j] == 1
    ]


def _max_matching(bonds: List[Tuple[int, int]]) -> List[Tuple[int, int]]:
    """Maximum matching among candidate unsaturated-atom bonds.

    networkx blossom matching when available (ref xyz2mol.py
    ``get_UA_pairs`` use_graph=True path); greedy-enumeration fallback
    otherwise (molecule-sized inputs only).
    """
    if not bonds:
        return []
    try:
        import networkx as nx

        g = nx.Graph()
        g.add_edges_from(bonds)
        return [tuple(sorted(e)) for e in nx.max_weight_matching(g)]
    except Exception:
        best: List[Tuple[int, int]] = []
        for size in range(len(bonds), 0, -1):
            for combo in itertools.combinations(bonds, size):
                seen = [a for b in combo for a in b]
                if len(seen) == len(set(seen)):
                    return list(combo)
        return best


def _saturate(
    ac: np.ndarray, ua: List[int], du: List[int], valences: List[int]
) -> np.ndarray:
    """Increment bond orders along matched unsaturated pairs until fixed
    point (ref xyz2mol.py ``get_BO``)."""
    bo = ac.copy()
    pairs = _max_matching(_ua_bonds(ua, ac))
    du_prev: List[int] = []
    while du_prev != du:
        for i, j in pairs:
            bo[i, j] += 1
            bo[j, i] += 1
        du_prev = list(du)
        ua, du = _get_ua(valences, bo.sum(axis=1).tolist())
        pairs = _max_matching(_ua_bonds(ua, ac))
    return bo


def _atomic_charge(z: int, bo_valence: int) -> int:
    """Formal charge (ref xyz2mol.py ``get_atomic_charge``)."""
    if z == 1:
        return 1 - bo_valence
    if z == 5:
        return 3 - bo_valence
    if z == 15 and bo_valence == 5:
        return 0
    if z == 16 and bo_valence == 6:
        return 0
    return _VALENCE_ELECTRONS.get(z, 4) - 8 + bo_valence


def _formal_charges(z, bo) -> np.ndarray:
    bo_val = bo.sum(axis=1)
    return np.array(
        [_atomic_charge(int(a), int(v)) for a, v in zip(z, bo_val)],
        dtype=np.int64,
    )


def bond_orders_from_connectivity(
    ac: np.ndarray,
    atomic_numbers: Sequence[int],
    charge: int = 0,
    allow_charged_fragments: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Kim & Kim valence-saturation search (ref xyz2mol.py ``AC2BO``).

    Returns ``(bond_order_matrix, formal_charges)``; raises ValueError when
    no valence assignment reproduces ``charge``.
    """
    z = [int(a) for a in atomic_numbers]
    ac = np.asarray(ac, dtype=np.int64)
    degrees = ac.sum(axis=1).tolist()

    # per-atom candidate valence lists, filtered to >= AC degree
    options: List[List[int]] = []
    for a, deg in zip(z, degrees):
        cand = [v for v in _ATOMIC_VALENCE.get(a, [deg]) if v >= deg]
        if not cand:
            cand = [deg]  # hypervalent vs table: take connectivity as-is
        options.append(cand)

    best: Optional[Tuple[np.ndarray, np.ndarray]] = None
    for valences in itertools.product(*options):
        ua, du = _get_ua(list(valences), degrees)
        bo = ac if not ua else _saturate(ac, ua, du, list(valences))
        if (bo.sum(axis=1) > np.array(valences)).any():
            continue
        charges = _formal_charges(z, bo)
        saturated = int((bo - ac).sum()) == sum(du)
        q_ok = (
            int(charges.sum()) == charge
            if allow_charged_fragments
            else not charges.any()
        )
        if saturated and q_ok:
            return bo, charges
        if best is None or bo.sum() > best[0].sum():
            best = (bo, charges)
    if best is not None and allow_charged_fragments:
        # no assignment hit the target charge exactly: surface the most
        # saturated one rather than failing (matches the reference's
        # permissive examples, which wrap calls in try/except)
        raise ValueError(
            f"no bond-order assignment reproduces total charge {charge} "
            f"(closest found sums to {int(best[1].sum())})"
        )
    raise ValueError("no valid bond-order assignment found")


def xyz2graph(
    atomic_numbers: Sequence[int],
    positions: np.ndarray,
    charge: int = 0,
    covalent_factor: float = 1.3,
    allow_charged_fragments: bool = True,
) -> dict:
    """Atoms + coordinates -> molecular graph with bond orders and formal
    charges (the live subset of the reference's xyz2mol contract).

    Returns dict with ``edge_index`` [2, E] (both directions, ascending
    receiver), ``bond_order`` [E], ``formal_charge`` [N], ``ac`` [N, N],
    ``bo`` [N, N].
    """
    ac = connectivity_from_positions(
        atomic_numbers, positions, covalent_factor
    )
    bo, charges = bond_orders_from_connectivity(
        ac, atomic_numbers, charge, allow_charged_fragments
    )
    recv, send = np.nonzero(bo)  # row-major: receiver-sorted
    edge_index = np.stack([send, recv]).astype(np.int64)
    return {
        "edge_index": edge_index,
        "bond_order": bo[recv, send].astype(np.float64),
        "formal_charge": charges,
        "ac": ac,
        "bo": bo,
    }
