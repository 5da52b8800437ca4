"""SMILES -> GraphSample (ref:
hydragnn/utils/descriptors_and_embeddings/smiles_utils.py:18-127).

The reference uses rdkit (unavailable in a hermetic TPU image); this module
implements a self-contained SMILES parser covering the organic subset used by
molecular property datasets (ZINC/QM9-style): organic-subset atoms + bracket
atoms, bonds - = # : /\\, branches, two-digit (%nn) ring closures, aromatic
lowercase notation, charges, explicit H counts. Feature layout matches the
reference: [one-hot type | atomic number, aromatic, sp, sp2, sp3, num_H] and
one-hot bond-type edge features (single/double/triple/aromatic).
Hybridization is inferred: SP for a triple bond or two cumulated doubles,
SP2 for a double/aromatic bond, else SP3. Hydrogens are attached as explicit
nodes (rdkit AddHs equivalent).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import numpy as np

from hydragnn_tpu.graph import GraphSample

_STD_VALENCE = {
    "H": 1, "B": 3, "C": 4, "N": 3, "O": 2, "P": 3, "S": 2,
    "F": 1, "Cl": 1, "Br": 1, "I": 1,
}
_Z = {
    "H": 1, "B": 5, "C": 6, "N": 7, "O": 8, "F": 9, "P": 15, "S": 16,
    "Cl": 17, "Br": 35, "I": 53,
}
_BOND_ORDER = {"-": 1, "=": 2, "#": 3, ":": 1.5, "/": 1, "\\": 1}
_BOND_CLASS = {1: 0, 2: 1, 3: 2, 1.5: 3}  # single/double/triple/aromatic

_ATOM_RE = re.compile(
    r"Cl|Br|[BCNOPSFI]|b|c|n|o|p|s|\[[^\]]+\]"
)


class _Atom:
    __slots__ = ("symbol", "aromatic", "charge", "explicit_h", "in_bracket")

    def __init__(self, symbol, aromatic=False, charge=0, explicit_h=None,
                 in_bracket=False):
        self.symbol = symbol
        self.aromatic = aromatic
        self.charge = charge
        self.explicit_h = explicit_h
        self.in_bracket = in_bracket


def _parse_bracket(tok: str) -> _Atom:
    body = tok[1:-1]
    m = re.match(
        r"^(\d+)?([A-Za-z][a-z]?)(@{1,2})?(H\d*)?([+-]\d*|[+]+|[-]+)?$", body
    )
    if not m:
        raise ValueError(f"Cannot parse bracket atom {tok!r}")
    sym = m.group(2)
    aromatic = sym[0].islower()
    sym = sym.capitalize() if len(sym) == 1 else sym[0].upper() + sym[1:]
    h = m.group(4)
    nh = 0 if h is None else (1 if h == "H" else int(h[1:]))
    chg = 0
    c = m.group(5)
    if c:
        if set(c) <= {"+"}:
            chg = len(c)
        elif set(c) <= {"-"}:
            chg = -len(c)
        else:
            chg = int(c)
    return _Atom(sym, aromatic, chg, nh, True)


def parse_smiles(smiles: str):
    """Returns (atoms: List[_Atom], bonds: List[(i, j, order)])."""
    atoms: List[_Atom] = []
    bonds: List[Tuple[int, int, float]] = []
    stack: List[int] = []
    ring: Dict[str, Tuple[int, Optional[float]]] = {}
    prev: Optional[int] = None
    pending_bond: Optional[float] = None

    i = 0
    s = smiles.strip()
    while i < len(s):
        ch = s[i]
        if ch in _BOND_ORDER:
            pending_bond = _BOND_ORDER[ch]
            i += 1
            continue
        if ch == "(":
            stack.append(prev)
            i += 1
            continue
        if ch == ")":
            prev = stack.pop()
            i += 1
            continue
        if ch.isdigit() or ch == "%":
            if ch == "%":
                label = s[i : i + 3]
                i += 3
            else:
                label = ch
                i += 1
            if label in ring:
                j, order0 = ring.pop(label)
                order = pending_bond or order0
                if order is None:
                    a1, a2 = atoms[prev], atoms[j]
                    order = 1.5 if (a1.aromatic and a2.aromatic) else 1
                bonds.append((j, prev, order))
            else:
                ring[label] = (prev, pending_bond)
            pending_bond = None
            continue
        m = _ATOM_RE.match(s, i)
        if not m:
            raise ValueError(f"Cannot parse SMILES at {s[i:]!r}")
        tok = m.group(0)
        i = m.end()
        if tok.startswith("["):
            atom = _parse_bracket(tok)
        else:
            aromatic = tok[0].islower()
            sym = tok.capitalize() if len(tok) == 1 else tok
            atom = _Atom(sym, aromatic)
        atoms.append(atom)
        idx = len(atoms) - 1
        if prev is not None:
            order = pending_bond
            if order is None:
                order = 1.5 if (atoms[prev].aromatic and atom.aromatic) else 1
            bonds.append((prev, idx, order))
        pending_bond = None
        prev = idx
    if ring:
        raise ValueError(f"Unclosed ring bonds: {list(ring)}")
    return atoms, bonds


def _implicit_h(atom: _Atom, int_order_sum: int, n_aromatic_bonds: int) -> int:
    """Daylight convention: an aromatic atom's valence consumption is the
    number of aromatic bonds + 1 (the delocalized pi contribution)."""
    if atom.in_bracket:
        return atom.explicit_h or 0
    val = _STD_VALENCE.get(atom.symbol, 0)
    used = int_order_sum + n_aromatic_bonds + (1 if n_aromatic_bonds else 0)
    return max(val + (atom.charge if atom.symbol != "C" else 0) - used, 0)


def generate_graphdata_from_smilestr(
    smiles: str,
    ytarget,
    types: Optional[Dict[str, int]] = None,
) -> GraphSample:
    atoms, bonds = parse_smiles(smiles)
    if types is None:
        syms = sorted({a.symbol for a in atoms} | {"H"})
        types = {sym: k for k, sym in enumerate(syms)}

    int_order = np.zeros(len(atoms), int)
    arom_bonds = np.zeros(len(atoms), int)
    for a, b, o in bonds:
        if o == 1.5:
            arom_bonds[a] += 1
            arom_bonds[b] += 1
        else:
            int_order[a] += int(o)
            int_order[b] += int(o)

    # attach explicit hydrogens (AddHs equivalent)
    all_atoms = list(atoms)
    all_bonds = [(a, b, o) for a, b, o in bonds]
    nh_count = []
    for idx, atom in enumerate(atoms):
        nh = _implicit_h(atom, int(int_order[idx]), int(arom_bonds[idx]))
        nh_count.append(nh)
        for _ in range(nh):
            all_atoms.append(_Atom("H"))
            all_bonds.append((idx, len(all_atoms) - 1, 1))

    N = len(all_atoms)
    # hybridization inference
    n_triple = np.zeros(N, int)
    n_double = np.zeros(N, int)
    aromatic = np.array([1 if a.aromatic else 0 for a in all_atoms])
    for a, b, o in all_bonds:
        if o == 3:
            n_triple[a] += 1
            n_triple[b] += 1
        elif o == 2:
            n_double[a] += 1
            n_double[b] += 1
    sp = ((n_triple > 0) | (n_double >= 2)).astype(int)
    sp2 = ((sp == 0) & ((n_double == 1) | (aromatic == 1))).astype(int)
    sp3 = ((sp == 0) & (sp2 == 0)).astype(int)

    z = np.array([_Z.get(a.symbol, 0) for a in all_atoms], np.float32)
    type_idx = np.array([types.get(a.symbol, 0) for a in all_atoms])
    x1 = np.eye(len(types), dtype=np.float32)[type_idx]
    num_h = np.zeros(N, np.float32)
    for a, b, o in all_bonds:
        if all_atoms[b].symbol == "H":
            num_h[a] += 1
        if all_atoms[a].symbol == "H":
            num_h[b] += 1
    x2 = np.stack(
        [z, aromatic.astype(np.float32), sp.astype(np.float32),
         sp2.astype(np.float32), sp3.astype(np.float32), num_h], axis=1
    )
    x = np.concatenate([x1, x2], axis=1).astype(np.float32)

    row, col, eattr = [], [], []
    for a, b, o in all_bonds:
        cls = _BOND_CLASS[o]
        for (s_, d_) in ((a, b), (b, a)):
            row.append(s_)
            col.append(d_)
            eattr.append(np.eye(4, dtype=np.float32)[cls])
    edge_index = np.stack([row, col]).astype(np.int64)
    edge_attr = np.stack(eattr) if eattr else np.zeros((0, 4), np.float32)

    return GraphSample(
        x=x,
        pos=np.zeros((N, 3), np.float32),
        edge_index=edge_index,
        edge_attr=edge_attr,
        y_graph=np.atleast_1d(np.asarray(ytarget, np.float32)),
    )
