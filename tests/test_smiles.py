"""SMILES parser (rdkit-free, ref: smiles_utils.py contract)."""

import numpy as np
import pytest

from hydragnn_tpu.descriptors.smiles_utils import (
    generate_graphdata_from_smilestr,
    parse_smiles,
)


def heavy_and_h(sample):
    z = sample.x[:, -6]  # atomic number column
    return int((z > 1).sum()), int((z == 1).sum())


def test_methane():
    s = generate_graphdata_from_smilestr("C", 0.0)
    heavy, h = heavy_and_h(s)
    assert heavy == 1 and h == 4
    assert s.num_edges == 8  # 4 bonds x 2 directions


def test_ethanol():
    s = generate_graphdata_from_smilestr("CCO", 1.5)
    heavy, h = heavy_and_h(s)
    assert heavy == 3 and h == 6  # C2H5OH
    np.testing.assert_allclose(s.y_graph, [1.5])


def test_benzene_aromatic():
    s = generate_graphdata_from_smilestr("c1ccccc1", 0.0)
    heavy, h = heavy_and_h(s)
    assert heavy == 6 and h == 6
    arom = s.x[:, -5]
    assert arom.sum() == 6
    sp2 = s.x[:, -3]
    assert sp2[:6].sum() == 6  # aromatic carbons are sp2


def test_triple_bond_sp():
    s = generate_graphdata_from_smilestr("C#N", 0.0)
    heavy, h = heavy_and_h(s)
    assert heavy == 2 and h == 1  # HCN
    sp = s.x[:, -4]
    assert sp[:2].sum() == 2


def test_branch_and_ring():
    atoms, bonds = parse_smiles("CC(C)C1CCC1")
    assert len(atoms) == 7
    # ring closure bond present: atoms 3 and 6
    assert any({a, b} == {3, 6} for a, b, _ in bonds)


def test_charged_bracket():
    s = generate_graphdata_from_smilestr("[NH4+]", 0.0)
    heavy, h = heavy_and_h(s)
    assert heavy == 1 and h == 4


def test_pyridine_vs_pyrrole():
    pyr = generate_graphdata_from_smilestr("c1ccncc1", 0.0)  # pyridine: N no H
    heavy, h = heavy_and_h(pyr)
    assert heavy == 6 and h == 5
    pyrrole = generate_graphdata_from_smilestr("c1cc[nH]c1", 0.0)
    heavy, h = heavy_and_h(pyrrole)
    assert heavy == 5 and h == 5
