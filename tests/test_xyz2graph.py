"""Bond perception (xyz2graph) vs known molecules.

Mirrors the contract of the reference's vendored xyz2mol
(hydragnn/utils/descriptors_and_embeddings/xyz2mol.py): connectivity from
covalent radii, Kim & Kim bond orders, formal charges.
"""

import numpy as np
import pytest

from hydragnn_tpu.descriptors.xyz2graph import (
    bond_orders_from_connectivity,
    connectivity_from_positions,
    xyz2graph,
)


def test_water_connectivity_and_orders():
    z = [8, 1, 1]
    pos = np.array([[0.0, 0.0, 0.0], [0.96, 0.0, 0.0], [-0.24, 0.93, 0.0]])
    g = xyz2graph(z, pos)
    assert g["bo"][0, 1] == 1 and g["bo"][0, 2] == 1
    assert g["bo"][1, 2] == 0  # no H-H bond
    assert not g["formal_charge"].any()
    # edge_index is bidirectional and receiver-sorted
    assert g["edge_index"].shape == (2, 4)
    assert (np.diff(g["edge_index"][1]) >= 0).all()


def test_co2_double_bonds():
    z = [6, 8, 8]
    pos = np.array([[0.0, 0.0, 0.0], [1.16, 0.0, 0.0], [-1.16, 0.0, 0.0]])
    g = xyz2graph(z, pos)
    assert g["bo"][0, 1] == 2 and g["bo"][0, 2] == 2
    assert not g["formal_charge"].any()


def test_n2_triple_bond():
    g = xyz2graph([7, 7], np.array([[0.0, 0.0, 0.0], [1.10, 0.0, 0.0]]))
    assert g["bo"][0, 1] == 3
    assert not g["formal_charge"].any()


def test_benzene_alternating_and_valences():
    # planar C6H6, standard geometry
    rc, rh = 1.39, 2.48
    ang = np.arange(6) * np.pi / 3
    c = np.stack([rc * np.cos(ang), rc * np.sin(ang), np.zeros(6)], axis=1)
    h = np.stack([rh * np.cos(ang), rh * np.sin(ang), np.zeros(6)], axis=1)
    z = [6] * 6 + [1] * 6
    g = xyz2graph(z, np.concatenate([c, h]))
    bo = g["bo"]
    ring = [bo[i, (i + 1) % 6] for i in range(6)]
    assert sorted(ring) == [1, 1, 1, 2, 2, 2]  # kekule alternation
    assert all(bo[i].sum() == 4 for i in range(6))  # carbon valence
    assert not g["formal_charge"].any()


def test_nitrate_anion_charge():
    # NO3^- : one N=O, two N-O(-); formal charges sum to -1 with N(+1)
    r = 1.27
    ang = np.arange(3) * 2 * np.pi / 3
    o = np.stack([r * np.cos(ang), r * np.sin(ang), np.zeros(3)], axis=1)
    pos = np.concatenate([np.zeros((1, 3)), o])
    g = xyz2graph([7, 8, 8, 8], pos, charge=-1)
    assert int(g["formal_charge"].sum()) == -1
    assert g["formal_charge"][0] == 1  # N+
    assert sorted(g["bo"][0, 1:]) == [1, 1, 2]


def test_acetylene():
    # HC#CH
    pos = np.array(
        [
            [0.0, 0.0, 0.0],
            [1.20, 0.0, 0.0],
            [-1.06, 0.0, 0.0],
            [2.26, 0.0, 0.0],
        ]
    )
    g = xyz2graph([6, 6, 1, 1], pos)
    assert g["bo"][0, 1] == 3
    assert not g["formal_charge"].any()


def test_impossible_charge_raises():
    ac = np.array([[0, 1], [1, 0]])
    with pytest.raises(ValueError):
        bond_orders_from_connectivity(ac, [6, 6], charge=7)


def test_connectivity_cutoff_scaling():
    z = [6, 6]
    pos = np.array([[0.0, 0.0, 0.0], [1.9, 0.0, 0.0]])
    assert connectivity_from_positions(z, pos)[0, 1] == 1  # 1.3 factor
    assert connectivity_from_positions(z, pos, 1.1)[0, 1] == 0
