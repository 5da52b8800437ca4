"""ASE-DB sqlite reader/writer + multi-frame extxyz parsing
(ref: examples/open_materials_2024/omat24.py AseDBDataset usage,
examples/open_catalyst_2022/train.py trajectory reading)."""

import numpy as np

from hydragnn_tpu.data.asedb import read_ase_sqlite, write_ase_sqlite
from hydragnn_tpu.data.gfm import iter_extxyz_frames, record_to_sample


def test_asedb_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    recs = []
    for i in range(5):
        nat = 4 + i
        recs.append({
            "numbers": rng.choice([1, 6, 8], nat),
            "positions": rng.rand(nat, 3) * 5,
            "cell": np.eye(3) * 6.0,
            "pbc": [True, True, True],
            "energy": float(rng.randn()),
            "forces": rng.randn(nat, 3),
            "key_value_pairs": {"spin": 1},
        })
    fp = write_ase_sqlite(str(tmp_path / "x.db"), recs)
    out = list(read_ase_sqlite(fp))
    assert len(out) == 5
    for a, b in zip(recs, out):
        np.testing.assert_array_equal(a["numbers"], b["numbers"])
        np.testing.assert_allclose(a["positions"], b["positions"])
        np.testing.assert_allclose(a["cell"], b["cell"])
        np.testing.assert_allclose(a["forces"], b["forces"])
        assert b["pbc"].all()
        assert abs(a["energy"] - b["energy"]) < 1e-12
        assert b["key_value_pairs"]["spin"] == 1


def test_asedb_molecule_no_cell(tmp_path):
    rec = {
        "numbers": [1, 1, 8],
        "positions": np.random.rand(3, 3),
        "energy": -76.4,
        "forces": None,
    }
    fp = write_ase_sqlite(str(tmp_path / "m.db"), [rec])
    out = list(read_ase_sqlite(fp))[0]
    assert out["cell"] is None
    assert not out["pbc"].any()
    assert out["forces"] is None
    s = record_to_sample(out, radius=2.0)
    assert s is not None and s.num_edges > 0


def test_iter_extxyz_frames(tmp_path):
    fp = tmp_path / "traj.extxyz"
    fp.write_text(
        "2\n"
        'Lattice="4 0 0 0 4 0 0 0 4" '
        'Properties=species:S:1:pos:R:3:forces:R:3 energy=-3.5 pbc="T T T"\n'
        "Cu 0 0 0 0.1 0.2 0.3\n"
        "O 1 1 1 -0.1 -0.2 -0.3\n"
        "3\n"
        'Properties=species:S:1:pos:R:3 energy=1.5\n'
        "H 0 0 0\nH 0.7 0 0\nO 0.35 0.5 0\n"
    )
    frames = list(iter_extxyz_frames(str(fp)))
    assert len(frames) == 2
    f0, f1 = frames
    np.testing.assert_array_equal(f0["numbers"], [29, 8])
    np.testing.assert_allclose(f0["cell"], np.eye(3) * 4)
    np.testing.assert_allclose(f0["forces"][1], [-0.1, -0.2, -0.3])
    assert f0["pbc"].all()
    assert f0["energy"] == -3.5
    assert f1["cell"] is None and f1["forces"] is None
    assert f1["energy"] == 1.5
    # PBC graph build through the shared record path
    s = record_to_sample(f0, radius=3.0)
    assert s is not None and s.edge_shifts is not None
