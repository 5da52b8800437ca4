import numpy as np

from hydragnn_tpu.data.raw_loaders import read_cfg, read_xyz


def test_read_extended_xyz(tmp_path):
    p = tmp_path / "a.xyz"
    p.write_text(
        '3\nLattice="5 0 0 0 5 0 0 0 5" energy=-1.25\n'
        "O 0.0 0.0 0.0\nH 0.75 0.5 0.0\nH -0.75 0.5 0.0\n"
    )
    zs, pos, cell, info = read_xyz(str(p))
    np.testing.assert_array_equal(zs, [8, 1, 1])
    np.testing.assert_allclose(cell, np.eye(3) * 5)
    np.testing.assert_allclose(info["energy"], -1.25)
    np.testing.assert_allclose(pos[1], [0.75, 0.5, 0.0])


def test_read_extended_cfg(tmp_path):
    p = tmp_path / "a.cfg"
    p.write_text(
        "Number of particles = 2\n"
        "A = 1.0 Angstrom\n"
        "H0(1,1) = 4.0\nH0(1,2) = 0.0\nH0(1,3) = 0.0\n"
        "H0(2,1) = 0.0\nH0(2,2) = 4.0\nH0(2,3) = 0.0\n"
        "H0(3,1) = 0.0\nH0(3,2) = 0.0\nH0(3,3) = 4.0\n"
        ".NO_VELOCITY.\nentry_count = 3\n"
        "55.85\nFe\n0.0 0.0 0.0\n0.5 0.5 0.5\n"
    )
    zs, pos, cell, _ = read_cfg(str(p))
    np.testing.assert_array_equal(zs, [26, 26])
    np.testing.assert_allclose(pos[1], [2.0, 2.0, 2.0])
    np.testing.assert_allclose(cell, np.eye(3) * 4)
