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


def _write_eam_cfg(dirpath, seed, n_side=2):
    """NiNb-like extended CFG with aux columns (c_peratom fx fy fz) and a
    .bulk sidecar, the reference CFGDataset shape (ref: cfgdataset.py:40-84)."""
    rng = np.random.RandomState(seed)
    a = 3.5
    lines = [
        f"Number of particles = {n_side ** 3}",
        "A = 1.0 Angstrom",
    ]
    for i in range(3):
        for j in range(3):
            v = a * n_side if i == j else 0.0
            lines.append(f"H0({i + 1},{j + 1}) = {v}")
    lines += [".NO_VELOCITY.", "entry_count = 7",
              "auxiliary[0] = c_peratom", "auxiliary[1] = fx",
              "auxiliary[2] = fy", "auxiliary[3] = fz"]
    for k, (sym, mass) in enumerate([("Ni", 58.69), ("Nb", 92.91)]):
        lines += [f"{mass}", sym]
        for idx in range(n_side ** 3 // 2):
            frac = rng.rand(3)
            aux = rng.randn(4) * 0.1
            lines.append(" ".join(
                f"{v:.6f}" for v in list(frac) + list(aux)))
    fp = dirpath / f"cfg_{seed}.cfg"
    fp.write_text("\n".join(lines) + "\n")
    (dirpath / f"cfg_{seed}.bulk").write_text(f"{rng.rand() * 100:.4f}\n")
    return fp


def test_read_cfg_aux_columns(tmp_path):
    fp = _write_eam_cfg(tmp_path, 0)
    zs, pos, cell, info = read_cfg(str(fp))
    assert zs.shape == (8,)
    assert info["masses"].shape == (8,)
    np.testing.assert_allclose(info["masses"][:4], 58.69)
    np.testing.assert_allclose(info["masses"][4:], 92.91)
    assert info["aux"].shape == (8, 4)


def test_load_raw_dataset_cfg(tmp_path):
    from hydragnn_tpu.data.rawdataset import load_raw_dataset

    for seed in range(4):
        _write_eam_cfg(tmp_path, seed)
    config = {
        "Dataset": {
            "name": "NiNb",
            "format": "CFG",
            "path": {"total": str(tmp_path)},
            "node_features": {
                "name": ["num_of_protons", "atomic_masses", "atomic_energy"],
                "dim": [1, 1, 1],
                "column_index": [0, 1, 2],
            },
            "graph_features": {
                "name": ["bulk_modulus"], "dim": [1], "column_index": [0],
            },
        },
        "NeuralNetwork": {
            "Architecture": {
                "radius": 3.0,
                "max_neighbours": 20,
                "periodic_boundary_conditions": True,
                "edge_features": ["lengths"],
            },
            "Variables_of_interest": {
                "input_node_features": [0],
                "output_names": ["atomic_energy"],
                "output_index": [2],
                "type": ["node"],
            },
        },
    }
    samples = load_raw_dataset(config, str(tmp_path))
    assert len(samples) == 4
    s = samples[0]
    assert s.x.shape == (8, 1)
    assert s.y_node.shape == (8, 1)
    # normalized to [0, 1]
    assert s.x.min() >= 0.0 and s.x.max() <= 1.0
    # PBC graph with Cartesian shifts and edge-length features
    assert s.edge_shifts is not None and s.edge_attr is not None
    assert config["NeuralNetwork"]["Variables_of_interest"]["y_minmax"]


def test_load_raw_dataset_xyz_graph_target(tmp_path):
    from hydragnn_tpu.data.rawdataset import load_raw_dataset

    rng = np.random.RandomState(3)
    for i in range(3):
        pos = rng.rand(5, 3) * 2
        rows = "\n".join(
            f"C {p[0]:.4f} {p[1]:.4f} {p[2]:.4f}" for p in pos
        )
        (tmp_path / f"m{i}.xyz").write_text(f"5\nframe {i}\n{rows}\n")
        (tmp_path / f"m{i}_energy.txt").write_text(f"{rng.randn():.5f}\n")
    config = {
        "Dataset": {
            "name": "xyzset",
            "format": "XYZ",
            "path": {"total": str(tmp_path)},
            "node_features": {
                "name": ["num_of_protons"], "dim": [1], "column_index": [0],
            },
            "graph_features": {
                "name": ["energy"], "dim": [1], "column_index": [0],
            },
        },
        "NeuralNetwork": {
            "Architecture": {"radius": 4.0, "max_neighbours": 10},
            "Variables_of_interest": {
                "input_node_features": [0],
                "output_names": ["energy"],
                "output_index": [0],
                "type": ["graph"],
            },
        },
    }
    samples = load_raw_dataset(config, str(tmp_path))
    assert len(samples) == 3
    assert samples[0].y_graph.shape == (1,)
    assert samples[0].x.shape == (5, 1)


def test_eam_example_smoke(tmp_path):
    """examples/eam end-to-end in --synthetic mode (ref: examples/eam/eam.py)."""
    import os
    import subprocess
    import sys

    driver = os.path.join(
        os.path.dirname(__file__), "..", "examples", "eam", "eam.py"
    )
    out = subprocess.run(
        [
            sys.executable, driver, "--synthetic", "--configs", "12",
            "--num_epoch", "1",
            "--raw", str(tmp_path / "raw"),
        ],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path),
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "epoch 0" in out.stdout


def test_descriptor_edge_transforms():
    """Spherical / LocalCartesian / PointPairFeatures edge descriptors
    (ref: abstractrawdataset.py:115-140)."""
    import pytest

    from hydragnn_tpu.graph import GraphSample
    from hydragnn_tpu.data.transforms import (
        add_local_cartesian_edge_features,
        add_point_pair_features,
        add_spherical_edge_features,
        apply_structure_transforms,
    )

    rng = np.random.RandomState(1)
    pos = rng.randn(6, 3).astype(np.float32)
    ei = np.array([[0, 1, 2, 3, 4, 5], [1, 2, 3, 4, 5, 0]])
    s = GraphSample(x=np.ones((6, 1), np.float32), pos=pos, edge_index=ei)

    sph = add_spherical_edge_features(s)
    assert sph.edge_attr.shape == (6, 3)
    d = np.linalg.norm(pos[ei[1]] - pos[ei[0]], axis=1)
    np.testing.assert_allclose(sph.edge_attr[:, 0], d, rtol=1e-5)
    assert (sph.edge_attr[:, 1] >= 0).all()
    assert (sph.edge_attr[:, 1] <= 2 * np.pi).all()
    assert (sph.edge_attr[:, 2] >= 0).all()
    assert (sph.edge_attr[:, 2] <= np.pi).all()
    # reconstruct the vector from (rho, theta, phi)
    rho, th, ph = sph.edge_attr.T.astype(np.float64)
    rec = np.stack([rho * np.sin(ph) * np.cos(th),
                    rho * np.sin(ph) * np.sin(th),
                    rho * np.cos(ph)], 1)
    np.testing.assert_allclose(rec, pos[ei[1]] - pos[ei[0]], atol=1e-5)

    lc = add_local_cartesian_edge_features(s)
    assert lc.edge_attr.shape == (6, 3)
    assert (lc.edge_attr >= 0).all() and (lc.edge_attr <= 1).all()

    ppf = add_point_pair_features(s)
    assert ppf.edge_attr.shape == (6, 4)
    np.testing.assert_allclose(ppf.edge_attr[:, 0], d, rtol=1e-5)
    assert (ppf.edge_attr[:, 1:] >= 0).all()
    assert (ppf.edge_attr[:, 1:] <= np.pi + 1e-6).all()

    cfg = {
        "Dataset": {"Descriptors": {"SphericalCoordinates": True}},
        "NeuralNetwork": {"Architecture": {"edge_features": ["lengths"]}},
    }
    out = apply_structure_transforms([s], cfg)
    # descriptor replaces the plain length feature (no duplicate distance)
    assert out[0].edge_attr.shape == (6, 3)

    with pytest.raises(ValueError):
        apply_structure_transforms([s], {
            "Dataset": {"Descriptors": {"SphericalCoordinates": True,
                                        "PointPairFeatures": True}},
            "NeuralNetwork": {"Architecture": {}},
        })
