"""LSMS enthalpy conversion (ref: tests/test_enthalpy.py:21-64)."""

import os

import numpy as np
import pytest

from hydragnn_tpu.lsms.enthalpy import (
    compute_formation_enthalpy,
    convert_raw_data_energy_to_gibbs,
    mixing_entropy,
)


def _write_lsms(path, e_total, types):
    rows = []
    for i, t in enumerate(types):
        rows.append(f"{t}\t{i}\t{i * 1.0}\t0.0\t0.0")
    with open(path, "w") as f:
        f.write(f"{e_total}\n" + "\n".join(rows) + "\n")


def test_formation_enthalpy_pure_is_zero():
    pure = {26.0: -2.0, 29.0: -3.0}
    comp, lin, h, s = compute_formation_enthalpy(
        [26.0, 29.0], pure, total_energy=-8.0, atom_types=np.array([26.0] * 4)
    )
    assert comp == 1.0
    np.testing.assert_allclose(h, 0.0, atol=1e-12)
    np.testing.assert_allclose(s, 0.0, atol=1e-6)


def test_formation_enthalpy_mixture():
    pure = {26.0: -2.0, 29.0: -3.0}
    types = np.array([26.0, 26.0, 29.0, 29.0])
    e_total = 4 * (-2.6)  # 0.1 Ry/atom below linear mixing (-2.5)
    comp, lin, h, s = compute_formation_enthalpy([26.0, 29.0], pure, e_total, types)
    np.testing.assert_allclose(comp, 0.5)
    np.testing.assert_allclose(lin, -10.0)
    np.testing.assert_allclose(h, -0.1, rtol=1e-10)
    assert s > 0


def test_convert_dir_roundtrip(tmp_path):
    d = tmp_path / "raw"
    os.makedirs(d)
    _write_lsms(d / "pure1.txt", -8.0, [26.0] * 4)
    _write_lsms(d / "pure2.txt", -12.0, [29.0] * 4)
    _write_lsms(d / "mix.txt", -10.4, [26.0, 26.0, 29.0, 29.0])
    out = convert_raw_data_energy_to_gibbs(str(d), [26.0, 29.0])
    with open(os.path.join(out, "mix.txt")) as f:
        g = float(f.readline().split()[0])
    np.testing.assert_allclose(g, -0.1, rtol=1e-8)
    with open(os.path.join(out, "pure1.txt")) as f:
        g = float(f.readline().split()[0])
    np.testing.assert_allclose(g, 0.0, atol=1e-10)
