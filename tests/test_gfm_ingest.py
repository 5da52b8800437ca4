"""GFM dataset ingestion: the five SC25 raw-format parsers (ANI1x, qm7x,
MPTrj, Alexandria, transition1x) through synthetic raw files written in the
REAL on-disk formats, arraystore staging, and one training smoke run
(ref: examples/ani1_x/train.py, qm7x/train.py, mptrj/train.py,
alexandria/train.py, transition1x/train.py)."""

import os

import numpy as np
import pytest

from hydragnn_tpu.data.arraystore import GraphArrayStore
from hydragnn_tpu.data.gfm import (
    READERS,
    ingest,
    record_to_sample,
    write_synthetic_raw,
)


@pytest.mark.parametrize("name", sorted(READERS))
def test_reader_roundtrip(name, tmp_path):
    raw = write_synthetic_raw(name, str(tmp_path / "raw"), n_mol=4, n_conf=3)
    recs = list(READERS[name](raw))
    assert len(recs) >= 6
    for rec in recs:
        assert rec["positions"].shape[1] == 3
        assert rec["numbers"].shape[0] == rec["positions"].shape[0]
        assert np.isfinite(rec["energy"])
        assert rec["forces"].shape == rec["positions"].shape
    # limit caps reads
    assert len(list(READERS[name](raw, limit=3))) == 3


@pytest.mark.parametrize("name", sorted(READERS))
def test_ingest_writes_store(name, tmp_path):
    raw = write_synthetic_raw(name, str(tmp_path / "raw"), n_mol=6, n_conf=4)
    n = ingest(name, raw, str(tmp_path / "store"), radius=6.0)
    assert n > 0
    train = GraphArrayStore(str(tmp_path / "store" / "trainset"))
    s = train[0]
    assert s.num_edges > 0
    assert s.energy is not None and s.forces is not None
    # per-atom energy convention (SC25 default)
    assert abs(float(s.energy)) < 50.0


def test_record_to_sample_pbc_uses_shifts():
    rng = np.random.RandomState(0)
    rec = {
        "numbers": np.array([1, 8]),
        "positions": np.asarray([[0.1, 0.1, 0.1], [4.9, 4.9, 4.9]],
                                np.float32),
        "energy": -1.0,
        "forces": rng.randn(2, 3).astype(np.float32),
        "cell": np.eye(3, dtype=np.float32) * 5.0,
        "pbc": np.array([True, True, True]),
    }
    s = record_to_sample(rec, radius=1.0, max_neighbours=8)
    # across the periodic boundary the two atoms are ~0.35 A apart
    assert s.num_edges > 0
    assert s.edge_shifts is not None


def test_record_to_sample_screens_huge_forces():
    rec = {
        "numbers": np.array([1, 1]),
        "positions": np.zeros((2, 3), np.float32),
        "energy": 0.0,
        "forces": np.full((2, 3), 1e5, np.float32),
    }
    assert record_to_sample(rec, radius=2.0) is None


def test_gfm_driver_synthetic_smoke(tmp_path):
    """The shared example driver end-to-end in --synthetic mode (the
    no-download CI path of the five GFM examples)."""
    import subprocess
    import sys

    driver = os.path.join(
        os.path.dirname(__file__), "..", "examples", "transition1x",
        "train.py",
    )
    out = subprocess.run(
        [
            sys.executable, driver, "--synthetic", "--num_epoch", "2",
            "--hidden_dim", "16", "--num_conv_layers", "2",
            "--raw", str(tmp_path / "raw"),
            "--store", str(tmp_path / "store"),
        ],
        capture_output=True, text=True, timeout=900, cwd=str(tmp_path),
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "test_rmse" in out.stdout
