"""Example smoke tests (ref: tests/test_examples.py:18-80) — run in-process
(the axon sitecustomize pins subprocesses to the TPU backend, so examples are
imported and driven with reduced sizes under the CPU-forced conftest)."""

import os
import sys

import numpy as np
import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def test_qm9_example_runs(monkeypatch):
    sys.path.insert(0, os.path.join(EXAMPLES, "qm9"))
    import qm9

    monkeypatch.setattr(
        sys, "argv", ["qm9.py", "--num_epoch", "4", "--max_samples", "80"]
    )
    results = qm9.main()
    assert np.isfinite(results["test_rmse"][0])


def test_multibranch_example_runs(monkeypatch):
    sys.path.insert(0, os.path.join(EXAMPLES, "multibranch"))
    import train as mb_train

    monkeypatch.setattr(
        sys, "argv", ["train.py", "--num_epoch", "3", "--batch_size", "16"]
    )
    mb_train.main()


def test_lj_example_runs(monkeypatch):
    sys.path.insert(0, os.path.join(EXAMPLES, "LennardJones"))
    import lennard_jones

    monkeypatch.setattr(
        sys, "argv",
        ["lennard_jones.py", "--num_epoch", "2", "--n_configs", "24",
         "--hidden_dim", "16"],
    )
    state, results = lennard_jones.main()
    assert np.isfinite(results["history"]["val_loss"][-1])


def test_hpo_example_runs(monkeypatch, tmp_path):
    sys.path.insert(0, os.path.join(EXAMPLES, "hpo"))
    import hpo_search

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(
        sys, "argv",
        ["hpo_search.py", "--trials", "2", "--epochs", "2",
         "--configs", "30"],
    )
    hpo_search.main()


def _run_driver(script_path, args, timeout=600, cwd=None):
    import subprocess

    out = subprocess.run(
        [sys.executable, script_path] + args,
        capture_output=True, text=True, timeout=timeout, cwd=cwd,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    return out.stdout


def test_dftb_example_runs(tmp_path):
    out = _run_driver(
        os.path.join(EXAMPLES, "dftb_uv_spectrum", "train.py"),
        ["--synthetic", "--n_mol", "24", "--num_epoch", "1",
         "--task", "discrete", "--hidden_dim", "16",
         "--num_conv_layers", "2", "--data", str(tmp_path / "d")],
        cwd=str(tmp_path),
    )
    assert "test_rmse" in out


def test_omat24_example_runs(tmp_path):
    out = _run_driver(
        os.path.join(EXAMPLES, "open_materials_2024", "train.py"),
        ["--synthetic", "--num_epoch", "1", "--hidden_dim", "16",
         "--num_conv_layers", "2",
         "--raw", str(tmp_path / "raw"), "--store", str(tmp_path / "st")],
        cwd=str(tmp_path),
    )
    assert "test_rmse" in out


def test_multidataset_zero_example_runs(tmp_path):
    out = _run_driver(
        os.path.join(EXAMPLES, "multidataset_zero", "train.py"),
        ["--num_epoch", "1", "--hidden_dim", "16"],
        cwd=str(tmp_path),
    )
    assert "ZeRO-1" in out and "done" in out
