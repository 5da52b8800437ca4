"""REAL 2-process jax.distributed run — the faithful analogue of the
reference CI's ``mpirun -np 2 --oversubscribe`` job
(ref: .github/workflows/CI.yml:49-55).

Spawns two OS processes that form an actual jax.distributed cluster on
localhost (CPU backend, one virtual device each) and run, without any
monkeypatching: chunked ``bulk_broadcast``, ``process_allgather_small``,
``reduce_timers`` MIN/MAX/AVG, and ``run_training`` end-to-end under
``jax.process_count() == 2``. The monkeypatch-based unit checks in
tests/test_utilities.py remain as fast single-process coverage.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_jax_distributed(tmp_path):
    worker = os.path.join(os.path.dirname(__file__), "_jaxdist_worker.py")
    coordinator = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(pid),
             str(tmp_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"WORKER {pid} OK" in out, out[-4000:]

    reports = []
    for pid in range(2):
        with open(tmp_path / f"report_p{pid}.json") as f:
            reports.append(json.load(f))
    for r in reports:
        assert r["bulk_broadcast"] == "ok"
        assert r["allgather"] == "ok"
        assert r["reduce_timers"] == "ok"
        assert r["test_loss"] == r["test_loss"]  # finite (not NaN)
    # the log tree (config snapshot) is written by process 0 only
    assert reports[0]["n_log_configs"] >= 1
