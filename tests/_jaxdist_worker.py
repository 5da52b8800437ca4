"""Worker for the REAL 2-process jax.distributed test.

Launched by tests/test_multiprocess_real.py as ``python _jaxdist_worker.py
<coordinator> <num_procs> <pid> <workdir>``. The faithful analogue of the
reference CI's ``mpirun -n 2 --oversubscribe`` job
(ref: .github/workflows/CI.yml:49-55): every collective below runs over an
actual 2-process jax.distributed cluster — nothing is monkeypatched.
"""

import json
import os
import sys


def main():
    coordinator, num_procs, pid, workdir = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4],
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_procs,
        process_id=pid,
    )
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import numpy as np

    assert jax.process_count() == num_procs, jax.process_count()
    assert jax.device_count() == num_procs, jax.device_count()

    report = {"pid": pid}

    # --- bulk_broadcast (chunked path: chunk_bytes smaller than payload)
    from hydragnn_tpu.utils.multihost import (
        bulk_broadcast,
        process_allgather_small,
    )

    payload = (
        np.arange(70_000, dtype=np.float32).reshape(700, 100)
        if pid == 0
        else np.zeros((700, 100), np.float32)
    )
    got = bulk_broadcast(payload, chunk_bytes=65536)  # ~4.3 chunks
    want = np.arange(70_000, dtype=np.float32).reshape(700, 100)
    np.testing.assert_array_equal(got, want)
    report["bulk_broadcast"] = "ok"

    # --- process_allgather_small
    vals = process_allgather_small(np.float64(pid + 1))
    assert sorted(float(v) for v in vals) == [1.0, 2.0], vals
    report["allgather"] = "ok"

    # --- reduce_timers over real processes
    from hydragnn_tpu.utils import time_utils

    tm = time_utils.Timer("phase")
    tm.elapsed = float(pid + 1)  # 1.0 on p0, 2.0 on p1
    tm.calls = 1
    stats = time_utils.reduce_timers()
    assert stats is not None
    s = stats["phase"]
    assert abs(s["min"] - 1.0) < 1e-9, s
    assert abs(s["max"] - 2.0) < 1e-9, s
    assert abs(s["avg"] - 1.5) < 1e-9, s
    report["reduce_timers"] = "ok"

    # --- run_training end-to-end under process_count() == 2
    os.chdir(workdir)
    import hydragnn_tpu as hg
    from hydragnn_tpu.data.synthetic import deterministic_graph_data

    ds = os.path.join(workdir, f"dataset_p{pid}", "unit")
    deterministic_graph_data(ds, number_configurations=40, seed=7)
    cfg = hg.load_config(
        os.path.join(os.path.dirname(__file__), "inputs", "ci.json")
    )
    cfg["Dataset"]["path"]["total"] = ds
    cfg["NeuralNetwork"]["Training"]["num_epoch"] = 2
    cfg["NeuralNetwork"]["Training"]["batch_size"] = 8
    cfg["Verbosity"]["level"] = 0
    model, arch_cfg, full_cfg, state, results = hg.run_training(cfg)
    loss = float(results["test_loss"])
    assert np.isfinite(loss), loss
    report["test_loss"] = loss

    # log tree (config snapshot + tensorboard) is written rank-0 only
    import glob

    report["n_log_configs"] = len(
        glob.glob(os.path.join(workdir, "logs", "*", "config.json"))
    )

    with open(os.path.join(workdir, f"report_p{pid}.json"), "w") as f:
        json.dump(report, f)
    print(f"WORKER {pid} OK")


if __name__ == "__main__":
    main()
