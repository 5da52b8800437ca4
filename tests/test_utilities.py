"""Auxiliary-subsystem coverage: tracer/timer/print (SURVEY §5 observability),
postprocess denormalize, compositional splitting, atomic descriptors, LSMS
histogram cutoff, HPO launch builders, visualizer, walltime guard — mirroring
the reference's unit tests (tests/test_atomicdescriptors.py, test_enthalpy.py
etc.) for the subsystems not already covered elsewhere."""

import os
import time

import numpy as np
import pytest


def test_tracer_regions_and_decorator():
    from hydragnn_tpu.utils import tracer as tr

    tr.reset()
    tr.enable()
    tr.start("region_a")
    time.sleep(0.01)
    tr.stop("region_a")

    @tr.profile("region_b")
    def work():
        time.sleep(0.005)
        return 42

    assert work() == 42
    s = tr.summary()
    assert s["region_a"]["count"] == 1
    assert s["region_a"]["total_s"] >= 0.01
    assert s["region_b"]["count"] == 1
    tr.disable()
    tr.start("ignored")
    tr.stop("ignored")
    assert "ignored" not in tr.summary()
    tr.reset()


def test_timer_accumulates():
    from hydragnn_tpu.utils.time_utils import Timer, reset_timers

    reset_timers()
    t = Timer("phase")
    for _ in range(3):
        t.start()
        time.sleep(0.003)
        t.stop()
    assert t.elapsed >= 0.009
    # a new Timer with the same name resumes the accumulated total
    assert Timer("phase").elapsed >= 0.009


def test_timer_distributed_reduction(monkeypatch, capsys):
    """MIN/MAX/AVG across processes (ref: time_utils.py:95-138). Multi-host
    is simulated by faking process_count + the allgather result."""
    import jax
    import numpy as np
    from jax.experimental import multihost_utils

    from hydragnn_tpu.utils import time_utils as tu

    tu.reset_timers()
    t = tu.Timer("train")
    t.elapsed = 2.0  # this process's cumulative total

    # single-process: no reduction
    assert tu.reduce_timers() is None

    monkeypatch.setattr(jax, "process_count", lambda: 4)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    monkeypatch.setattr(
        multihost_utils, "process_allgather",
        lambda vals: np.stack([np.asarray(vals) + d
                               for d in (0.0, 1.0, 2.0, 3.0)]),
    )
    stats = tu.reduce_timers()
    assert stats == {
        "train": {"min": 2.0, "max": 5.0, "avg": 3.5}
    }
    tu.print_timers()
    out = capsys.readouterr().out
    assert "Min timers" in out and "Max timers" in out and "Avg timers" in out
    assert "3.5000s" in out
    tu.reset_timers()


def test_print_verbosity_policy(capsys):
    from hydragnn_tpu.utils.print_utils import print_distributed

    print_distributed(2, "shown", verbosity_level=1)
    print_distributed(0, "hidden", verbosity_level=1)
    out = capsys.readouterr().out
    assert "shown" in out and "hidden" not in out


def test_walltime_parse():
    from hydragnn_tpu.utils.walltime import _parse_slurm_remaining

    assert _parse_slurm_remaining("5:00") == 300
    assert _parse_slurm_remaining("1:00:00") == 3600
    assert _parse_slurm_remaining("2-01:00:00") == 2 * 86400 + 3600
    assert _parse_slurm_remaining("UNLIMITED") is None


def test_output_denormalize_roundtrip():
    from hydragnn_tpu.postprocess.postprocess import (
        output_denormalize,
        unscale_features_by_num_nodes,
    )

    rng = np.random.RandomState(0)
    raw = [rng.rand(8, 1), rng.rand(8, 1)]
    minmax = [(2.0, 10.0), (-1.0, 1.0)]
    scaled = [(r - mm[0]) / (mm[1] - mm[0]) for r, mm in zip(raw, minmax)]
    t, p = output_denormalize(
        minmax, [s.copy() for s in scaled], [s.copy() for s in scaled]
    )
    for got, want in zip(t, raw):
        np.testing.assert_allclose(got, want, rtol=1e-6)
    v = unscale_features_by_num_nodes(np.ones((3, 2)), np.array([2, 3, 4]))
    np.testing.assert_array_equal(v[:, 0], [2, 3, 4])


def test_compositional_stratified_splitting():
    from hydragnn_tpu.data.compositional_splitting import (
        composition_key,
        compositional_stratified_splitting,
    )
    from hydragnn_tpu.graph import GraphSample

    rng = np.random.RandomState(0)
    ds = []
    for i in range(60):
        # element composition in feature column 0: two species, varying ratio
        n = 8
        k = i % 3  # three distinct compositions
        x = np.zeros((n, 1), np.float32)
        x[: 2 + k, 0] = 26.0
        x[2 + k :, 0] = 78.0
        ds.append(GraphSample(
            x=x, pos=rng.randn(n, 3).astype(np.float32),
            edge_index=np.stack([[0, 1], [1, 2]]),
            y_graph=np.zeros(1, np.float32),
        ))
    tr, va, te = compositional_stratified_splitting(ds, perc_train=0.8)
    assert len(tr) + len(va) + len(te) >= 60  # singletons may duplicate
    # every composition appears in every split
    for split in (tr, va, te):
        assert len({composition_key(s) for s in split}) == 3


def test_atomic_descriptors():
    from hydragnn_tpu.descriptors.atomicdescriptors import AtomicDescriptors

    ad = AtomicDescriptors(element_types=[1, 6, 8])
    f = ad.get_atom_features(6)
    assert f.shape == (3 + 6,)
    np.testing.assert_array_equal(f[:3], [0, 1, 0])  # one-hot position
    assert f[3] == 6.0  # atomic number
    assert f[4] == 2.0  # carbon is period 2
    batch = ad(np.array([1, 8, 6]))
    assert batch.shape == (3, 9)


def test_histogram_cutoff(tmp_path):
    from hydragnn_tpu.lsms.histogram_cutoff import (
        compositional_histogram_cutoff,
    )

    src = tmp_path / "raw"
    src.mkdir()
    rng = np.random.RandomState(0)
    for i in range(12):
        frac = 0.25 if i < 10 else 0.75  # 10 crowded-bin + 2 rare-bin files
        n = 8
        z = np.where(np.arange(n) < frac * n, 26.0, 78.0)
        rows = np.c_[z, rng.randn(n, 3)]
        with open(src / f"cfg_{i:03d}.txt", "w") as f:
            f.write(f"{n}\n")
            np.savetxt(f, rows)
    out = compositional_histogram_cutoff(
        str(src), [26.0, 78.0], histogram_cutoff=4, num_bins=4,
        overwrite_data=True,
    )
    kept = sorted(os.listdir(out))
    assert len(kept) == 6  # 4 capped from the crowded bin + 2 rare


def test_slurm_launchers():
    from hydragnn_tpu.hpo.launch import (
        parse_slurm_nodelist,
        slurm_launch_command,
    )

    assert parse_slurm_nodelist("frontier[001-003,007]") == [
        "frontier001", "frontier002", "frontier003", "frontier007",
    ]
    assert parse_slurm_nodelist("a,b") == ["a", "b"]
    cmd = slurm_launch_command("train.py", "cfg.json", nodes=2,
                               tasks_per_node=4, extra_env={"X": "1"})
    assert cmd[0] == "srun" and "--nodes=2" in cmd and "train.py" in cmd


def test_visualizer_writes_plots(tmp_path):
    pytest.importorskip("matplotlib")
    from hydragnn_tpu.postprocess.visualizer import Visualizer

    rng = np.random.RandomState(0)
    t = [rng.randn(50, 1)]
    p = [t[0] + 0.1 * rng.randn(50, 1)]
    viz = Visualizer("unit", num_heads=1, plot_dir=str(tmp_path))
    path = viz.create_scatter_plot(t, p, output_names=["energy"])
    assert os.path.exists(path)


def test_model_info_counts():
    from hydragnn_tpu.utils.model_info import count_params

    params = {"a": {"w": np.zeros((3, 4)), "b": np.zeros(4)},
              "c": np.zeros((2,))}
    assert count_params(params) == 12 + 4 + 2


def test_model_based_search_beats_random_on_synthetic():
    """RandomForest-surrogate LCB search (DeepHyper CBO equivalent) finds
    the optimum of a deterministic objective within budget and at least
    matches random search (ref: hydragnn/utils/hpo/deephyper.py)."""
    import numpy as np

    from hydragnn_tpu.hpo.search import (
        DEFAULT_SPACE,
        model_based_search,
        random_search,
    )

    base = {
        "NeuralNetwork": {
            "Architecture": {"hidden_dim": 16, "num_conv_layers": 2},
            "Training": {
                "Optimizer": {"learning_rate": 1e-3},
                "batch_size": 16,
            },
        }
    }

    def objective(cfg):
        a = cfg["NeuralNetwork"]["Architecture"]
        t = cfg["NeuralNetwork"]["Training"]
        # smooth bowl with optimum at hidden 64, layers 4, lr 3e-3, bs 32
        return (
            (np.log2(a["hidden_dim"]) - 6) ** 2
            + (a["num_conv_layers"] - 4) ** 2
            + (np.log10(t["Optimizer"]["learning_rate"]) + 2.5) ** 2
            + (np.log2(t["batch_size"]) - 5) ** 2
        )

    # deterministic tier: serial execution — with max_workers > 1 the
    # surrogate's training history depends on thread completion ORDER, so
    # the tight accuracy bound was order/load-sensitive (flaky under the
    # full suite, green in isolation)
    best_cfg, best_val, trials = model_based_search(
        base, objective, n_trials=24, seed=0, n_init=6, max_workers=1
    )
    assert len(trials) == 24
    _, rnd_val, _ = random_search(base, objective, n_trials=24, seed=0)
    assert best_val <= rnd_val + 1e-9
    # the optimum is reachable in DEFAULT_SPACE; the surrogate should land
    # close (<= ~1.01 == at most one coordinate one notch off)
    assert best_val < 1.1, (best_val, best_cfg)

    # async tier: order-insensitive assertions only (completes the budget,
    # returns the best of its own trials)
    a_cfg, a_val, a_trials = model_based_search(
        base, objective, n_trials=24, seed=0, n_init=6, max_workers=2
    )
    assert len(a_trials) == 24
    assert a_val <= min(v for _, v in a_trials) + 1e-9


def test_visualizer_breadth(tmp_path):
    """Per-node error histograms, vector parity, per-node vector parity
    grids (ref: postprocess/visualizer.py:387-612)."""
    import numpy as np

    from hydragnn_tpu.postprocess.visualizer import Visualizer

    rng = np.random.RandomState(0)
    viz = Visualizer("viztest", plot_dir=str(tmp_path))
    t = rng.randn(20, 6)
    p = t + 0.1 * rng.randn(20, 6)
    f1 = viz.create_error_histogram_per_node("x", t, p)
    tv = rng.randn(20, 4 * 3)
    pv = tv + 0.1 * rng.randn(20, 12)
    nf = rng.rand(20, 4)
    f2 = viz.create_parity_plot_vector("forces", tv, pv)
    f3 = viz.create_parity_plot_per_node_vector(
        "forces", tv, pv, node_feature=nf, iepoch=3
    )
    import os

    for f in (f1, f2, f3):
        assert f is not None and os.path.exists(f), f
    # scalar per-node histogram declines single-node data (ref behavior)
    assert viz.create_error_histogram_per_node(
        "y", t[:, :1], p[:, :1]
    ) is None
