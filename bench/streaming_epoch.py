"""Streaming vs resident scan-epoch throughput.

Resident: the whole epoch's batches pre-staged in HBM, one scan launch.
Streaming: `scan_chunk`-step launches with at most 2 chunks in flight — the
host collates/uploads chunk k+1 while the device runs chunk k
(trainer._scan_chunked_epoch). Target: streaming >= 0.9x resident
throughput, so epochs larger than HBM keep the scan-epoch dispatch win
(round-1 VERDICT weak #5).

Timing: fetch-terminated (see bench/results/device_calibration_r2.md).
Usage: python bench/streaming_epoch.py [--steps 32] [--chunk 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from train_step import build_batch  # noqa: E402 (same synthetic workload)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hidden", type=int, default=128)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--graphs", type=int, default=128)
    p.add_argument("--nodes", type=int, default=64)
    p.add_argument("--deg", type=int, default=16)
    p.add_argument("--steps", type=int, default=32)
    p.add_argument("--chunk", type=int, default=4)
    p.add_argument("--trials", type=int, default=3)
    args = p.parse_args()

    import jax

    from hydragnn_tpu.models.arch import ArchConfig, BranchConfig
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.train.optimizer import select_optimizer
    from hydragnn_tpu.train.trainer import (
        _scan_chunked_epoch,
        init_state,
        make_scan_train_epoch,
        make_train_step,
        stack_batches,
    )

    cfg = ArchConfig(
        mpnn_type="EGNN", input_dim=1, hidden_dim=args.hidden,
        output_dim=(1,), output_type=("graph",),
        graph_branches=(BranchConfig("branch-0", 2, 50, 2, (50, 25)),),
        node_branches=(), num_conv_layers=args.layers,
        num_nodes=args.nodes, max_neighbours=args.deg, radius=5.0,
        num_radial=5, envelope_exponent=5,
    )
    model = create_model(cfg)
    batches = [
        build_batch(args.graphs, args.nodes, args.deg, seed=s)
        for s in range(args.steps)
    ]
    opt = select_optimizer({"Optimizer": {"type": "AdamW",
                                          "learning_rate": 1e-3}})
    state_r = init_state(model, batches[0], opt)
    state_s = jax.device_get(state_r)
    epoch_full = jax.jit(
        make_scan_train_epoch(model, cfg, opt), donate_argnums=()
    )
    epoch_chunk = make_scan_train_epoch(model, cfg, opt)
    step = make_train_step(model, cfg, opt)
    key = jax.random.PRNGKey(0)
    stacked = stack_batches(batches)

    # resident: one launch, all S steps staged in HBM
    def run_resident(state, rng):
        state, losses = epoch_full(state, stacked, rng)
        float(np.asarray(losses)[-1])
        return state

    # streaming: chunked launches; loader re-collates on the host per epoch
    def run_streaming(state, rng):
        state, _ = _scan_chunked_epoch(
            iter(batches), state, epoch_chunk, step, rng, args.chunk
        )
        jax.block_until_ready(state.step)
        float(np.asarray(state.step))
        return state

    results = {}
    for name, fn, st in (
        ("resident", run_resident, state_r),
        ("streaming", run_streaming, state_s),
    ):
        st = fn(st, jax.random.fold_in(key, 99))  # compile + warm
        best = float("inf")
        for t in range(args.trials):
            rng = jax.random.fold_in(key, t)
            t0 = time.perf_counter()
            st = fn(st, rng)
            best = min(best, (time.perf_counter() - t0) / args.steps)
        results[name] = best
        print(f"{name}: {best*1e3:.2f} ms/step", flush=True)

    ratio = results["resident"] / results["streaming"]
    print(json.dumps({
        "resident_ms_per_step": round(results["resident"] * 1e3, 3),
        "streaming_ms_per_step": round(results["streaming"] * 1e3, 3),
        "streaming_over_resident": round(ratio, 3),
    }))


if __name__ == "__main__":
    main()
