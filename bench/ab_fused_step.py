"""Single-process A/B: train-step throughput with the fused SpMM route on
vs off. Interleaved trials in ONE process so shared-host tenancy drift
cannot bias the comparison (the env flag is read at trace time, so both
variants are traced in the same process).

Usage: python bench/ab_fused_step.py [--mpnn_type GIN] ...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mpnn_type", default="GIN")
    p.add_argument("--hidden", type=int, default=128)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--graphs", type=int, default=128)
    p.add_argument("--nodes", type=int, default=64)
    p.add_argument("--deg", type=int, default=16)
    p.add_argument("--steps", type=int, default=16)
    p.add_argument("--trials", type=int, default=4)
    args = p.parse_args()

    import jax

    from train_step import build_batch
    from hydragnn_tpu.models.arch import ArchConfig, BranchConfig
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.train.optimizer import select_optimizer
    from hydragnn_tpu.train.trainer import (
        init_state, make_scan_train_epoch, stack_batches,
    )

    cfg = ArchConfig(
        mpnn_type=args.mpnn_type,
        input_dim=1,
        hidden_dim=args.hidden,
        output_dim=(1,),
        output_type=("graph",),
        graph_branches=(BranchConfig("branch-0", 2, 50, 2, (50, 25)),),
        node_branches=(),
        num_conv_layers=args.layers,
        num_nodes=args.nodes,
        max_neighbours=args.deg,
        radius=5.0,
        num_radial=5,
        envelope_exponent=5,
        num_gaussians=10,
        num_filters=args.hidden,
    )
    model = create_model(cfg)
    batches = [build_batch(args.graphs, args.nodes, args.deg, seed=s)
               for s in range(args.steps)]
    E = batches[0].senders.shape[0]
    stacked = stack_batches(batches)
    opt = select_optimizer({"Optimizer": {"type": "AdamW",
                                          "learning_rate": 1e-3}})
    key = jax.random.PRNGKey(0)

    epochs = {}
    states = {}
    for mode in ("fused", "unfused"):
        os.environ["HYDRAGNN_TPU_FUSED_SPMM"] = "1" if mode == "fused" else "0"
        states[mode] = init_state(model, batches[0], opt)
        epochs[mode] = jax.jit(make_scan_train_epoch(model, cfg, opt))
        # trace+compile now, under the right env value
        s, _ = epochs[mode](states[mode], stacked, key)
        jax.block_until_ready(s.params)
        states[mode] = s

    best = {m: float("inf") for m in epochs}
    salt = 0
    for trial in range(args.trials):
        for mode in ("fused", "unfused"):
            rng = jax.random.fold_in(jax.random.fold_in(key, trial), salt)
            t0 = time.perf_counter()
            states[mode], losses = epochs[mode](states[mode], stacked, rng)
            lsum = float(np.asarray(losses).sum())
            dt = (time.perf_counter() - t0) / args.steps
            salt = int(abs(lsum) * 1e6) % (1 << 30)
            best[mode] = min(best[mode], dt)
            print(f"trial {trial} {mode:8s} {dt*1e3:7.2f} ms/step "
                  f"loss_sum={lsum:.5f}", flush=True)

    print(f"\n{args.mpnn_type} E={E}: fused {best['fused']*1e3:.2f} ms/step "
          f"vs unfused {best['unfused']*1e3:.2f} ms/step "
          f"({best['unfused']/best['fused']:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
