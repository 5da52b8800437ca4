"""Scaling-efficiency harness: edges/s vs device count.

North-star target (BASELINE.md): >= 80% edges/s scaling efficiency from 1
chip to N. Runs the DP train step over meshes of growing size (on real pods
via jax.distributed, or virtual CPU devices with
--xla_force_host_platform_device_count for logic validation) and reports
per-size throughput + efficiency vs the single-device run.

Usage: python bench/scaling.py [--global_batch 256] [--virtual 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--global_batch", type=int, default=256)
    p.add_argument("--hidden_dim", type=int, default=128)
    p.add_argument("--nodes_per_graph", type=int, default=64)
    p.add_argument("--degree", type=int, default=16)
    p.add_argument("--virtual", type=int, default=0,
                   help="force N virtual CPU devices (testing)")
    p.add_argument("--steps", type=int, default=20)
    args = p.parse_args()

    if args.virtual:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        )
    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")

    from hydragnn_tpu.graph import GraphSample
    from hydragnn_tpu.models.arch import ArchConfig, BranchConfig
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.parallel.mesh import (
        ShardedGraphLoader,
        make_parallel_train_step,
        replicate_state,
        setup_mesh,
        shard_batch,
    )
    from hydragnn_tpu.train.optimizer import select_optimizer
    from hydragnn_tpu.train.trainer import init_state

    rng = np.random.RandomState(0)
    n, deg = args.nodes_per_graph, args.degree
    samples = []
    for _ in range(args.global_batch):
        senders, receivers = [], []
        for i in range(n):
            nb = rng.choice([j for j in range(n) if j != i], deg, replace=False)
            senders.extend(nb)
            receivers.extend([i] * deg)
        samples.append(
            GraphSample(
                x=rng.randn(n, 1).astype(np.float32),
                pos=rng.randn(n, 3).astype(np.float32),
                edge_index=np.stack([senders, receivers]),
                y_graph=rng.randn(1).astype(np.float32),
            )
        )

    cfg = ArchConfig(
        mpnn_type="EGNN",
        input_dim=1,
        hidden_dim=args.hidden_dim,
        output_dim=(1,),
        output_type=("graph",),
        graph_branches=(BranchConfig("branch-0", 2, args.hidden_dim, 2,
                                     (args.hidden_dim, args.hidden_dim)),),
        node_branches=(),
        num_conv_layers=3,
        num_nodes=n,
        max_neighbours=deg,
        radius=5.0,
        num_radial=8,
        envelope_exponent=5,
    )
    model = create_model(cfg)
    opt = select_optimizer({"Optimizer": {"type": "AdamW",
                                          "learning_rate": 1e-3}})

    all_devices = jax.devices()
    sizes = [d for d in (1, 2, 4, 8, 16, 32, 64, 128, 256)
             if d <= len(all_devices)]
    results = {}
    for nd in sizes:
        devices = all_devices[:nd]
        mesh = setup_mesh(devices=devices)
        loader = ShardedGraphLoader(
            samples, batch_size=max(args.global_batch // 1, nd), n_shards=nd
        )
        stacked = next(iter(loader))
        local = jax.tree_util.tree_map(lambda a: a[0], stacked)
        state = init_state(model, local, opt)
        state = replicate_state(state, mesh)
        step = make_parallel_train_step(model, cfg, opt, mesh)
        stacked = shard_batch(stacked, mesh)
        s, loss, _ = step(state, stacked, jax.random.PRNGKey(0))
        float(loss)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            s, loss, _ = step(s, stacked, jax.random.PRNGKey(0))
        float(loss)
        dt = (time.perf_counter() - t0) / args.steps
        edges = int(np.sum(stacked.edge_mask))
        eps = edges / dt
        results[nd] = eps
        eff = eps / (results[1] * nd) if 1 in results and nd > 1 else 1.0
        print(json.dumps({
            "devices": nd, "edges_per_s": round(eps), "step_ms":
            round(dt * 1e3, 2), "scaling_efficiency": round(eff, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
