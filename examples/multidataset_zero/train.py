"""Multidataset training with ZeRO-1 optimizer-state sharding
(ref: examples/multidataset_deepspeed/train.py + launch_helper.py — the
reference runs the multidataset GFM trainer under DeepSpeed ZeRO to shard
optimizer state across ranks).

TPU-native equivalent: the same multidataset branch-decoder training as
examples/multidataset/train.py, but the train step is
``parallel.zero.make_zero_train_step`` over a device mesh — optimizer
state is laid out first-dim-sharded and XLA inserts the reduce-scatter /
all-gather pattern ZeRO performs by hand (see hydragnn_tpu/parallel/
zero.py). Runs on any mesh; use XLA_FLAGS=
--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu for a virtual
8-device smoke run.

Run: python examples/multidataset_zero/train.py --num_epoch 10
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "multidataset"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num_epoch", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--hidden_dim", type=int, default=32)
    p.add_argument("--mpnn_type", default="EGNN")
    args = p.parse_args()

    import train as md  # examples/multidataset/train.py

    import jax
    from hydragnn_tpu.data.arraystore import GraphArrayStore
    from hydragnn_tpu.models.arch import ArchConfig, BranchConfig
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.parallel.mesh import setup_mesh
    from hydragnn_tpu.parallel.multibranch import MultiDatasetLoader
    from hydragnn_tpu.parallel.zero import (
        make_zero_train_step, shard_state_zero,
    )
    from hydragnn_tpu.train.optimizer import select_optimizer
    from hydragnn_tpu.train.trainer import init_state

    if not os.path.isdir(md.STORE_ROOT):
        md.build()
    datasets = []
    for name in md.DATASETS:
        store = GraphArrayStore(os.path.join(md.STORE_ROOT, name))
        datasets.append([store[i] for i in range(len(store))])
        print(f"{name}: {len(datasets[-1])} samples")

    mesh = setup_mesh("data", jax.devices())
    print(f"mesh: {mesh.devices.size} devices")

    loader = MultiDatasetLoader(datasets, batch_size=args.batch_size)
    branches = tuple(
        BranchConfig(f"branch-{i}", 2, args.hidden_dim, 2,
                     (args.hidden_dim, args.hidden_dim))
        for i in range(len(md.DATASETS))
    )
    cfg = ArchConfig(
        mpnn_type=args.mpnn_type, input_dim=1, hidden_dim=args.hidden_dim,
        output_dim=(1,), output_type=("graph",), graph_branches=branches,
        node_branches=(), num_conv_layers=3, num_nodes=16,
        max_neighbours=16, radius=2.0, num_radial=8, envelope_exponent=5,
    )
    model = create_model(cfg)
    opt = select_optimizer({"Optimizer": {"type": "AdamW",
                                          "learning_rate": 0.003}})
    state = init_state(model, next(iter(loader)), opt)
    state = shard_state_zero(jax.device_get(state), mesh)
    n_sharded = sum(
        1 for a in jax.tree_util.tree_leaves(state.opt_state)
        if hasattr(a, "sharding") and not a.sharding.is_fully_replicated
    )
    print(f"ZeRO-1: {n_sharded} optimizer-state arrays sharded over "
          f"{mesh.devices.size} devices")

    step = make_zero_train_step(model, cfg, opt, mesh)
    rng = jax.random.PRNGKey(0)
    for epoch in range(args.num_epoch):
        loader.set_epoch(epoch)
        losses = []
        for b in loader:
            state, loss, _ = step(state, b, rng)
            losses.append(float(loss))
        if epoch % 5 == 0 or epoch == args.num_epoch - 1:
            print(f"epoch {epoch}: train {np.mean(losses):.6f}")
    print("done")


if __name__ == "__main__":
    main()
