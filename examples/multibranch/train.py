"""Multibranch (multi-dataset task-parallel) training example
(ref: examples/multibranch/train.py:48-517).

Trains a shared encoder + per-dataset decoder branches on several datasets at
once. The reference builds overlapping DDP process groups over MPI; here the
branch dispatch is part of the SPMD program (see
hydragnn_tpu/parallel/multibranch.py) and data parallelism is added by
wrapping the same step over a device mesh.

Run: python examples/multibranch/train.py
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from hydragnn_tpu.graph import GraphSample
from hydragnn_tpu.data.neighbors import radius_graph


def make_dataset(n, target_fn, seed):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        nn_ = rng.randint(6, 14)
        pos = rng.randn(nn_, 3).astype(np.float32)
        x = rng.rand(nn_, 1).astype(np.float32)
        ei = radius_graph(pos, 2.0, max_num_neighbors=16)
        out.append(
            GraphSample(
                x=x, pos=pos, edge_index=ei,
                y_graph=np.asarray([target_fn(x)], np.float32),
            )
        )
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num_epoch", type=int, default=40)
    p.add_argument("--batch_size", type=int, default=32)
    args = p.parse_args()

    import jax
    from hydragnn_tpu.models.arch import ArchConfig, BranchConfig
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.parallel.multibranch import MultiDatasetLoader
    from hydragnn_tpu.train.optimizer import select_optimizer
    from hydragnn_tpu.train.trainer import (
        init_state, make_eval_step, make_train_step,
    )

    # three "datasets" with branch-specific targets
    datasets = [
        make_dataset(300, lambda x: x.mean(), 0),
        make_dataset(200, lambda x: (x ** 2).mean() * 3, 1),
        make_dataset(100, lambda x: -x.sum() * 0.1, 2),
    ]
    loader = MultiDatasetLoader(datasets, batch_size=args.batch_size)
    val_loader = MultiDatasetLoader(datasets, batch_size=args.batch_size,
                                    shuffle=False, seed=123)

    branches = tuple(
        BranchConfig(f"branch-{i}", 2, 32, 2, (32, 32)) for i in range(3)
    )
    cfg = ArchConfig(
        mpnn_type="SAGE",
        input_dim=1,
        hidden_dim=32,
        output_dim=(1,),
        output_type=("graph",),
        graph_branches=branches,
        node_branches=(),
        num_conv_layers=3,
        num_nodes=14,
    )
    model = create_model(cfg)
    opt = select_optimizer({"Optimizer": {"type": "AdamW",
                                          "learning_rate": 0.003}})
    state = init_state(model, next(iter(loader)), opt)
    train_step = make_train_step(model, cfg, opt)
    eval_step = make_eval_step(model, cfg)
    rng = jax.random.PRNGKey(0)

    for epoch in range(args.num_epoch):
        loader.set_epoch(epoch)
        losses = []
        for batch in loader:
            state, loss, _ = train_step(state, batch, rng)
            losses.append(float(loss))
        if epoch % 5 == 0 or epoch == args.num_epoch - 1:
            print(f"epoch {epoch}: train {np.mean(losses):.6f}")

    # per-branch eval
    errs = {i: [] for i in range(3)}
    for batch in val_loader:
        _, _, pred = eval_step(state, batch)
        p = np.asarray(pred[0])
        t = np.asarray(batch.graph_y)
        ids = np.asarray(batch.dataset_id)
        m = np.asarray(batch.graph_mask)
        for i in range(3):
            sel = m & (ids == i)
            if sel.any():
                errs[i].append(np.abs(p[sel] - t[sel]).mean())
    for i in range(3):
        print(f"branch-{i} MAE: {np.mean(errs[i]):.5f}")


if __name__ == "__main__":
    main()
