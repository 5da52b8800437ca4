"""Multidataset GFM-style training from sharded array stores
(ref: examples/multidataset/train.py + examples/multibranch/train.py:295-435:
AdiosDataset shards + DistDataset + proportional branch training).

Stage 1 (--build): write several datasets into GraphArrayStore shards (the
AdiosWriter step). Stage 2 (default): open the stores, shard them across
processes (DistDataset), and train a shared encoder with per-dataset decoder
branches via MultiDatasetLoader.

Run: python examples/multidataset/train.py --build && \
     python examples/multidataset/train.py
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from hydragnn_tpu.graph import GraphSample
from hydragnn_tpu.data.neighbors import radius_graph

STORE_ROOT = os.path.join(os.path.dirname(__file__), "dataset_store")
DATASETS = ["alpha", "beta", "gamma"]


def synth(name: str, n: int, seed: int):
    rng = np.random.RandomState(seed)
    scale = {"alpha": 1.0, "beta": -2.0, "gamma": 0.5}[name]
    out = []
    for _ in range(n):
        nn_ = rng.randint(6, 16)
        pos = rng.randn(nn_, 3).astype(np.float32)
        x = rng.rand(nn_, 1).astype(np.float32)
        ei = radius_graph(pos, 2.0, max_num_neighbors=16)
        out.append(GraphSample(
            x=x, pos=pos, edge_index=ei,
            y_graph=np.asarray([scale * x.mean()], np.float32),
        ))
    return out


def build():
    from hydragnn_tpu.data.arraystore import GraphStoreWriter

    sizes = {"alpha": 300, "beta": 150, "gamma": 100}
    for i, name in enumerate(DATASETS):
        w = GraphStoreWriter(
            os.path.join(STORE_ROOT, name),
            attrs={"ndata": sizes[name], "dataset": name},
        )
        w.extend(synth(name, sizes[name], seed=i))
        w.save()
        print(f"wrote {sizes[name]} samples to {name}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--build", action="store_true")
    p.add_argument("--num_epoch", type=int, default=30)
    p.add_argument("--batch_size", type=int, default=32)
    args = p.parse_args()
    if args.build:
        build()
        return

    import jax
    from hydragnn_tpu.data.arraystore import GraphArrayStore
    from hydragnn_tpu.data.distdataset import DistDataset
    from hydragnn_tpu.models.arch import ArchConfig, BranchConfig
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.parallel.multibranch import MultiDatasetLoader
    from hydragnn_tpu.train.optimizer import select_optimizer
    from hydragnn_tpu.train.trainer import (
        init_state, make_eval_step, make_train_step,
    )

    if not os.path.isdir(STORE_ROOT):
        build()

    datasets = []
    for name in DATASETS:
        store = GraphArrayStore(os.path.join(STORE_ROOT, name))
        dist = DistDataset(store, label=name)
        datasets.append([dist[i] for i in dist.local_indices()])
        print(f"{name}: {len(datasets[-1])} local samples "
              f"(attrs: {store.attrs})")

    loader = MultiDatasetLoader(datasets, batch_size=args.batch_size)
    branches = tuple(
        BranchConfig(f"branch-{i}", 2, 32, 2, (32, 32))
        for i in range(len(DATASETS))
    )
    cfg = ArchConfig(
        mpnn_type="EGNN", input_dim=1, hidden_dim=32, output_dim=(1,),
        output_type=("graph",), graph_branches=branches, node_branches=(),
        num_conv_layers=3, num_nodes=16, max_neighbours=16,
        radius=2.0, num_radial=8, envelope_exponent=5,
    )
    model = create_model(cfg)
    opt = select_optimizer({"Optimizer": {"type": "AdamW",
                                          "learning_rate": 0.003}})
    state = init_state(model, next(iter(loader)), opt)
    step = make_train_step(model, cfg, opt)
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
