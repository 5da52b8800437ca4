"""Multibranch (multi-dataset task-parallel) GFM training in the SC25 shape
(ref: examples/multibranch/train.py:48-517).

The reference trains a shared EGNN encoder with per-dataset decoder branches
on ANI1x + qm7x + MPTrj + Alexandria + transition1x, read through
ADIOS + DDStore with rank groups proportional to dataset sizes. This driver
reproduces that pipeline TPU-natively:

  1. --build: ingest the five datasets (real raw downloads via --raw_root,
     or synthetic raw files in the real formats) into per-dataset
     arraystore shards on disk (the AdiosWriter step).
  2. train: open the stores, shard per process (DistDataset = DDStore
     equivalent), sample batches proportionally to dataset sizes
     (MultiDatasetLoader = the reference's proportional process_list), and
     train shared encoder + per-branch decoders. On a multi-chip mesh the
     same step runs branch-parallel (per-branch device groups — see
     hydragnn_tpu/parallel/multibranch.py and __graft_entry__'s dryrun).

Run: python examples/multibranch/train.py --build && \
     python examples/multibranch/train.py
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

GFM_DATASETS = ["ani1x", "qm7x", "mptrj", "alexandria", "transition1x"]
STORE_ROOT = os.path.join(os.path.dirname(__file__), "dataset_store")


def build(raw_root: str | None, limit: int | None, radius: float):
    """Stage 1: per-dataset arraystore shards (AdiosWriter step)."""
    from hydragnn_tpu.data.gfm import ingest, write_synthetic_raw

    # different sizes -> unequal branch proportions, like the real five
    sizes = {"ani1x": 12, "qm7x": 8, "mptrj": 5, "alexandria": 4,
             "transition1x": 6}
    for i, name in enumerate(GFM_DATASETS):
        if raw_root is not None:
            raw = os.path.join(raw_root, name)
        else:
            raw = write_synthetic_raw(
                name, os.path.join(STORE_ROOT, "_raw", name),
                n_mol=sizes[name], n_conf=5, seed=i,
            )
        n = ingest(
            name, raw, os.path.join(STORE_ROOT, name), radius=radius,
            limit=limit,
        )
        print(f"{name}: ingested {n} samples")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--build", action="store_true")
    p.add_argument("--raw_root", default=None,
                   help="directory holding real raw downloads per dataset; "
                        "omit for synthetic raw files in the real formats")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--radius", type=float, default=5.0)
    p.add_argument("--num_epoch", type=int, default=30)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--hidden_dim", type=int, default=32)
    args = p.parse_args()
    if args.build:
        build(args.raw_root, args.limit, args.radius)
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
        build(args.raw_root, args.limit, args.radius)

    datasets = []
    for name in GFM_DATASETS:
        store = GraphArrayStore(
            os.path.join(STORE_ROOT, name, "trainset")
        )
        dist = DistDataset(store, label=name)
        datasets.append(list(dist.local))
        print(f"{name}: {len(datasets[-1])} local samples "
              f"(store attrs: {store.attrs})")

    loader = MultiDatasetLoader(datasets, batch_size=args.batch_size)
    val_loader = MultiDatasetLoader(datasets, batch_size=args.batch_size,
                                    shuffle=False, seed=123)

    hd = args.hidden_dim
    nb = len(GFM_DATASETS)
    branches = tuple(
        BranchConfig(f"branch-{i}", 2, hd, 2, (hd, hd)) for i in range(nb)
    )
    max_nodes = max(s.num_nodes for d in datasets for s in d)
    cfg = ArchConfig(
        mpnn_type="EGNN",
        input_dim=1,
        hidden_dim=hd,
        output_dim=(1,),
        output_type=("graph",),
        graph_branches=branches,
        node_branches=(),
        num_conv_layers=3,
        num_nodes=max_nodes,
        max_neighbours=64,
        radius=args.radius,
        num_radial=8,
        envelope_exponent=5,
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

    # per-branch eval (graph-energy MAE per dataset)
    errs = {i: [] for i in range(nb)}
    for batch in val_loader:
        _, _, pred = eval_step(state, batch)
        p = np.asarray(pred[0])
        t = np.asarray(batch.graph_y)
        ids = np.asarray(batch.dataset_id)
        m = np.asarray(batch.graph_mask)
        for i in range(nb):
            sel = m & (ids == i)
            if sel.any():
                errs[i].append(np.abs(p[sel] - t[sel]).mean())
    for i, name in enumerate(GFM_DATASETS):
        print(f"branch-{i} ({name}) MAE: {np.mean(errs[i]):.5f}")


if __name__ == "__main__":
    main()
