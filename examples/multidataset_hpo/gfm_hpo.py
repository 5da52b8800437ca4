"""Multidataset (GFM) hyperparameter optimization
(ref: examples/multidataset_hpo/gfm.py + gfm_deephyper_multi.py — DeepHyper
CBO over the multi-branch GFM trainer, one trial = one short multidataset
training run).

This driver searches {mpnn_type, hidden_dim, num_conv_layers, lr} with the
async model-based search (hydragnn_tpu.hpo.search.model_based_search — the
DeepHyper CBO equivalent) over the multidataset branch-decoder training of
examples/multidataset/train.py: shared encoder, per-dataset decoder
branches, proportional sampling. Each trial's score is the held-out val
loss after --epochs epochs.

  python examples/multidataset_hpo/gfm_hpo.py --max_evals 5 --epochs 3
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "multidataset"))

SPACE = {
    "arch.mpnn_type": ["EGNN", "GIN", "PNA"],
    "arch.hidden_dim": [16, 32, 64],
    "arch.num_conv_layers": [2, 3],
    "train.learning_rate": [1e-3, 3e-3, 1e-2],
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--max_evals", type=int, default=5)
    p.add_argument("--workers", type=int, default=1)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--batch_size", type=int, default=32)
    args = p.parse_args()

    import train as md  # examples/multidataset/train.py

    import jax
    from hydragnn_tpu.hpo.search import model_based_search
    from hydragnn_tpu.data.arraystore import GraphArrayStore
    from hydragnn_tpu.models.arch import ArchConfig, BranchConfig
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.parallel.multibranch import MultiDatasetLoader
    from hydragnn_tpu.train.optimizer import select_optimizer
    from hydragnn_tpu.train.trainer import (
        init_state, make_eval_step, make_train_step,
    )

    if not os.path.isdir(md.STORE_ROOT):
        md.build()
    train_sets, val_sets = [], []
    for name in md.DATASETS:
        store = GraphArrayStore(os.path.join(md.STORE_ROOT, name))
        data = [store[i] for i in range(len(store))]
        k = max(1, int(0.9 * len(data)))
        train_sets.append(data[:k])
        val_sets.append(data[k:])
    print("datasets:", [len(d) for d in train_sets], "train /",
          [len(d) for d in val_sets], "val")

    def objective(trial):
        a, t = trial["arch"], trial["train"]
        loader = MultiDatasetLoader(train_sets, batch_size=args.batch_size)
        val_loader = MultiDatasetLoader(val_sets, batch_size=args.batch_size)
        branches = tuple(
            BranchConfig(f"branch-{i}", 2, a["hidden_dim"], 2,
                         (a["hidden_dim"], a["hidden_dim"]))
            for i in range(len(md.DATASETS))
        )
        cfg = ArchConfig(
            mpnn_type=a["mpnn_type"], input_dim=1,
            hidden_dim=a["hidden_dim"], output_dim=(1,),
            output_type=("graph",), graph_branches=branches,
            node_branches=(), num_conv_layers=a["num_conv_layers"],
            num_nodes=16, max_neighbours=16, radius=2.0, num_radial=8,
            envelope_exponent=5,
        )
        model = create_model(cfg)
        opt = select_optimizer({"Optimizer": {
            "type": "AdamW", "learning_rate": t["learning_rate"]}})
        state = init_state(model, next(iter(loader)), opt)
        step = make_train_step(model, cfg, opt)
        eval_step = make_eval_step(model, cfg)
        rng = jax.random.PRNGKey(0)
        for epoch in range(args.epochs):
            loader.set_epoch(epoch)
            for b in loader:
                state, _, _ = step(state, b, rng)
        vals = [float(eval_step(state, b)[0]) for b in val_loader]
        return float(np.mean(vals))

    best, best_val, trials = model_based_search(
        {"arch": {"mpnn_type": "EGNN", "hidden_dim": 32,
                  "num_conv_layers": 3},
         "train": {"learning_rate": 3e-3}},
        objective, n_trials=args.max_evals, space=SPACE, seed=17,
        n_init=min(3, args.max_evals), max_workers=args.workers,
    )
    print(f"\n{len(trials)} trials; best val loss {best_val:.6f}")
    print(json.dumps(best, indent=2))


if __name__ == "__main__":
    main()
