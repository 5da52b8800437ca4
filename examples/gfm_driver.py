"""Shared driver for the five GFM dataset examples (ANI1x, qm7x, MPTrj,
Alexandria, transition1x) — the TPU-native counterpart of the reference's
per-dataset train.py drivers (ref: examples/ani1_x/train.py,
qm7x/train.py, mptrj/train.py, alexandria/train.py, transition1x/train.py):
parse the raw public format -> radius graphs -> sharded arraystore
(AdiosWriter step) -> energy(-force) training through run_training.

Each examples/<name>/train.py calls ``main(<name>)``. Stages:
  --preprocess          parse --raw into --store (arraystore shards)
  --synthetic           write a tiny synthetic raw file in the real format
                        first (no-download smoke mode; exercises the real
                        parser), then preprocess + train
  (default)             train from --store via the "adios" config format
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_config(name: str, args) -> dict:
    return {
        "Verbosity": {"level": 1},
        "Dataset": {
            "name": name,
            "format": "adios",
            "path": {"total": args.store},
        },
        "NeuralNetwork": {
            "Architecture": {
                "mpnn_type": args.mpnn_type,
                "radius": args.radius,
                "max_neighbours": args.max_neighbours,
                "hidden_dim": args.hidden_dim,
                "num_conv_layers": args.num_conv_layers,
                "num_radial": 8,
                "envelope_exponent": 5,
                "output_heads": {
                    "node": {
                        "num_headlayers": 2,
                        "dim_headlayers": [args.hidden_dim, args.hidden_dim],
                        "type": "mlp",
                    }
                },
                "task_weights": [1.0],
            },
            "Variables_of_interest": {
                "input_node_features": [0],
                "output_names": ["energy"],
                "output_index": [0],
                "type": ["node"],
                "output_dim": [1],
                "denormalize_output": False,
            },
            "Training": {
                "num_epoch": args.num_epoch,
                "perc_train": 0.9,
                "batch_size": args.batch_size,
                "compute_grad_energy": not args.no_forces,
                "Optimizer": {"type": "AdamW", "learning_rate": 1e-3},
            },
        },
    }


def main(name: str, subdir: str | None = None):
    here = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), subdir or name
    )
    p = argparse.ArgumentParser(description=f"{name} GFM example")
    p.add_argument("--raw", default=os.path.join(here, "raw"),
                   help="raw dataset file/dir (real public download)")
    p.add_argument("--store", default=os.path.join(here, "store"))
    p.add_argument("--preprocess", action="store_true")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--limit", type=int, default=None,
                   help="cap raw samples read (smoke runs)")
    p.add_argument("--radius", type=float, default=5.0)
    p.add_argument("--max_neighbours", type=int, default=64)
    p.add_argument("--mpnn_type", default="EGNN")
    p.add_argument("--hidden_dim", type=int, default=64)
    p.add_argument("--num_conv_layers", type=int, default=3)
    p.add_argument("--num_epoch", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--no_forces", action="store_true",
                   help="energy-only training (default trains forces as "
                        "-dE/dpos, the SC25 GFM objective)")
    args = p.parse_args()

    from hydragnn_tpu.data.gfm import ingest, write_synthetic_raw

    if args.synthetic:
        args.raw = write_synthetic_raw(
            name, args.raw + "_synthetic", n_mol=8, n_conf=4
        )
        print(f"wrote synthetic raw: {args.raw}")
    if args.synthetic or args.preprocess:
        n = ingest(
            name, args.raw, args.store, radius=args.radius,
            max_neighbours=args.max_neighbours, limit=args.limit,
        )
        print(f"ingested {n} samples into {args.store}")
        if args.preprocess and not args.synthetic:
            return

    import hydragnn_tpu as hg

    model, cfg, config, state, results = hg.run_training(
        build_config(name, args)
    )
    print("test_rmse:", results["test_rmse"])


if __name__ == "__main__":
    main(os.environ.get("GFM_DATASET", "ani1x"))
