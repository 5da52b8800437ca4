"""Where does the train-step time go? Scan-timed ablation of the step's
pieces on the real TPU (same methodology as bench/train_step.py).

Pieces:
  fwd        — model.apply only (train=False statistics)
  fwd_loss   — loss_fn forward
  grad       — value_and_grad of loss_fn
  full       — grad + optimizer update (the real step)
  convs      — the conv-stack aggregation ops alone (gather+scatter per layer)

Usage: python bench/step_ablation.py [--mpnn_type GIN] [--hidden 128] ...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mpnn_type", default="GIN")
    p.add_argument("--hidden", type=int, default=128)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--graphs", type=int, default=128)
    p.add_argument("--nodes", type=int, default=64)
    p.add_argument("--deg", type=int, default=16)
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--fused", action="store_true",
                   help="slotted collate + fused Pallas edge kernel")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from train_step import build_batch
    from hydragnn_tpu.models.arch import ArchConfig, BranchConfig
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.train.optimizer import select_optimizer
    from hydragnn_tpu.train.trainer import (
        init_state, make_loss_fn, _forward,
    )
    from hydragnn_tpu.ops.segment import gather_scatter_sum

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
    batch = build_batch(args.graphs, args.nodes, args.deg, seed=0,
                        slotted=args.fused)
    E = batch.senders.shape[0]
    opt = select_optimizer({"Optimizer": {"type": "AdamW",
                                          "learning_rate": 1e-3}})
    state = init_state(model, batch, opt)
    loss_fn = make_loss_fn(model, cfg, False, args.bf16)
    key = jax.random.PRNGKey(0)
    h = jnp.zeros((batch.num_nodes, args.hidden), jnp.float32)

    def piece_fwd(carry, rng):
        x = batch.replace(x=batch.x + carry * 1e-30)
        out, _ = _forward(model, state.params, state.batch_stats, x, False)
        return jnp.sum(out[0]), None

    def _tree_probe(tree):
        # touch EVERY leaf so XLA cannot dead-code-eliminate any of the
        # backward pass / optimizer update
        return sum(jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(tree))

    def piece_grad(carry, rng):
        x = batch.replace(x=batch.x + carry * 1e-30)
        (l, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, x, rng, True
        )
        return l + _tree_probe(grads) * 1e-30, None

    def piece_full(carry, rng):
        x = batch.replace(x=batch.x + carry * 1e-30)
        (l, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, x, rng, True
        )
        updates, _ = opt.update(grads, state.opt_state, state.params)
        return l + _tree_probe(updates) * 1e-30, None

    def piece_convs(carry, rng):
        v = h + carry * 1e-30

        def lyr(v, _):
            out = gather_scatter_sum(
                v, batch.senders, batch.receivers, v.shape[0],
                edge_mask=batch.edge_mask,
                perm_by_sender=batch.edge_perm_by_sender,
            )
            return out, None
        v, _ = jax.lax.scan(lyr, v, None, length=args.layers)
        return jnp.sum(v), None

    def piece_convs_grad(carry, rng):
        v = h + carry * 1e-30

        def agg_loss(u):
            def lyr(u, _):
                out = gather_scatter_sum(
                    u, batch.senders, batch.receivers, u.shape[0],
                    edge_mask=batch.edge_mask,
                    perm_by_sender=batch.edge_perm_by_sender,
                )
                return out, None
            u, _ = jax.lax.scan(lyr, u, None, length=args.layers)
            return jnp.sum(u)
        g = jax.grad(agg_loss)(v)
        return jnp.sum(g), None

    pieces = {
        "fwd": piece_fwd,
        "grad": piece_grad,
        "full(step)": piece_full,
        "convs_fwd": piece_convs,
        "convs_fwd+bwd": piece_convs_grad,
    }
    rngs = jax.random.split(key, args.iters)
    for name, fn in pieces.items():
        @jax.jit
        def loop(c0, fn=fn):
            return jax.lax.scan(fn, c0, rngs)

        try:
            jax.block_until_ready(loop(jnp.float32(0.0)))
            dt = float("inf")
            for t in range(3):
                c0 = jnp.float32(1e-6 * (t + 1))
                t0 = time.perf_counter()
                jax.block_until_ready(loop(c0))
                dt = min(dt, (time.perf_counter() - t0) / args.iters)
            print(f"  {name:14s} {dt*1e3:7.2f} ms  ({E/dt/1e6:6.1f} Medges/s)",
                  flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"  {name:14s} FAILED {type(exc).__name__}: {str(exc)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
