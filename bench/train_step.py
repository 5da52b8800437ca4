"""Train-step throughput bench: epoch-in-a-scan on a synthetic batched
workload (default: the reference's SC25 GFM shape — EGNN, 4 conv layers —
run-scripts/SC25-job-weak.sh + examples/multibranch/multibranch_GFM260_SC25
.json: hidden_dim 866, batch 128 graphs/rank).

Timing discipline for tunneled TPU hosts (see bench.py): all S steps run
inside ONE lax.scan; >=3 trials, report the min; every trial passes a fresh
rng (fold_in) and the evolving TrainState so no remote result cache can hit.

Usage:
  python bench/train_step.py                         # EGNN h128 L4 (r1 ref)
  python bench/train_step.py --hidden 866            # GFM-scale
  python bench/train_step.py --hidden 866 --bf16
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_batch(n_graphs, n, deg, seed, dense_adj=False, slotted=False,
                forces=False, multibranch=False):
    from hydragnn_tpu.graph import GraphSample, collate

    rng = np.random.RandomState(seed)
    samples = []
    recv = np.repeat(np.arange(n, dtype=np.int64), deg)
    for g in range(n_graphs):
        send = rng.randint(0, n, n * deg)
        samples.append(
            GraphSample(
                x=rng.randn(n, 1).astype(np.float32),
                pos=rng.randn(n, 3).astype(np.float32),
                edge_index=np.stack([send, recv]),
                y_graph=(
                    None if forces
                    else np.concatenate(
                        [rng.randn(1), rng.randn(0)]
                    ).astype(np.float32)
                    if not multibranch
                    else rng.randn(1).astype(np.float32)
                ),
                y_node=(rng.randn(n, 3).astype(np.float32)
                        if multibranch else None),
                energy=(np.float32(rng.randn()) if forces else None),
                forces=(rng.randn(n, 3).astype(np.float32)
                        if forces else None),
                # graphs round-robin across the 5 dataset branches
                dataset_id=(g % 5) if multibranch else 0,
            )
        )
    if dense_adj:
        return collate(samples, node_slot=n, dense_adjacency=True)
    if slotted:
        # node+edge slots: the fused per-graph-block edge-kernel layout
        return collate(samples, node_slot=n, edge_slot=n * deg)
    return collate(samples)


def model_flops_per_step(mpnn_type, H, layers, N, E, bwd_factor=3.0):
    """Analytic matmul FLOPs for one TRAINING step (fwd x3 ~= fwd + bwd).

    Counts the dense/matmul terms only (aggregation, activations, norms,
    optimizer excluded — standard MFU practice). Shapes follow the actual
    flax modules (models/egnn.py, gin.py): 2*M*K*Nout per Dense."""
    if mpnn_type == "EGNN":
        # per layer (models/egnn.py EGCL): pre_s/pre_d on nodes, geom on
        # edges (g~1), edge_mlp_1 on edges, node MLP on nodes
        per_layer = (
            2 * N * H * H * 2          # pre_s + pre_d
            + 2 * E * 1 * H            # geom (radial only)
            + 2 * E * H * H            # edge_mlp_1
            + 2 * N * (2 * H) * H      # node_mlp_0 (concat[inv, agg])
            + 2 * N * H * H            # node_mlp_1
        )
    elif mpnn_type == "GIN":
        per_layer = 2 * N * H * H * 2  # two-layer MLP
    elif mpnn_type == "PAINN":
        # models/painn.py: scalar MLP (1+3), U/V on the 3-axis vector
        # channel (3+3), update MLP (2+3), embed-out (1+1) + vec (3)
        # = 20 N H^2 matmul units; filter Dense on edges (nr=5 harness)
        nr = 5
        per_layer = 2 * N * H * H * 20 + 2 * E * nr * 3 * H
    elif mpnn_type == "PNA":
        # models/pna.py: pre_nn dst+src (2), post_nn over [inv, 16F
        # scaled concat] (17), lin (1) = 20 N H^2 (aggregation bmm
        # excluded per MFU convention)
        per_layer = 2 * N * H * H * 20
    elif mpnn_type == "SchNet":
        # per layer (models/schnet.py CFConv): lin1 + filter MLP (ng -> H
        # -> H on edges) + lin2; ng = 10 gaussians in this harness
        ng = 10
        per_layer = (
            2 * N * H * H            # lin1
            + 2 * E * ng * H         # filter mlp_0
            + 2 * E * H * H          # filter mlp_1
            + 2 * N * H * H          # lin2
        )
    elif mpnn_type == "SAGE":
        # models/sage.py: lin_l (agg) + lin_r (self), both H -> H on nodes
        per_layer = 2 * N * H * H * 2
    elif mpnn_type == "MFC":
        # models/mfc.py: per-degree root+neighbor matmuls, scan over
        # D = max_neighbours + 1 degree slots, EVERY node each (masked
        # select) — the dense work is D x (2 matmuls)
        D = 17  # harness: max_neighbours = deg = 16
        per_layer = 2 * N * H * H * 2 * D
    elif mpnn_type == "CGCNN":
        # models/cgcnn.py CGConv: lin_f + lin_s, each [E, 2H] -> H
        per_layer = 2 * E * (2 * H) * H * 2
    elif mpnn_type == "GAT":
        # models/gat.py GATv2 (heads=6, concat on hidden layers): layer 0
        # takes H, hidden layers take 6H; lin_l + lin_r each I -> 6H; the
        # dense-attention alpha @ V bmm is 2*G*S^2*6H per graph-slot S
        # (the pairwise LeakyReLU logits are VPU elementwise, excluded
        # per matmul-MFU convention). Harness: S = N/G is the node slot.
        heads = 6
        fwd = 0
        for il in range(layers):
            I = H if il == 0 else H * heads
            fwd += 2 * N * I * (heads * H) * 2
        # attention contractions: logits reduce + alpha@V, both per layer
        # with S^2 pairs: N * S * (heads*H) each
        S = 64
        fwd += layers * 2 * N * S * heads * H * 2
        return fwd * bwd_factor
    elif mpnn_type == "PNAPlus":
        # models/pnaplus.py: pre_nn dst/src (2 N·H^2), post_nn [inv,16F]
        # -> F (17), lin (1); edges: pre_nn_enc (E·H^2), rbf_emb + rbf_lin
        # (nr -> H each)
        nr = 5
        per_layer = (
            2 * N * H * H * (2 + 17 + 1)
            + 2 * E * H * H
            + 2 * E * nr * H * 2
        )
    elif mpnn_type == "PNAEq":
        # models/pnaeq.py PNAEqMessage: edge MLP chain pre_nn(3H->H),
        # smlp_0/1 (H->H), smlp_2 (H->3H), rbf_emb (nr->H), rbf_lin
        # (nr->3H); nodes: post_nn ([x,20F] -> F)
        nr = 5
        per_layer = (
            2 * E * H * H * (3 + 1 + 1 + 3)
            + 2 * E * nr * H * 4
            + 2 * N * 21 * H * H
        )
    elif mpnn_type == "DimeNet":
        # models/dimenet.py InteractionPP main matmul terms per layer:
        # lin_ji/lin_kj (E·H^2 x2), lin_down (H->i), lin_up (i->H),
        # rbf2 (b->H), residuals (nbs+nas blocks of 2 H^2 Denses on E),
        # output block lin_up (H->out_emb) + 3 out_emb^2 Denses on N.
        # Triplet-side sbf contractions scale with T = E*deg (excluded:
        # dominated by E-side at harness shapes). Harness arch defaults:
        # int_emb 64, basis_emb 8, out_emb 128, nbs=1, nas=2.
        i_emb, b_emb, o_emb, nbs, nas = 64, 8, 128, 1, 2
        per_layer = (
            2 * E * H * H * 2
            + 2 * E * H * i_emb * 2
            + 2 * E * b_emb * H
            + 2 * E * H * H * 2 * (nbs + nas)
            + 2 * E * H * o_emb
            + 2 * N * o_emb * o_emb * 3
        )
    else:
        return None
    fwd = per_layer * layers
    return fwd * bwd_factor


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mpnn_type", default="EGNN")
    p.add_argument("--hidden", type=int, default=128)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--graphs", type=int, default=128)
    p.add_argument("--nodes", type=int, default=64)
    p.add_argument("--deg", type=int, default=16)
    p.add_argument("--steps", type=int, default=16)
    p.add_argument("--trials", type=int, default=3)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--dense_adj", action="store_true")
    p.add_argument("--fused", action="store_true",
                   help="slotted collate + fused Pallas edge kernel")
    p.add_argument("--multibranch", action="store_true",
                   help="the SC25 GFM260 5-branch configuration: 5 graph "
                        "(energy) + 5 node (forces) branches with 3x889 "
                        "heads, graphs mixed across 5 dataset ids "
                        "(ref: multibranch_GFM260_SC25.json:166-225)")
    p.add_argument("--equivariant", action="store_true",
                   help="EGNN coordinate updates on (the SC25 config sets "
                        "equivariance=true; disables the fused kernel)")
    p.add_argument("--forces", action="store_true",
                   help="energy-force training step (compute_grad_energy: "
                        "grad-of-grad through the conv stack)")
    p.add_argument("--init_scale", type=float, default=1.0,
                   help="multiply kernel params after init (keeps "
                        "degree-compounding families finite in bf16 on "
                        "random synthetic data; timing-neutral)")
    p.add_argument("--json", action="store_true",
                   help="print one JSON result line (for bench.py)")
    args = p.parse_args()

    import jax

    from hydragnn_tpu.models.arch import ArchConfig, BranchConfig
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.train.optimizer import select_optimizer
    from hydragnn_tpu.train.trainer import (
        init_state,
        make_scan_train_epoch,
        stack_batches,
    )

    # force training predicts per-node energies via a node head
    # (ref: Base.energy_force_loss + tests/test_forces.py config).
    # --multibranch: the SC25 GFM260 decoder set — 5 graph (energy;
    # shared 2x50, head 3x889) + 5 node (forces, 3x889) branches
    # (ref: multibranch_GFM260_SC25.json:166-225)
    if args.multibranch:
        out_dim, out_type = (1, 3), ("graph", "node")
        gb = tuple(
            BranchConfig(f"branch-{i}", 2, 50, 3, (889, 889, 889))
            for i in range(5)
        )
        nb = tuple(
            BranchConfig(f"branch-{i}", 0, 0, 3, (889, 889, 889),
                         head_nn_type="mlp")
            for i in range(5)
        )
    else:
        out_dim = (1,)
        out_type = ("node",) if args.forces else ("graph",)
        gb = (
            () if args.forces
            else (BranchConfig("branch-0", 2, 50, 2, (50, 25)),)
        )
        nb = (
            (BranchConfig("branch-0", 0, 0, 2, (50, 25),
                          head_nn_type="mlp"),)
            if args.forces else ()
        )
    cfg = ArchConfig(
        mpnn_type=args.mpnn_type,
        input_dim=1,
        hidden_dim=args.hidden,
        output_dim=out_dim,
        output_type=out_type,
        graph_branches=gb,
        node_branches=nb,
        num_conv_layers=args.layers,
        num_nodes=args.nodes,
        max_neighbours=args.deg,
        radius=5.0,
        num_radial=5,
        envelope_exponent=5,
        num_gaussians=10,
        num_filters=args.hidden,
        # MACE equivariant sizes (reference CI defaults; unused elsewhere)
        max_ell=(2 if args.mpnn_type == "MACE" else None),
        node_max_ell=(1 if args.mpnn_type == "MACE" else None),
        avg_num_neighbors=(float(args.deg) if args.mpnn_type == "MACE"
                           else None),
        correlation=((2,) if args.mpnn_type == "MACE" else None),
        # DimeNet++ block sizes (reference CI defaults; unused elsewhere)
        num_spherical=7,
        num_before_skip=1,
        num_after_skip=2,
        basis_emb_size=8,
        int_emb_size=64,
        out_emb_size=128,
        equivariance=args.equivariant,
        task_weights=(1.0,) * len(out_dim),
        # harness graphs have exactly `deg` in-edges per node
        pna_deg=(0,) * args.deg + (args.graphs * args.nodes,),
    )
    model = create_model(cfg)
    batches = [
        build_batch(args.graphs, args.nodes, args.deg, seed=s,
                    dense_adj=args.dense_adj, slotted=args.fused,
                    forces=args.forces, multibranch=args.multibranch)
        for s in range(args.steps)
    ]
    E = batches[0].senders.shape[0]
    stacked = stack_batches(batches)
    opt = select_optimizer({"Optimizer": {"type": "AdamW",
                                          "learning_rate": 1e-3}})
    state = init_state(model, batches[0], opt)
    if args.init_scale != 1.0:
        # damp kernel params: random synthetic data at untrained init
        # compounds with degree in sum-aggregating families (PAINN vector
        # channel, DimeNet triplets, GAT logits) and overflows bf16 after
        # a few layers. Timing is value-independent; the scale makes the
        # loss column a real smoke test and is recorded in the JSON.
        sc = args.init_scale
        state = state.replace(params=jax.tree_util.tree_map(
            lambda p: p * sc if p.ndim >= 2 else p, state.params
        ))
    n_params = sum(
        int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(state.params)
    )
    # NO donation: donated buffers are recycled, and remote result caches
    # key on arg buffer handles — recycled handles read as cache hits
    # (~0.1 ms/step fake numbers). Undonated outputs live in fresh buffers,
    # so feeding each trial's state into the next guarantees fresh handles;
    # folding the previous loss into the rng adds a content-level dependency.
    epoch = jax.jit(make_scan_train_epoch(
        model, cfg, opt, compute_grad_energy=args.forces,
        mixed_precision=args.bf16,
    ))
    key = jax.random.PRNGKey(0)

    best = float("inf")
    trial_dts = []
    losses = None
    salt = 0
    for trial in range(args.trials + 1):  # +1: first is compile+warm
        rng = jax.random.fold_in(jax.random.fold_in(key, trial), salt)
        t0 = time.perf_counter()
        state, losses = epoch(state, stacked, rng)
        lsum = float(np.asarray(losses).sum())  # host fetch = completion
        dt = (time.perf_counter() - t0) / args.steps
        # untrained-init magnitude blowup can NaN the loss on synthetic
        # random data (PAINN's un-normalized vector channel compounds with
        # degree); the TIMING stays valid — FLOPs are value-independent —
        # so tolerate it and flag it in the JSON
        salt = (int(abs(lsum) * 1e6) % (1 << 30)
                if np.isfinite(lsum) else trial)
        tag = "compile+warm" if trial == 0 else f"trial {trial}"
        print(f"{tag:14s} {dt*1e3:8.2f} ms/step  loss_sum={lsum:.5f}",
              flush=True)
        if trial > 0:
            best = min(best, dt)
            trial_dts.append(dt)

    # MFU numerator: ANALYTIC model FLOPs (fwd matmuls x3 for fwd+bwd;
    # optimizer/elementwise excluded) — the honest numerator for "model
    # FLOPs utilization" (VERDICT weak #8). XLA's cost_analysis() counts a
    # lax.scan body ONCE (per trip, not x trip count), which silently
    # undercounted ~an order of magnitude in round 2's first cut; it is
    # kept only as an aux cross-check. Denominators: v5e spec peak
    # (197 TF bf16) and this device's MEASURED large-matmul peak (115 TF,
    # bench/results/device_calibration_r2.md).
    N = args.graphs * args.nodes
    flops_step = model_flops_per_step(
        args.mpnn_type, args.hidden, args.layers, N, E
    )
    if args.multibranch and flops_step:
        # decoder-branch matmuls (all 5 branches computed densely and
        # branch-masked): graph shared 2x50 + 3x889 head; node 3x889
        H, G_, N_ = args.hidden, args.graphs, N
        graph_head = G_ * (H * 50 + 50 * 50 + 50 * 889
                           + 889 * 889 * 2 + 889 * 1)
        node_head = N_ * (H * 889 + 889 * 889 * 2 + 889 * 3)
        flops_step += 2 * 5 * (graph_head + node_head) * 3
    if args.forces and flops_step:
        # force training ~= 7/3 of a plain step's matmul FLOPs: plain =
        # fwd(1) + bwd(2); forces = inner fwd(1) + inner pos-bwd(2) +
        # standalone fwd(1) + outer reverse over the inner trace (~3).
        # Approximate — reported MFU for --forces is indicative only.
        flops_step = int(flops_step * 7 / 3)
    xla_flops_per_step = None
    try:
        rngc = jax.random.fold_in(key, 12345)
        ca = epoch.lower(state, stacked, rngc).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        xla_flops_per_step = float(ca["flops"])  # scan body = one step
    except Exception as e:  # cost analysis unavailable on some runtimes
        print(f"# cost_analysis unavailable: {e}", file=sys.stderr)
    mfu_numerator = "analytic"
    if not flops_step and xla_flops_per_step:
        # families with no clean matmul decomposition (MACE's symmetric-
        # contraction einsum chains): use XLA's counted cost as the
        # numerator so the row still has an MFU — flagged, since XLA
        # counts a scan body once (exactly one step here) and includes
        # non-matmul flops
        flops_step = int(xla_flops_per_step)
        mfu_numerator = "xla_cost"
    mfu_spec = flops_step / best / 197e12 if flops_step else None
    mfu_meas = flops_step / best / 115e12 if flops_step else None

    l0, l1 = float(np.asarray(losses)[0]), float(np.asarray(losses)[-1])
    if args.json:
        import json

        print(json.dumps({
            "ms_per_step": round(best * 1e3, 3),
            "loss_finite": bool(np.isfinite(lsum)),
            "init_scale": args.init_scale,
            "n_trials": len(trial_dts),
            "trial_ms_per_step": [round(d * 1e3, 3) for d in trial_dts],
            "stdev_ms_per_step": round(float(np.std(trial_dts)) * 1e3, 3),
            "medges_per_s": round(E / best / 1e6, 2),
            "mfu_numerator": mfu_numerator,
            "flops_per_step": flops_step,
            "xla_cost_flops_per_step": xla_flops_per_step,
            "mfu_vs_spec_peak": (
                round(mfu_spec, 4) if mfu_spec is not None else None
            ),
            "mfu_vs_measured_peak": (
                round(mfu_meas, 4) if mfu_meas is not None else None
            ),
            "shape": f"{args.mpnn_type} h{args.hidden} L{args.layers} "
                     f"B={args.graphs}x{args.nodes} E={E} "
                     f"{'bf16' if args.bf16 else 'fp32'}"
                     f"{' forces' if args.forces else ''}"
                     f"{' multibranch5' if args.multibranch else ''}"
                     f"{' equivariant' if args.equivariant else ''}",
        }))
        return
    mfu_str = (
        f"  MFU {mfu_spec*100:.1f}% of spec peak / {mfu_meas*100:.1f}% of "
        f"measured peak ({flops_step/1e9:.1f} GF/step)"
        if mfu_spec is not None else ""
    )
    print(
        f"\n{args.mpnn_type} h{args.hidden} L{args.layers} "
        f"B={args.graphs}x{args.nodes} E={E} params={n_params/1e6:.1f}M "
        f"{'bf16' if args.bf16 else 'fp32'}:\n"
        f"  {best*1e3:.1f} ms/step  {E/best/1e6:.2f} Medges/s  "
        f"losses[0]={l0:.4f} -> losses[-1]={l1:.4f} (must evolve)"
        f"{mfu_str}",
        flush=True,
    )


if __name__ == "__main__":
    main()
