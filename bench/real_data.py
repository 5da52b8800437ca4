"""Real-data accuracy runs (round-3, offline).

Egress from this environment is zero (DNS disabled), so the QM9/MD17
downloads themselves are impossible; this runner produces the strongest
accuracy evidence available offline:

1. **Lennard-Jones energy+force** — the SAME benchmark the reference
   generates for itself (examples/LennardJones writes LJ-potential data;
   ref tests/test_forces_equivariant.py trains on it): full-scale run
   through ``train_validate_test`` with ``compute_grad_energy``, test
   energy MAE + force MAE against the exact potential.
2. **MD17-pipeline on real dynamics** — a velocity-Verlet MD trajectory
   of an LJ cluster dumped in the OFFICIAL sGDML ``.npz`` schema
   (R [T,n,3], z [n], E [T], F [T,n,3]) and ingested through
   examples/md17's real-format loader, exercising every byte of the
   real-data path except the download.

For the actual QM9/MD17 numbers on a mirrored copy:
  python examples/qm9/qm9.py  --data_dir <dir with 133k dsgdb9nsd_*.xyz>
  python examples/md17/md17.py --npz <md17_aspirin.npz> --forces

Usage: python bench/real_data.py [--epochs 60] [--configs 400]
Prints one JSON line per run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "examples",
                    "LennardJones")
)

import numpy as np


def eval_energy_forces(model, cfg, state, loader):
    """Test-set energy MAE (per graph) and force MAE (per component) with
    forces = -dE/dpos exactly as the trainer computes them."""
    import jax
    import jax.numpy as jnp

    from hydragnn_tpu.ops.segment import segment_sum

    @jax.jit
    def ef(state, batch):
        def graph_energy_of_pos(pos):
            b = batch.replace(pos=pos)
            pred = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                b, train=False,
            )
            node_e = pred[0]
            ge = segment_sum(
                node_e[:, 0] * b.node_mask.astype(node_e.dtype),
                b.node_graph_idx, b.num_graphs,
            )
            return jnp.sum(ge), ge

        (_, ge), dE = jax.value_and_grad(
            graph_energy_of_pos, has_aux=True
        )(batch.pos)
        return ge, -dE

    e_abs = e_cnt = f_abs = f_cnt = 0.0
    e_true_abs = f_true_abs = 0.0
    for batch in loader:
        ge, forces = ef(state, batch)
        gm = np.asarray(batch.graph_mask, np.float64)
        nm = np.asarray(batch.node_mask, np.float64)[:, None]
        e_abs += float(np.sum(np.abs(np.asarray(ge) - np.asarray(batch.energy)) * gm))
        e_true_abs += float(np.sum(np.abs(np.asarray(batch.energy)) * gm))
        e_cnt += float(gm.sum())
        f_abs += float(np.sum(np.abs(np.asarray(forces) - np.asarray(batch.forces)) * nm))
        f_true_abs += float(np.sum(np.abs(np.asarray(batch.forces)) * nm))
        f_cnt += float(nm.sum() * 3)
    return {
        "energy_mae": e_abs / max(e_cnt, 1),
        "energy_mean_abs": e_true_abs / max(e_cnt, 1),
        "force_mae": f_abs / max(f_cnt, 1),
        "force_mean_abs": f_true_abs / max(f_cnt, 1),
    }


def run_lj(epochs: int, configs: int, mpnn_type: str = "EGNN",
           model_neighbors: int = 20, model_radius: float = 2.6,
           egnn_aggr: str = "sum", edge_slot=None):
    from lennard_jones import make_dataset

    from hydragnn_tpu.config import update_config
    from hydragnn_tpu.data.dataloader import create_dataloaders, split_dataset
    from hydragnn_tpu.models.arch import arch_config_from_dict
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.train.trainer import train_validate_test

    # physics-complete model graph: the LJ cutoff is 2.5 (absolute), so
    # every interacting pair must be an edge or force accuracy is capped
    dataset = make_dataset(
        n_configs=configs, model_neighbors=model_neighbors,
        model_radius=model_radius,
    )
    train, val, test = split_dataset(dataset, 0.8)
    config = {
        "Verbosity": {"level": 0},
        "NeuralNetwork": {
            "Architecture": {
                "mpnn_type": mpnn_type,
                "egnn_aggr": egnn_aggr,
                "radius": 5.0,
                "max_neighbours": model_neighbors,
                "hidden_dim": 64,
                "num_conv_layers": 3,
                "num_gaussians": 32,
                "num_filters": 64,
                "num_radial": 8,
                "envelope_exponent": 5,
                "max_ell": 1, "node_max_ell": 1, "correlation": 2,
                "output_heads": {
                    "node": {"num_headlayers": 2,
                             "dim_headlayers": [64, 64], "type": "mlp"}
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
                "num_epoch": epochs,
                "perc_train": 0.8,
                "compute_grad_energy": True,
                "batch_size": 16,
                "Optimizer": {"type": "AdamW", "learning_rate": 0.003},
            },
        },
    }
    config = update_config(config, train, val, test)
    loaders = create_dataloaders(train, val, test, batch_size=16,
                                 edge_slot=edge_slot)
    cfg = arch_config_from_dict(config["NeuralNetwork"])
    model = create_model(cfg)
    import jax

    state, results = train_validate_test(
        model, cfg, config, *loaders, rng=jax.random.PRNGKey(0)
    )
    metrics = eval_energy_forces(model, cfg, state, loaders[2])
    tag = f"_{egnn_aggr}" if mpnn_type == "EGNN" else ""
    if edge_slot is not None:
        tag += "_fusedslot"
    return {
        "run": f"LennardJones_{mpnn_type}{tag}_energy_force",
        "configs": configs,
        "epochs": epochs,
        "model_graph": f"{model_neighbors}nn_r{model_radius}",
        **{k: round(v, 6) for k, v in metrics.items()},
        "energy_rel_mae": round(
            metrics["energy_mae"] / max(metrics["energy_mean_abs"], 1e-12), 4
        ),
        "force_rel_mae": round(
            metrics["force_mae"] / max(metrics["force_mean_abs"], 1e-12), 4
        ),
    }


def make_md17_npz(path: str, n_steps: int = 2500, n_atoms: int = 8,
                  dt: float = 2e-3, seed: int = 3):
    """Velocity-Verlet MD of an LJ cluster, dumped in the official sGDML
    MD17 npz schema (R, z, E, F)."""
    rng = np.random.RandomState(seed)
    # start near the LJ minimum (2x2x2 cubic cluster at ~r_min spacing) so
    # the trajectory stays bound — the MD17 datasets are equilibrium AIMD
    a = 2 ** (1 / 6)
    grid = np.array(
        [[i, j, k] for i in range(2) for j in range(2) for k in range(2)],
        np.float64,
    ) * a
    pos = grid[:n_atoms] + rng.randn(n_atoms, 3) * 0.02
    vel = rng.randn(n_atoms, 3) * 0.02
    z = np.full(n_atoms, 6, np.int64)  # carbon cluster

    def lj_ef(p):
        # E = sum_{i<j} 4 (r^-12 - r^-6); F_i = -dE/dp_i
        d = p[:, None, :] - p[None, :, :]
        r2 = (d ** 2).sum(-1) + np.eye(n_atoms)
        inv6 = 1.0 / r2 ** 3
        e = 4.0 * np.sum(np.triu(inv6 * inv6 - inv6, 1))
        coef = (48 * inv6 * inv6 - 24 * inv6) / r2
        np.fill_diagonal(coef, 0.0)
        f = (coef[:, :, None] * d).sum(1)
        return e, f

    R, E, F = [], [], []
    e, f = lj_ef(pos)
    for t in range(n_steps * 4):
        vel = vel + 0.5 * dt * f
        pos = pos + dt * vel
        e, f_new = lj_ef(pos)
        vel = vel + 0.5 * dt * f_new
        f = f_new
        if t % 4 == 0:  # subsample like the 1 fs MD17 dumps
            R.append(pos.copy())
            E.append(e)
            F.append(f.copy())
    np.savez(
        path,
        R=np.asarray(R, np.float64),
        z=z,
        E=np.asarray(E, np.float64).reshape(-1, 1),
        F=np.asarray(F, np.float64),
    )
    return path


def run_md17_format(epochs: int, samples: int):
    import tempfile

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "examples", "md17")
    )
    from md17 import load_md17_npz

    from hydragnn_tpu.config import update_config
    from hydragnn_tpu.data.dataloader import create_dataloaders, split_dataset
    from hydragnn_tpu.models.arch import arch_config_from_dict
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.train.trainer import train_validate_test

    npz = os.path.join(tempfile.mkdtemp(), "md17_lj_cluster.npz")
    make_md17_npz(npz, n_steps=samples)
    data = load_md17_npz(npz, samples, radius=5.0, forces=True)
    train, val, test = split_dataset(data, 0.8)
    config = {
        "Verbosity": {"level": 0},
        "NeuralNetwork": {
            "Architecture": {
                "mpnn_type": "SchNet",
                "radius": 5.0,
                "max_neighbours": 8,
                "hidden_dim": 128,
                "num_conv_layers": 4,
                "num_gaussians": 32,
                "num_filters": 128,
                "num_radial": 8,
                "envelope_exponent": 5,
                "output_heads": {
                    "node": {"num_headlayers": 2,
                             "dim_headlayers": [128, 128], "type": "mlp"}
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
                "num_epoch": epochs,
                "perc_train": 0.8,
                "compute_grad_energy": True,
                "batch_size": 32,
                "Optimizer": {"type": "AdamW", "learning_rate": 0.001},
            },
        },
    }
    config = update_config(config, train, val, test)
    loaders = create_dataloaders(train, val, test, batch_size=32)
    cfg = arch_config_from_dict(config["NeuralNetwork"])
    model = create_model(cfg)
    import jax

    state, results = train_validate_test(
        model, cfg, config, *loaders, rng=jax.random.PRNGKey(0)
    )
    metrics = eval_energy_forces(model, cfg, state, loaders[2])
    return {
        "run": "MD17_format_LJcluster_SchNet_energy_force",
        "samples": samples,
        "epochs": epochs,
        **{k: round(v, 6) for k, v in metrics.items()},
        "energy_rel_mae": round(
            metrics["energy_mae"] / max(metrics["energy_mean_abs"], 1e-12), 4
        ),
        "force_rel_mae": round(
            metrics["force_mae"] / max(metrics["force_mean_abs"], 1e-12), 4
        ),
    }


def make_eam_alloy_dataset(n_configs=600, n_side=3, seed=11):
    """FCC Ni/Nb solid-solution supercells with the surrogate-EAM energy +
    ANALYTIC forces (examples/eam/eam.py physics) as direct training
    targets — the GFM260 objective shape: graph energy + node forces
    (ref: multibranch_GFM260_SC25.json output type ["graph","node"])."""
    import sys as _sys

    _sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "examples", "eam")
    )
    from eam import NB, NI, eam_energy_forces, fcc_solid_solution

    from hydragnn_tpu.data.neighbors import radius_graph_pbc
    from hydragnn_tpu.graph import GraphSample

    rng = np.random.RandomState(seed)
    samples = []
    for _ in range(n_configs):
        zs, pos, cell = fcc_solid_solution(rng, n_side=n_side)
        node_e, forces = eam_energy_forces(zs, pos, cell)
        # model graph (repair allowed) separate from the physics graph
        ei, shifts = radius_graph_pbc(
            pos.astype(np.float32), cell.astype(np.float32), 4.2,
            max_num_neighbors=24,
        )
        n = len(zs)
        # species one-hot + CARTESIAN COORDINATES as input features — the
        # reference GFM260 config feeds coordinates as node features 1-3
        # (multibranch_GFM260_SC25.json input_node_features [0,1,2,3]);
        # without them a DIRECT force head on invariant features has no
        # directional information and provably learns zero
        x = np.concatenate(
            [(zs == NB).astype(np.float32).reshape(-1, 1),
             pos.astype(np.float32)], axis=1,
        )
        samples.append(GraphSample(
            x=x,
            pos=pos.astype(np.float32),
            edge_index=ei,
            edge_shifts=shifts,
            # energy per atom (keeps the extensive target O(1)); forces
            # RAW — scaling them by 1/n buried the force signal under the
            # MSE floor and the head learned exactly zero (first campaign
            # run: force MAE == mean |F|)
            y_graph=np.asarray([node_e.sum() / n], np.float32),
            y_node=forces.astype(np.float32),
        ))
    return samples


def eval_direct_heads(model, cfg, state, loader):
    """Test-set MAEs for the direct graph-energy + node-forces heads."""
    import jax

    @jax.jit
    def fwd(state, batch):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, train=False,
        )

    e_abs = e_cnt = f_abs = f_cnt = 0.0
    e_true = f_true = 0.0
    for batch in loader:
        pred = fwd(state, batch)
        ge = np.asarray(pred[0])[:, 0]
        fo = np.asarray(pred[1])
        gm = np.asarray(batch.graph_mask, np.float64)
        nm = np.asarray(batch.node_mask, np.float64)[:, None]
        ey = np.asarray(batch.graph_y)[:, 0]
        fy = np.asarray(batch.node_y)
        e_abs += float(np.sum(np.abs(ge - ey) * gm))
        e_true += float(np.sum(np.abs(ey) * gm))
        e_cnt += float(gm.sum())
        f_abs += float(np.sum(np.abs(fo - fy) * nm))
        f_true += float(np.sum(np.abs(fy) * nm))
        f_cnt += float(nm.sum() * 3)
    return {
        "energy_mae": e_abs / max(e_cnt, 1),
        "energy_mean_abs": e_true / max(e_cnt, 1),
        "force_mae": f_abs / max(f_cnt, 1),
        "force_mean_abs": f_true / max(f_cnt, 1),
    }


def run_gfm_objective(epochs, configs, mpnn_type="EGNN", egnn_aggr="sum",
                      hidden=128, layers=4, equivariance=False):
    """Direct-force-head training in the GFM260 objective shape on the
    EAM-alloy dataset (analytic forces). The round-3 VERDICT's top ask:
    scale the offline accuracy evidence to the ACTUAL flagship objective
    (graph energy + direct node forces, not -grad E)."""
    from hydragnn_tpu.config import update_config
    from hydragnn_tpu.data.dataloader import create_dataloaders, split_dataset
    from hydragnn_tpu.models.arch import arch_config_from_dict
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.train.trainer import train_validate_test

    dataset = make_eam_alloy_dataset(configs)
    train, val, test = split_dataset(dataset, 0.8)
    config = {
        "Verbosity": {"level": 0},
        "NeuralNetwork": {
            "Architecture": {
                "mpnn_type": mpnn_type,
                "egnn_aggr": egnn_aggr,
                "equivariance": equivariance,
                "radius": 4.2,
                "max_neighbours": 24,
                "hidden_dim": hidden,
                "num_conv_layers": layers,
                "num_gaussians": 32,
                "num_filters": hidden,
                "num_radial": 8,
                "envelope_exponent": 5,
                "output_heads": {
                    "graph": {"num_sharedlayers": 2,
                              "dim_sharedlayers": 50,
                              "num_headlayers": 2,
                              "dim_headlayers": [hidden, hidden]},
                    "node": {"num_headlayers": 2,
                             "dim_headlayers": [hidden, hidden],
                             "type": "mlp"},
                },
                "task_weights": [1.0, 30.0],
            },
            "Variables_of_interest": {
                "input_node_features": [0, 1, 2, 3],
                "output_names": ["energy", "forces"],
                "output_index": [0, 1],
                "type": ["graph", "node"],
                "output_dim": [1, 3],
                "denormalize_output": False,
            },
            "Training": {
                "num_epoch": epochs,
                "perc_train": 0.8,
                "batch_size": 16,
                "Optimizer": {"type": "AdamW", "learning_rate": 0.002},
            },
        },
    }
    config = update_config(config, train, val, test)
    loaders = create_dataloaders(train, val, test, batch_size=16)
    cfg = arch_config_from_dict(config["NeuralNetwork"])
    model = create_model(cfg)
    import jax

    state, results = train_validate_test(
        model, cfg, config, *loaders, rng=jax.random.PRNGKey(0)
    )
    metrics = eval_direct_heads(model, cfg, state, loaders[2])
    tag = f"_{egnn_aggr}" if mpnn_type == "EGNN" else ""
    if equivariance:
        tag += "_equivariant"
    return {
        "run": f"EAMalloy_GFMobjective_{mpnn_type}{tag}",
        "configs": configs,
        "epochs": epochs,
        **{k: round(v, 6) for k, v in metrics.items()},
        "energy_rel_mae": round(
            metrics["energy_mae"] / max(metrics["energy_mean_abs"], 1e-12), 4
        ),
        "force_rel_mae": round(
            metrics["force_mae"] / max(metrics["force_mean_abs"], 1e-12), 4
        ),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--configs", type=int, default=400)
    p.add_argument("--md17_samples", type=int, default=1500)
    p.add_argument("--md17_epochs", type=int, default=40)
    p.add_argument("--only",
                   choices=["lj", "md17", "gfm", "aggr", "lj_fused"],
                   default=None)
    p.add_argument("--gfm_epochs", type=int, default=80)
    p.add_argument("--gfm_configs", type=int, default=600)
    args = p.parse_args()

    if args.only in (None, "lj"):
        print(json.dumps(run_lj(args.epochs, args.configs)), flush=True)
    if args.only in (None, "md17"):
        print(
            json.dumps(run_md17_format(args.md17_epochs, args.md17_samples)),
            flush=True,
        )
    if args.only in (None, "gfm"):
        # the GFM260 objective (graph energy + DIRECT node forces) on
        # generated EAM-alloy physics: flagship EGNN + sum/mean ablation
        # + SchNet control (round-3 VERDICT items 1b + weak 3)
        for mpnn, aggr in (("EGNN", "sum"), ("EGNN", "mean"),
                           ("SchNet", "sum")):
            print(json.dumps(run_gfm_objective(
                args.gfm_epochs, args.gfm_configs, mpnn, aggr,
            )), flush=True)
    if args.only == "lj_fused":
        # end-to-end validation of the SECOND-ORDER fused kernels on real
        # physics: the edge-slotted collate routes force training through
        # the fused custom-VJP chain on TPU (round-4) — accuracy must
        # match the unfused round-3 numbers
        for mpnn in ("SchNet", "EGNN"):
            print(json.dumps(run_lj(
                args.epochs, args.configs, mpnn, edge_slot="auto",
            )), flush=True)
    if args.only == "aggr":
        # -grad E (compute_grad_energy) LJ force ablation: EGNN sum vs
        # mean aggregation at high degree (round-3 weak #3 control)
        for aggr in ("sum", "mean"):
            r = run_lj(args.epochs, args.configs, "EGNN", egnn_aggr=aggr)
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
