"""Collective-traffic accounting: halo exchange vs all-gather SpMM.

Proves the ``parallel/halo.py`` traffic claim with COMPILED evidence: both
D-way graph-parallel aggregation programs are lowered on an 8-virtual-
device mesh and every collective op in the optimized HLO is counted with
its byte size. The halo path must move all_to_all bytes proportional to
D * H * F per device (H = static halo width) while the all-gather path
moves the full N * F node array.

Usage: python bench/collective_traffic.py [--devices 8] [--side 182]
Prints one JSON line per program + a summary comparison.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

_SHAPE = re.compile(r"(f32|bf16|f16|s32|u32|s8|u8|pred)\[([\d,]*)\]")
_BYTES = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2, "s8": 1,
          "u8": 1, "pred": 1}
_COLL = ("all-to-all", "all-gather", "all-reduce", "collective-permute",
         "reduce-scatter", "all-to-all-start", "all-gather-start",
         "all-reduce-start", "collective-permute-start")


def collective_bytes(hlo_text: str):
    """{op_kind: total output bytes} over every collective instruction in
    the optimized HLO ("-done" halves of async pairs are skipped so each
    collective counts once)."""
    out = {}
    for line in hlo_text.splitlines():
        s = line.strip()
        if "=" not in s:
            continue
        for op in _COLL:
            m = re.search(rf"\s{re.escape(op)}(\.\d+)?\(", s)
            if not m:
                continue
            lhs = s.split("=", 1)[1][: m.start() - len(s.split("=", 1)[0])]
            # shapes on the result side, before the op name
            rhs = s.split("=", 1)[1]
            cut = re.search(rf"{re.escape(op)}(\.\d+)?\(", rhs).start()
            nbytes = 0
            for dt, dims in _SHAPE.findall(rhs[:cut]):
                n = 1
                for d in dims.split(","):
                    if d:
                        n *= int(d)
                nbytes += n * _BYTES[dt]
            if nbytes:
                key = op.replace("-start", "")
                out[key] = out.get(key, 0) + nbytes
            break
    return out


def lattice_batch(side: int, n_node_pad: int, n_edge_pad: int):
    from hydragnn_tpu.graph import GraphSample, collate

    n = side * side
    rows = np.arange(n) // side
    cols = np.arange(n) % side
    senders, receivers = [], []
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            if dr == 0 and dc == 0:
                continue
            r2, c2 = rows + dr, cols + dc
            ok = (r2 >= 0) & (r2 < side) & (c2 >= 0) & (c2 < side)
            senders.append((r2 * side + c2)[ok])
            receivers.append(np.arange(n)[ok])
    ei = np.stack([np.concatenate(senders), np.concatenate(receivers)])
    rng = np.random.RandomState(0)
    s = GraphSample(
        x=rng.randn(n, 1).astype(np.float32),
        pos=rng.randn(n, 3).astype(np.float32),
        edge_index=ei,
        y_graph=np.zeros(1, np.float32),
    )
    return collate([s], n_node_pad=n_node_pad, n_edge_pad=n_edge_pad)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--side", type=int, default=182)
    p.add_argument("--features", type=int, default=128)
    args = p.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from jax.sharding import Mesh

    from hydragnn_tpu.parallel.halo import make_halo_spmm, partition_batch

    D, F = args.devices, args.features
    N_pad = ((args.side * args.side + 1 + D * 64 - 1) // (D * 64)) * (D * 64)
    batch = lattice_batch(args.side, N_pad, None)
    gp = partition_batch(batch, D)
    N = gp.num_nodes
    E = gp.num_edges
    H = gp.gp_send_idx.shape[2]

    mesh = Mesh(np.array(jax.devices()[:D]), ("graph",))
    x = jnp.asarray(
        np.random.RandomState(1).randn(N, F).astype(np.float32)
    )

    # --- halo path
    halo = make_halo_spmm(mesh)
    hlo_halo = (
        jax.jit(lambda x: halo(x, gp))
        .lower(x)
        .compile()
        .as_text()
    )
    halo_bytes = collective_bytes(hlo_halo)

    # --- all-gather path (partitioned_spmm: full [N, F] gather per SpMM)
    from functools import partial

    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from hydragnn_tpu.parallel.graph_parallel import partitioned_spmm

    B = N // D
    senders = jnp.asarray(np.asarray(gp.senders))
    recv_local = jnp.asarray(np.asarray(gp.receivers) % B)
    is_local = jnp.asarray(
        (np.asarray(gp.senders) // B) == (np.asarray(gp.receivers) // B)
    )
    valid = jnp.asarray(np.asarray(gp.edge_mask))
    ag = shard_map(
        partial(partitioned_spmm, n_local=B, axis="graph"),
        mesh=mesh,
        in_specs=(P("graph"), P("graph"), P("graph"), P("graph"),
                  P("graph")),
        out_specs=P("graph"),
        check_vma=False,
    )
    hlo_ag = (
        jax.jit(lambda x: ag(x, senders, recv_local, is_local, valid))
        .lower(x)
        .compile()
        .as_text()
    )
    ag_bytes = collective_bytes(hlo_ag)

    halo_total = sum(halo_bytes.values())
    ag_total = sum(ag_bytes.values())
    analytic_halo = D * H * F * 4       # [D, H, F] f32 per device
    analytic_ag = N * F * 4             # full node array per device
    result = {
        "metric": "graph_parallel_collective_bytes",
        "devices": D,
        "nodes": int(N),
        "edges": int(E),
        "halo_width_H": int(H),
        "halo_collectives": halo_bytes,
        "allgather_collectives": ag_bytes,
        "halo_total_bytes": halo_total,
        "allgather_total_bytes": ag_total,
        "traffic_ratio_allgather_over_halo": round(
            ag_total / max(halo_total, 1), 2
        ),
        "analytic_halo_bytes_per_dev": analytic_halo,
        "analytic_allgather_bytes_per_dev": analytic_ag,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
