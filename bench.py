"""Benchmark: message-aggregation (SpMM) throughput vs HBM speed-of-light.

North-star metric (BASELINE.md): segment-sum aggregation — THE hot op of every
message-passing layer — at HBM speed-of-light per chip. This measures the
sorted-CSR gather+segment_sum path used by all conv layers on a representative
workload and reports the achieved fraction of the HBM roofline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def hbm_bandwidth_bytes(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    table = {
        "tpu v5 lite": 819e9,  # v5e: 819 GB/s
        "tpu v5e": 819e9,
        "tpu v5": 2765e9,  # v5p
        "tpu v4": 1228e9,
        "tpu v6 lite": 1640e9,  # v6e (Trillium)
        "tpu v6e": 1640e9,
    }
    for k, v in table.items():
        if k in kind:
            return v
    return 819e9  # default to v5e


def main():
    import jax
    import jax.numpy as jnp
    from hydragnn_tpu.ops.segment import gather_scatter_sum

    dev = jax.devices()[0]
    bw = hbm_bandwidth_bytes(dev)

    N = 1 << 17  # nodes
    D = 16  # average degree
    E = N * D
    F = 128  # feature width

    rng = np.random.RandomState(0)
    receivers = np.sort(rng.randint(0, N, E)).astype(np.int32)
    senders = rng.randint(0, N, E).astype(np.int32)
    x = rng.randn(N, F).astype(np.float32)

    xd = jax.device_put(jnp.asarray(x), dev)
    sd = jax.device_put(jnp.asarray(senders), dev)
    rd = jax.device_put(jnp.asarray(receivers), dev)

    @jax.jit
    def spmm(x, s, r):
        return gather_scatter_sum(x, s, r, N)

    out = spmm(xd, sd, rd)
    out.block_until_ready()

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = spmm(xd, sd, rd)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    edges_per_s = E / dt
    # HBM roofline: gather reads E*F*4 (random rows — assume no reuse),
    # segment-sum writes N*F*4, plus index reads E*8.
    bytes_moved = E * F * 4 + N * F * 4 + E * 8
    sol_time = bytes_moved / bw
    fraction = sol_time / dt

    print(
        json.dumps(
            {
                "metric": "spmm_aggregation_fraction_of_hbm_sol",
                "value": round(float(fraction), 4),
                "unit": f"fraction_of_SOL({edges_per_s:.3e}_edges_per_s)",
                "vs_baseline": round(float(fraction), 4),
            }
        )
    )


if __name__ == "__main__":
    main()
