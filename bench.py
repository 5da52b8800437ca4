"""Benchmark: message-aggregation (SpMM) throughput vs HBM speed-of-light.

North-star metric (BASELINE.md): segment-sum aggregation — THE hot op of every
message-passing layer — at HBM speed-of-light per chip. Measures the
framework's aggregation path (Pallas CSR kernel on TPU, XLA segment_sum
elsewhere) on a representative workload (N=128k nodes, avg degree 16, F=128)
and reports the achieved fraction of the HBM roofline.

Measurement is dependency-chained inside one jit (fori_loop feeding varying
inputs) — repeated identical-arg calls would hit result caching through the
remote-TPU tunnel and read as impossibly fast.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def hbm_bandwidth_bytes(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    table = {
        "tpu v5 lite": 819e9,  # v5e
        "tpu v5e": 819e9,
        "tpu v5p": 2765e9,
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
    from hydragnn_tpu.ops.pallas_segment import segment_sum_auto

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

    iters = 10

    @jax.jit
    def spmm(x):
        return segment_sum_auto(x[sd], rd, N)

    # alternating input buffers defeat the remote-tunnel result cache while
    # keeping the compiled module small (a chained fori_loop measures the
    # same within noise but takes ~5x longer to compile remotely)
    x2 = xd * np.float32(1.0000001)
    out = spmm(xd)
    out.block_until_ready()
    t0 = time.perf_counter()
    outs = [spmm(xd if i % 2 else x2) for i in range(iters)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters

    edges_per_s = E / dt
    # HBM roofline for gather + reduce: node reads for the gather (E*F*4 worst
    # case, random rows), message write+read between gather and reduce is
    # fused away in the kernel path -> count E*F*4 read + N*F*4 write + idx.
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
