"""Honest Pallas segment-sum variant sweep (scan-based timing).

Run-to-run absolute times on shared/tunneled TPU hosts fluctuate (tenancy),
so ALL comparisons must come from one process run. Each variant is timed as
`iters` aggregations inside ONE lax.scan with a one-element data dependency
between iterations — per-call timing measures dispatch overhead and remote
result-cache hits, not device time (see bench.py).

Usage: python bench/kernel_sweep.py [--n 131072] [--deg 16] [--f 128]
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
    p.add_argument("--n", type=int, default=1 << 17)
    p.add_argument("--deg", type=int, default=16)
    p.add_argument("--f", type=int, default=128)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from hydragnn_tpu.ops import pallas_segment as ps

    N, F, ITERS = args.n, args.f, args.iters
    E = N * args.deg
    rng = np.random.RandomState(0)
    rd = jnp.asarray(np.sort(rng.randint(0, N, E)).astype(np.int32))
    m0 = jnp.asarray(rng.randn(E, F).astype(np.float32))
    ref = lambda m: jax.ops.segment_sum(m, rd, N, indices_are_sorted=True)

    def run(name, agg, check=True):
        @jax.jit
        def loop(m):
            def body(m, _):
                out = agg(m)
                return m.at[0, 0].add(out[0, 0] * np.float32(1e-30)), out[0, 0]
            return jax.lax.scan(body, m, None, length=ITERS)

        try:
            jax.block_until_ready(loop(m0 * np.float32(1.000001)))
            a2 = m0 * np.float32(1.000002)
            jax.block_until_ready(a2)
            t0 = time.perf_counter()
            out = loop(a2)
            float(jnp.sum(out[1]))  # force completion via host fetch
            dt = (time.perf_counter() - t0) / ITERS
            err = 0.0
            if check:
                o = agg(a2)
                err = float(
                    jnp.max(jnp.abs(o - ref(a2)))
                    / (jnp.max(jnp.abs(ref(a2))) + 1e-9)
                )
            bytes_ = E * F * 4 + N * F * 4 + E * 4
            print(f"{name:44s} {dt*1e3:7.2f} ms  {bytes_/dt/1e9:6.1f} GB/s"
                  f"  relerr {err:.1e}", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue sweep
            print(f"{name:44s} FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)

    cases = [
        ("calib: E*F elementwise stream",
         lambda m: m * np.float32(1.0000001)),
        ("xla segment_sum", ref),
        ("v1 R256 T1024 p3 (default)",
         lambda m: ps._segment_sum_csr_impl(m, rd, N)),
        ("v1 R256 T1024 p2",
         lambda m: ps._segment_sum_csr_impl(m, rd, N, passes=2)),
        ("v1 R256 T1024 p1",
         lambda m: ps._segment_sum_csr_impl(m, rd, N, passes=1)),
        ("v1 R512 T2048 p3",
         lambda m: ps._segment_sum_csr_impl(m, rd, N, row_block=512,
                                            edge_tile=2048)),
        ("v1 R128 T512 p3",
         lambda m: ps._segment_sum_csr_impl(m, rd, N, row_block=128,
                                            edge_tile=512)),
        ("v2 R1024 T2048 p3",
         lambda m: ps._segment_sum_csr_impl_v2(m, rd, N, row_block=1024,
                                               edge_tile=2048)),
        ("v2 R512 T1024 p3",
         lambda m: ps._segment_sum_csr_impl_v2(m, rd, N, row_block=512,
                                               edge_tile=1024)),
        ("v2 R1024 T2048 p1",
         lambda m: ps._segment_sum_csr_impl_v2(m, rd, N, row_block=1024,
                                               edge_tile=2048, passes=1)),
    ]
    for name, agg in cases:
        run(name, agg, check=(name != cases[0][0]))


if __name__ == "__main__":
    main()
