"""BCSR giant-graph kernel variant sweep (round-4: drive toward the ~0.9 ms
compute floor, VERDICT r3 item 4).

Hypotheses probed on the 131k-node / 1.05M-edge RCM-ordered 2D Moore
lattice:
  - packed bit-plane tiles trade HBM (17 MB vs 134 MB/layer) for a VPU
    unpack that may dominate at bf16 arithmetic intensity -> A/B pack
  - CHUNK (sender columns/tile) trades tile count (per-tile control + DMA
    overhead) against band overfetch -> 128/256/512
  - the x-chunk RING cache only applies to the single-feature-tile path

Usage: python bench/bcsr_sweep.py [--iters 30]
One JSON line per variant.
"""

import argparse
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from giant_graph_spmm import lattice_graph  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--dims", type=int, default=362)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from hydragnn_tpu.data.ordering import rcm_order
    from hydragnn_tpu.ops.bcsr import build_bcsr, bcsr_matmul

    ei, n = lattice_graph((args.dims, args.dims), "moore")
    perm = rcm_order(ei, n)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(n)
    ei = inv[ei]
    order = np.argsort(ei[1])
    send, recv = ei[0][order], ei[1][order]
    e = send.shape[0]

    rng = np.random.RandomState(0)
    x32 = jnp.asarray(rng.randn(n, 128).astype(np.float32))
    x16 = x32.astype(jnp.bfloat16)

    ref = None
    configs = [
        (512, True, 512),
        (1024, True, 512), (1024, True, 1024),
        (2048, True, 512),
    ]
    for chunk, pack, block in configs:
            # band=False: this sweep probes the grid-aligned tile variants
            # (the band-aligned BandDir path would ignore chunk/pack knobs)
            bc = build_bcsr(send, recv, None, n, block=block, chunk=chunk,
                            pack=pack, band=False)
            if bc is None:
                print(json.dumps({"chunk": chunk, "pack": pack,
                                  "block": block,
                                  "skipped": "build rejected"}))
                continue
            d = bc.fwd
            tiles = int(d.a.shape[0])
            tile_mb = d.a.size / 1e6
            for label, x, passes in (
                ("bf16x1", x16, 1), ("fp32x2", x32, 2)
            ):
                # tiles must be jit ARGUMENTS: closed-over device arrays
                # become embedded constants and overflow the remote-compile
                # payload (HTTP 413) for dense tile sets
                @functools.partial(jax.jit, static_argnums=(2,))
                def loop(v, dd, p):
                    def body(v, _):
                        out = bcsr_matmul(dd, v, p)[: v.shape[0]]
                        # 1-element in-place chain (see bench.py note)
                        v = jax.lax.dynamic_update_slice(
                            v, (v[:1, :1].astype(jnp.float32)
                                + out[:1, :1].astype(jnp.float32)
                                * np.float32(1e-38)).astype(v.dtype),
                            (0, 0),
                        )
                        return v, out[0, 0]

                    return jax.lax.scan(body, v, None, length=args.iters)

                r = loop(x, d, passes)
                out0 = float(np.asarray(r[1])[0])
                if ref is None and label == "fp32x2":
                    ref = out0
                elif label == "fp32x2" and ref is not None:
                    assert abs(out0 - ref) < 1e-3 + 1e-4 * abs(ref), (
                        chunk, pack, out0, ref
                    )
                dts = []
                for t in range(3):
                    arg = (x32 * np.float32(1.0 + (t + 1) * 1e-7)).astype(
                        x.dtype
                    )
                    jax.block_until_ready(arg)
                    t0 = time.perf_counter()
                    r = loop(arg, d, passes)
                    float(np.asarray(r[1])[-1])
                    dts.append((time.perf_counter() - t0) / args.iters)
                dt = min(dts)
                print(json.dumps({
                    "chunk": chunk, "pack": pack, "block": block,
                    "dtype": label,
                    "tiles": tiles, "tile_mb": round(tile_mb, 1),
                    "ms": round(dt * 1e3, 3),
                    "medges_per_s": round(e / dt / 1e6, 1),
                    "trial_ms": [round(d_ * 1e3, 3) for d_ in dts],
                }), flush=True)


if __name__ == "__main__":
    main()
