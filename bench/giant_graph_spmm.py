"""A/B: fused SpMM with wide pinned windows vs unfused fallback on GIANT
single graphs (the case the collate window hint + RCM ordering unlocks).

Workloads: periodic lattices — 2D (Ising-style) and 3D (LSMS/supercell
style) — as ONE graph. Without RCM + wide windows these always took the
unfused gather+segment fallback; with them, `required_window` certifies a
512/1024 window and the fused adjacency-block kernel engages.

Usage:  python bench/giant_graph_spmm.py [--case 2d|3d]
Prints one JSON line per (case, path).
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def lattice_graph(dims, neighbors="vonneumann"):
    """Periodic lattice edge list in natural raster order."""
    nd = len(dims)
    n = int(np.prod(dims))
    idx = np.arange(n).reshape(dims)
    shifts = []
    for ax in range(nd):
        for d in (-1, 1):
            shifts.append(np.roll(idx, d, axis=ax))
    if neighbors == "moore":
        from itertools import product

        shifts = []
        for off in product((-1, 0, 1), repeat=nd):
            if any(off):
                s = idx
                for ax, d in enumerate(off):
                    if d:
                        s = np.roll(s, d, axis=ax)
                shifts.append(s)
    send = np.concatenate([s.ravel() for s in shifts])
    recv = np.tile(idx.ravel(), len(shifts))
    return np.stack([send, recv]).astype(np.int64), n


def run_case(name, dims, neighbors, iters=20):
    import jax
    import jax.numpy as jnp

    from hydragnn_tpu.data.ordering import rcm_order
    from hydragnn_tpu.ops.pallas_spmm import (
        _spmm_fused_impl,
        required_window,
    )
    from hydragnn_tpu.ops.pallas_segment import segment_sum_auto

    ei, n = lattice_graph(dims, neighbors)
    perm = rcm_order(ei, n)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(n)
    ei = inv[ei]
    order = np.argsort(ei[1])
    send = ei[0][order].astype(np.int32)
    recv = ei[1][order].astype(np.int32)
    e = send.shape[0]
    w_req = required_window(send, n)
    print(f"# {name}: N={n} E={e} required_window={w_req}", file=sys.stderr)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, 128).astype(np.float32))
    sd, rd = jnp.asarray(send), jnp.asarray(recv)
    wd = jnp.ones((e,), jnp.float32)

    paths = {}
    if w_req > 0:
        paths["fused_pinned"] = lambda v: _spmm_fused_impl(
            v, sd, rd, wd, n, window=(w_req,), a_passes=1, a_int8=True
        )
    paths["unfused"] = lambda v: segment_sum_auto(
        v[sd] * wd[:, None], rd, n
    )
    paths["xla"] = lambda v: jax.ops.segment_sum(
        v[sd], rd, n, indices_are_sorted=True
    )

    # correctness cross-check once
    outs = {k: np.asarray(fn(x)[:n]) for k, fn in paths.items()}
    for k, o in outs.items():
        np.testing.assert_allclose(o, outs["xla"], rtol=1e-5, atol=1e-4)

    for k, fn in paths.items():
        @jax.jit
        def loop(v, fn=fn):
            def body(v, _):
                out = fn(v)
                return v + out[: v.shape[0]] * np.float32(1e-30), out[0, 0]
            return jax.lax.scan(body, v, None, length=iters)

        jax.block_until_ready(loop(x))
        dt = float("inf")
        for t in range(3):
            arg = x * np.float32(1.0 + t * 1e-7)
            jax.block_until_ready(arg)
            t0 = time.perf_counter()
            jax.block_until_ready(loop(arg))
            dt = min(dt, (time.perf_counter() - t0) / iters)
        print(json.dumps({
            "case": name, "path": k, "ms": round(dt * 1e3, 3),
            "medges_per_s": round(e / dt / 1e6, 1),
            "required_window": int(w_req),
        }))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--case", default="all", choices=["2d", "3d", "all"])
    a = p.parse_args()
    if a.case in ("2d", "all"):
        # 362x362 periodic Ising-style lattice, Moore neighborhood (deg 8)
        run_case("2d_moore_131k", (362, 362), "moore")
    if a.case in ("3d", "all"):
        # 24^3 supercell, Moore neighborhood (deg 26) ~ LSMS alloy scale
        run_case("3d_moore_13k", (24, 24, 24), "moore")


if __name__ == "__main__":
    main()
