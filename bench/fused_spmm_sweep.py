"""Sweep fused-SpMM kernel configs on real TPU (scan-timed, best of 3)."""

import itertools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

G, NV, D, F = 1024, 128, 16, 128
N = G * NV
E = N * D
rng = np.random.RandomState(0)
gbase = np.repeat(np.arange(G, dtype=np.int64) * NV, NV * D)
receivers = (gbase + np.repeat(np.tile(np.arange(NV), G), D)).astype(np.int32)
senders = (gbase + rng.randint(0, NV, E)).astype(np.int32)
x = rng.randn(N, F).astype(np.float32)

dev = jax.devices()[0]
print("device:", dev.device_kind, flush=True)
xd = jax.device_put(jnp.asarray(x), dev)
sd = jax.device_put(jnp.asarray(senders), dev)
rd = jax.device_put(jnp.asarray(receivers), dev)
wd = jnp.ones((E,), jnp.float32)

import hydragnn_tpu.ops.pallas_spmm as pspmm
from hydragnn_tpu.ops.pallas_spmm import _spmm_fused_impl
from hydragnn_tpu.ops.pallas_segment import segment_sum_csr

ref = np.asarray(
    jax.ops.segment_sum(xd[sd], rd, N, indices_are_sorted=True)
)

iters = 20


def timeit(name, fn):
    @jax.jit
    def loop(v):
        def body(v, _):
            out = fn(v)
            return v + out * np.float32(1e-30), out[0, 0]
        return jax.lax.scan(body, v, None, length=iters)

    try:
        out0 = fn(xd)
        err = float(np.max(np.abs(np.asarray(out0) - ref)))
        loop(xd)[0].block_until_ready()
        dt = float("inf")
        for trial in range(3):
            arg = xd * np.float32(1.0000001 + trial * 1e-7)
            jax.block_until_ready(arg)
            t0 = time.perf_counter()
            res = loop(arg)
            jax.block_until_ready(res)
            dt = min(dt, (time.perf_counter() - t0) / iters)
        print(
            f"  {name}: {dt*1e3:.2f} ms ({E/dt/1e6:.0f} Medges/s) err={err:.1e}",
            flush=True,
        )
    except Exception as exc:  # noqa: BLE001
        print(f"  {name}: FAILED {type(exc).__name__}: {exc}", flush=True)


configs = []
for tup in sys.argv[1:]:
    f = list(map(int, tup.split(",")))
    w, t, r, rs = f[:4]
    ap = f[4] if len(f) > 4 else 2  # a_passes (1 exact for masks, mult<256)
    xp = f[5] if len(f) > 5 else 3  # x_passes (3 = exact fp32)
    i8 = f[6] if len(f) > 6 else 0  # int8 A-build (masks/unit weights only)
    configs.append((w, t, r, rs, ap, xp, i8))
if not configs:
    # baselines + default grid
    timeit("xla gather+segment", lambda v: jax.ops.segment_sum(
        v[sd], rd, N, indices_are_sorted=True))
    timeit("unfused gather + csr_v2 kernel",
           lambda v: segment_sum_csr(v[sd], rd, N))
    configs = [
        (256, 2048, 1024, 64, 2, 3, 0),
        (192, 2048, 1024, 64, 2, 3, 0),
        (192, 1024, 1024, 64, 2, 3, 0),
        (160, 1024, 1024, 64, 2, 3, 0),
        (192, 1024, 1024, 128, 2, 3, 0),
        (256, 2048, 512, 64, 2, 3, 0),
    ]

for w, t, r, rs, ap, xp, i8 in configs:
    timeit(
        f"fused W={w} T={t} RB={r} RS={rs} AP={ap} XP={xp} I8={i8}",
        lambda v, w=w, t=t, r=r, rs=rs, ap=ap, xp=xp, i8=i8: _spmm_fused_impl(
            v, sd, rd, wd, N, row_block=r, edge_tile=t, window=w,
            x_passes=xp, a_passes=ap, r_sub=rs, a_int8=bool(i8),
        ),
    )
