"""Ablate the GATv2 attention path piecewise on real TPU sizes.

Times each stage of GATv2Conv (logits SDDMM, segment-max, exp+denom,
weighted aggregation) in isolation — fwd and fwd+bwd — to find where the
213 ms/step GAT train step goes. Same scan-timing discipline as bench.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *args, iters=8, trials=3):
    def step(x, _):
        out = fn(*((x,) + args[1:]))
        # scalar data dependency keeps the carry type while defeating DCE
        dep = jnp.sum(out) if not isinstance(out, tuple) else jnp.sum(out[0])
        return x + (dep * 1e-30).astype(x.dtype), None

    c = jax.jit(lambda a: jax.lax.scan(step, a, None, length=iters)[0])
    r = c(args[0])
    jax.block_until_ready(r)
    best = 1e9
    for _ in range(trials):
        t0 = time.perf_counter()
        jax.block_until_ready(c(args[0]))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    from hydragnn_tpu.ops.segment import segment_sum

    G, NV, D = 128, 64, 16
    N, E = G * NV, G * NV * D
    H, C = 6, 128
    rng = np.random.RandomState(0)
    recv = np.sort(rng.randint(0, N, E)).astype(np.int32)
    # graph-local senders
    send = (recv // NV) * NV + rng.randint(0, NV, E)
    send = send.astype(np.int32)
    perm = np.argsort(send).astype(np.int32)

    x = jnp.asarray(rng.randn(N, H * C).astype(np.float32))
    s = jnp.asarray(send)
    r = jnp.asarray(recv)
    permj = jnp.asarray(perm)
    alpha = jnp.asarray(rng.rand(E, H).astype(np.float32))
    logits = jnp.asarray(rng.randn(E, H).astype(np.float32))

    def grad_of(f):
        g = jax.grad(lambda x_: jnp.sum(f(x_)))
        return g

    # 1. two gathers (z = x_l[s] + x_r[r]) at [E, H*C]
    f_gather = lambda x_: x_[s] + x_[r]
    print(f"gather2 [E,{H*C}] fwd        {timed(f_gather, x):8.2f} ms")
    print(f"gather2 [E,{H*C}] fwd+bwd    {timed(grad_of(f_gather), x):8.2f} ms")

    # 2. segment_max over [E, H]
    f_smax = lambda l_: jax.ops.segment_max(l_, r, N, indices_are_sorted=True)
    print(f"segment_max [E,{H}]          {timed(f_smax, logits):8.2f} ms")

    # 3. exp + segment_sum denom [E, H]
    f_den = lambda l_: segment_sum(jnp.exp(l_), r, N)
    print(f"exp+segsum [E,{H}]           {timed(f_den, logits):8.2f} ms")
    print(f"exp+segsum [E,{H}] fwd+bwd   {timed(grad_of(f_den), logits):8.2f} ms")

    # 4. weighted aggregation: gather msgs + alpha* + segment_sum [E, H*C]
    def f_agg(x_):
        m = x_[s].reshape(E, H, C) * alpha[..., None]
        return segment_sum(m.reshape(E, H * C), r, N)
    print(f"agg [E,{H}x{C}] fwd          {timed(f_agg, x):8.2f} ms")
    print(f"agg [E,{H}x{C}] fwd+bwd      {timed(grad_of(f_agg), x):8.2f} ms")

    # 5. logits reduce: leaky_relu(z) * att, sum over C -> [E, H]
    att = jnp.asarray(rng.randn(1, H, C).astype(np.float32))
    def f_logit(x_):
        z = (x_[s] + x_[r]).reshape(E, H, C)
        return jnp.sum(jax.nn.leaky_relu(z, 0.05) * att, axis=-1)
    print(f"logits [E,{H}] fwd           {timed(f_logit, x):8.2f} ms")
    print(f"logits [E,{H}] fwd+bwd       {timed(grad_of(f_logit), x):8.2f} ms")


if __name__ == "__main__":
    main()
