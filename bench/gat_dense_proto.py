"""Prototype: dense per-graph GATv2 attention for slotted batches.

Measures the dense formulation (pair logits as a fused broadcast-reduce,
dense softmax with adjacency-multiplicity exp weights, aggregation as a
batched MXU matmul) against the current edgewise path, stage by stage and
end-to-end, fwd and fwd+bwd. Same scan-timing discipline as bench.py.
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
    G, S, H, C = 128, 64, 6, 128
    deg = 16
    N, E = G * S, G * S * deg
    slope = 0.05
    rng = np.random.RandomState(0)

    # graph-local edges, receiver-sorted
    recv = np.repeat(np.arange(N, dtype=np.int64), deg)
    send = (recv // S) * S + rng.randint(0, S, E)
    A = np.zeros((G, S, S), np.float32)
    np.add.at(A, (recv // S, recv % S, send % S), 1.0)

    xl = jnp.asarray(rng.randn(N, H * C).astype(np.float32))
    xr = jnp.asarray(rng.randn(N, H * C).astype(np.float32))
    att = jnp.asarray(rng.randn(H, C).astype(np.float32))
    s = jnp.asarray(send)
    r = jnp.asarray(recv)
    Aj = jnp.asarray(A)

    def grad_of(f):
        return jax.grad(lambda x_: jnp.sum(f(x_)))

    # ---- edgewise logits (current path) ----
    def f_edge_logits(xl_):
        z = (xl_[s] + xr[r]).reshape(E, H, C)
        return jnp.sum(jax.nn.leaky_relu(z, slope) * att, axis=-1)

    print(f"edgewise logits fwd       {timed(f_edge_logits, xl):8.2f} ms")
    print(f"edgewise logits fwd+bwd   {timed(grad_of(f_edge_logits), xl):8.2f} ms")

    # ---- dense pair logits: [G,H,S,S] via broadcast-reduce ----
    def f_dense_logits(xl_):
        xl4 = xl_.reshape(G, S, H, C)
        xr4 = xr.reshape(G, S, H, C)
        z = xr4[:, :, None] + xl4[:, None, :, :]  # [G,i,j,H,C]
        return jnp.einsum("gijhc,hc->ghij", jax.nn.leaky_relu(z, slope), att,
                          precision=jax.lax.Precision.HIGHEST)

    print(f"dense logits fwd          {timed(f_dense_logits, xl):8.2f} ms")
    print(f"dense logits fwd+bwd      {timed(grad_of(f_dense_logits), xl):8.2f} ms")

    # ---- dense softmax + matmul aggregation end-to-end ----
    def f_dense_full(xl_):
        xl4 = xl_.reshape(G, S, H, C)
        xr4 = xr.reshape(G, S, H, C)
        z = xr4[:, :, None] + xl4[:, None, :, :]
        logits = jnp.einsum("gijhc,hc->ghij", jax.nn.leaky_relu(z, slope), att,
                            precision=jax.lax.Precision.HIGHEST)
        W = (Aj + jnp.eye(S, dtype=Aj.dtype))[:, None]  # self-loop weight
        neg = jnp.finfo(jnp.float32).min
        m = jnp.max(jnp.where(W > 0, logits, neg), axis=-1, keepdims=True)
        ex = W * jnp.exp(logits - m)
        alpha = ex / jnp.maximum(jnp.sum(ex, axis=-1, keepdims=True), 1e-16)
        out = jnp.einsum("ghij,gjhc->gihc", alpha, xl4,
                         precision=jax.lax.Precision.HIGHEST)
        return out.reshape(N, H * C)

    print(f"dense FULL fwd            {timed(f_dense_full, xl):8.2f} ms")
    print(f"dense FULL fwd+bwd        {timed(grad_of(f_dense_full), xl):8.2f} ms")

    # ---- edgewise full (current path, incl. self loops) ----
    from hydragnn_tpu.ops.segment import segment_sum

    def f_edge_full(xl_):
        xl3 = xl_.reshape(N, H, C)
        xr3 = xr.reshape(N, H, C)
        z = (xl3[s] + xr3[r])
        logits = jnp.sum(jax.nn.leaky_relu(z, slope) * att, axis=-1)
        z_self = jax.nn.leaky_relu(xl3 + xr3, slope)
        logits_self = jnp.sum(z_self * att, axis=-1)
        m_edges = jax.ops.segment_max(logits, r, N, indices_are_sorted=True)
        m = jnp.maximum(m_edges, logits_self)
        m = jnp.where(jnp.isfinite(m), m, 0.0)
        exp_e = jnp.exp(logits - m[r])
        exp_s = jnp.exp(logits_self - m)
        denom = segment_sum(exp_e, r, N) + exp_s
        alpha_e = exp_e / jnp.maximum(denom[r], 1e-16)
        alpha_s = exp_s / jnp.maximum(denom, 1e-16)
        msgs = (alpha_e[..., None] * xl3[s]).reshape(E, H * C)
        out = segment_sum(msgs, r, N).reshape(N, H, C)
        return (out + alpha_s[..., None] * xl3).reshape(N, H * C)

    print(f"edge FULL fwd             {timed(f_edge_full, xl):8.2f} ms")
    print(f"edge FULL fwd+bwd         {timed(grad_of(f_edge_full), xl):8.2f} ms")

    # numerical parity dense vs edgewise
    od = np.asarray(f_dense_full(xl))
    oe = np.asarray(f_edge_full(xl))
    err = np.abs(od - oe).max() / (np.abs(oe).max() + 1e-9)
    print(f"dense vs edgewise rel err: {err:.2e}")


if __name__ == "__main__":
    main()
