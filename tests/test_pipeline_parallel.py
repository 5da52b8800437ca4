"""Pipeline parallelism: GPipe microbatch schedule over a 'pipe' mesh axis
equals sequential layer application, forward and backward."""

import numpy as np
import jax
import jax.numpy as jnp

from hydragnn_tpu.graph import GraphSample, collate
from hydragnn_tpu.models.gin import GINConv
from hydragnn_tpu.parallel.pipeline import (
    make_pipelined_apply,
    setup_pipe_mesh,
    shard_pipeline_params,
    stack_layer_params,
)
from hydragnn_tpu.train.trainer import stack_batches


def _micro_batches(m, n_graphs=2, n=10, deg=4, seed=0):
    rng = np.random.RandomState(seed)
    batches, xs = [], []
    for _ in range(m):
        samples = []
        for _ in range(n_graphs):
            senders, receivers = [], []
            for i in range(n):
                nb = rng.choice([j for j in range(n) if j != i], deg,
                                replace=False)
                senders.extend(nb)
                receivers.extend([i] * deg)
            samples.append(GraphSample(
                x=rng.randn(n, 1).astype(np.float32),
                pos=rng.randn(n, 3).astype(np.float32),
                edge_index=np.stack([senders, receivers]),
                y_graph=rng.randn(1).astype(np.float32),
            ))
        b = collate(samples, n_node_pad=n_graphs * n + 4,
                    n_edge_pad=n_graphs * n * deg + 8)
        batches.append(b)
        xs.append(rng.randn(n_graphs * n + 4, 16).astype(np.float32))
    return stack_batches(batches), jnp.asarray(np.stack(xs)), batches


def test_pipeline_matches_sequential():
    S, K, M = 4, 2, 6  # 4 stages x 2 layers, 6 microbatches
    L = S * K
    conv = GINConv(16, 16, eps_init=0.0)
    stacked_b, micro_x, batches = _micro_batches(M)

    keys = jax.random.split(jax.random.PRNGKey(0), L)
    params = [
        conv.init(k, micro_x[0], batches[0].pos, batches[0], {},
                  train=False)["params"]
        for k in keys
    ]

    def layer_fn(p, h, batch_t):
        out, _ = conv.apply({"params": p}, h, batch_t.pos, batch_t, {},
                            train=False)
        return out

    # sequential reference: every microbatch through all L layers
    seq = []
    for mb in range(M):
        h = micro_x[mb]
        for p in params:
            h = layer_fn(p, h, batches[mb])
        seq.append(h)
    seq = jnp.stack(seq)

    mesh = setup_pipe_mesh(S, jax.devices()[:S])
    stacked_p = shard_pipeline_params(
        stack_layer_params(params, S), mesh
    )
    pipe = make_pipelined_apply(layer_fn, mesh, S, M)
    out = pipe(stacked_p, micro_x, stacked_b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq),
                               rtol=1e-4, atol=5e-3)


def test_pipeline_backward_matches():
    S, K, M = 2, 1, 4
    L = S * K
    conv = GINConv(16, 16, eps_init=0.0)
    stacked_b, micro_x, batches = _micro_batches(M, seed=3)
    keys = jax.random.split(jax.random.PRNGKey(1), L)
    params = [
        conv.init(k, micro_x[0], batches[0].pos, batches[0], {},
                  train=False)["params"]
        for k in keys
    ]

    def layer_fn(p, h, batch_t):
        out, _ = conv.apply({"params": p}, h, batch_t.pos, batch_t, {},
                            train=False)
        return out

    def seq_loss(plist):
        tot = 0.0
        for mb in range(M):
            h = micro_x[mb]
            for p in plist:
                h = layer_fn(p, h, batches[mb])
            tot = tot + jnp.sum(h**2)
        return tot / M

    mesh = setup_pipe_mesh(S, jax.devices()[:S])
    pipe = make_pipelined_apply(layer_fn, mesh, S, M)

    def pipe_loss(plist):
        stacked_p = stack_layer_params(plist, S)
        out = pipe(stacked_p, micro_x, stacked_b)
        return jnp.mean(jnp.sum(out**2, axis=(1, 2))) * out.shape[0] / M

    g_seq = jax.grad(seq_loss)(params)
    g_pipe = jax.grad(pipe_loss)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_seq),
                    jax.tree_util.tree_leaves(g_pipe)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)
