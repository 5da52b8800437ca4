"""DP shard_map step: numerical equality with single-device training on the
global batch (the DDP-correctness test; ref: CI mpirun 2-rank jobs)."""

import numpy as np
import jax
import optax
import pytest

from hydragnn_tpu.graph import GraphSample, collate
from hydragnn_tpu.models.arch import ArchConfig, BranchConfig
from hydragnn_tpu.models.create import create_model
from hydragnn_tpu.parallel.mesh import (
    ShardedGraphLoader,
    make_parallel_train_step,
    replicate_state,
    setup_mesh,
    shard_batch,
)
from hydragnn_tpu.train.trainer import init_state, make_train_step


def make_samples(n_graphs=16, n=8, deg=3, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n_graphs):
        senders, receivers = [], []
        for i in range(n):
            nb = rng.choice([j for j in range(n) if j != i], deg, replace=False)
            senders.extend(nb)
            receivers.extend([i] * deg)
        out.append(
            GraphSample(
                x=rng.randn(n, 1).astype(np.float32),
                pos=rng.randn(n, 3).astype(np.float32),
                edge_index=np.stack([senders, receivers]),
                y_graph=rng.randn(1).astype(np.float32),
            )
        )
    return out


def test_dp_step_grad_matches_mean_of_local_grads():
    """pmean-of-local-gradients == mean of per-shard gradients computed
    independently (DDP semantics)."""
    D = 8
    mesh = setup_mesh("data", jax.devices()[:D])
    samples = make_samples(16)
    loader = ShardedGraphLoader(samples, batch_size=16, n_shards=D)
    stacked = next(iter(loader))

    cfg = ArchConfig(
        mpnn_type="SAGE",
        input_dim=1,
        hidden_dim=8,
        output_dim=(1,),
        output_type=("graph",),
        graph_branches=(BranchConfig("branch-0", 1, 8, 1, (8,)),),
        node_branches=(),
        num_conv_layers=2,
        num_nodes=8,
    )
    model = create_model(cfg)
    opt = optax.inject_hyperparams(
        lambda learning_rate: optax.sgd(learning_rate)
    )(learning_rate=0.1)

    local0 = jax.tree_util.tree_map(lambda a: a[0], stacked)
    state = init_state(model, local0, opt)
    params0 = jax.device_get(state.params)

    # parallel step
    pstate = replicate_state(jax.device_get(state), mesh)
    pstep = make_parallel_train_step(model, cfg, opt, mesh)
    pstate, ploss, _ = pstep(pstate, shard_batch(stacked, mesh),
                             jax.random.PRNGKey(0))

    # sequential reference: per-shard grads averaged by hand (SGD: delta is
    # linear, so averaging the resulting deltas is equivalent)
    step = make_train_step(model, cfg, opt)
    deltas = None
    losses = []
    for k in range(D):
        local = jax.tree_util.tree_map(lambda a, k=k: a[k], stacked)
        s = init_state(model, local, opt)
        s = s.replace(params=jax.device_get(params0))
        # match the per-device rng: fold_in(axis_index) then fold_in(step)
        rng_k = jax.random.fold_in(jax.random.PRNGKey(0), k)
        s2, loss, _ = step(s, local, rng_k)
        losses.append(float(loss))
        d = jax.tree_util.tree_map(
            lambda new, old: np.asarray(new) - np.asarray(old),
            s2.params, params0,
        )
        deltas = d if deltas is None else jax.tree_util.tree_map(
            lambda a, b: a + b, deltas, d
        )
    mean_delta = jax.tree_util.tree_map(lambda a: a / D, deltas)
    expect = jax.tree_util.tree_map(
        lambda p0, d: np.asarray(p0) + d, params0, mean_delta
    )
    np.testing.assert_allclose(float(ploss), np.mean(losses), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(pstate.params),
        jax.tree_util.tree_leaves(expect),
    ):
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-4, atol=1e-6)
