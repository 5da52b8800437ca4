"""ZeRO-1 optimizer-state sharding: numerical equality + actual sharding."""

import numpy as np
import jax
from jax.sharding import NamedSharding

from tests.test_graph_parallel import big_batch
from hydragnn_tpu.models.arch import ArchConfig, BranchConfig
from hydragnn_tpu.models.create import create_model
from hydragnn_tpu.parallel.mesh import setup_mesh
from hydragnn_tpu.parallel.zero import make_zero_train_step, shard_state_zero
from hydragnn_tpu.train.optimizer import select_optimizer
from hydragnn_tpu.train.trainer import init_state, make_train_step


def test_zero_step_matches_and_shards():
    mesh = setup_mesh("data", jax.devices()[:8])
    batch = big_batch()
    cfg = ArchConfig(
        mpnn_type="GIN",
        input_dim=1,
        hidden_dim=16,
        output_dim=(1,),
        output_type=("graph",),
        graph_branches=(BranchConfig("branch-0", 1, 16, 1, (16,)),),
        node_branches=(),
        num_conv_layers=2,
        num_nodes=32,
    )
    model = create_model(cfg)
    # SGD+momentum: has first-dim-shardable state (trace) and updates are
    # linear in grads, so cross-layout reduction noise stays at fp32 scale
    import optax

    opt = optax.inject_hyperparams(
        lambda learning_rate: optax.sgd(learning_rate, momentum=0.9)
    )(learning_rate=0.01)
    state = init_state(model, batch, opt)
    ref_state = jax.device_get(state)

    step_plain = make_train_step(model, cfg, opt)
    s1, loss1, _ = step_plain(state, batch, jax.random.PRNGKey(0))

    zstate = shard_state_zero(ref_state, mesh)
    # mu/nu of a (16,16) kernel should be sharded over 8 devices
    sharded_leaves = [
        a for a in jax.tree_util.tree_leaves(zstate.opt_state)
        if hasattr(a, "sharding") and not a.sharding.is_fully_replicated
    ]
    assert len(sharded_leaves) > 0, "no optimizer-state arrays were sharded"

    step_zero = make_zero_train_step(model, cfg, opt, mesh)
    s2, loss2, _ = step_zero(zstate, batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s2.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )
