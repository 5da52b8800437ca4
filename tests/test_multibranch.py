"""Multi-dataset multi-branch training (ref: examples/multibranch/train.py +
MultiTaskModelMP): branch-specific heads learn branch-specific targets."""

import numpy as np
import jax
import pytest

from hydragnn_tpu.graph import GraphSample
from hydragnn_tpu.parallel.multibranch import MultiDatasetLoader, tag_dataset_ids
from hydragnn_tpu.models.arch import ArchConfig, BranchConfig
from hydragnn_tpu.models.create import create_model
from hydragnn_tpu.train.trainer import (
    init_state,
    make_eval_step,
    make_train_step,
)
from hydragnn_tpu.train.optimizer import select_optimizer


def make_branch_dataset(n, scale, seed):
    """Graph target = scale * mean(x): each branch needs a different map."""
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        nn_ = 6
        x = rng.rand(nn_, 1).astype(np.float32)
        senders, receivers = [], []
        for i in range(nn_):
            for j in range(nn_):
                if i != j:
                    senders.append(j)
                    receivers.append(i)
        out.append(
            GraphSample(
                x=x,
                pos=rng.randn(nn_, 3).astype(np.float32),
                edge_index=np.stack([senders, receivers]),
                y_graph=np.asarray([scale * x.mean()], np.float32),
            )
        )
    return out


def test_multibranch_loader_proportions():
    d0 = make_branch_dataset(60, 1.0, 0)
    d1 = make_branch_dataset(20, -2.0, 1)
    loader = MultiDatasetLoader([d0, d1], batch_size=8, seed=0)
    batch = next(iter(loader))
    ids = np.asarray(batch.dataset_id)[np.asarray(batch.graph_mask)]
    assert (ids == 0).sum() == 6 and (ids == 1).sum() == 2


def test_multibranch_training_learns_both():
    d0 = make_branch_dataset(80, 1.0, 0)
    d1 = make_branch_dataset(80, -2.0, 1)
    loader = MultiDatasetLoader([d0, d1], batch_size=16, seed=0)

    branches = (
        BranchConfig("branch-0", 1, 8, 1, (8,)),
        BranchConfig("branch-1", 1, 8, 1, (8,)),
    )
    cfg = ArchConfig(
        mpnn_type="GIN",
        input_dim=1,
        hidden_dim=8,
        output_dim=(1,),
        output_type=("graph",),
        graph_branches=branches,
        node_branches=(),
        num_conv_layers=2,
        num_nodes=6,
    )
    model = create_model(cfg)
    opt = select_optimizer({"Optimizer": {"type": "Adam",
                                          "learning_rate": 0.01}})
    state = init_state(model, next(iter(loader)), opt)
    train_step = make_train_step(model, cfg, opt)
    rng = jax.random.PRNGKey(0)
    first = None
    for epoch in range(60):
        loader.set_epoch(epoch)
        for batch in loader:
            state, loss, _ = train_step(state, batch, rng)
            if first is None:
                first = float(loss)
    assert float(loss) < first * 0.1, (first, float(loss))

    # per-branch predictions: same input graph must map differently by branch
    eval_step = make_eval_step(model, cfg)
    batch = next(iter(loader))
    _, _, pred = eval_step(state, batch)
    p = np.asarray(pred[0])
    t = np.asarray(batch.graph_y)
    m = np.asarray(batch.graph_mask)
    err = np.abs(p[m] - t[m]).mean()
    assert err < 0.2, err


def test_branch_parallel_step_matches_reference_semantics():
    """shard_map branch-group step (encoder grads averaged over WORLD,
    branch-k decoder grads averaged over group k) == manually computed
    per-device gradients combined with those semantics. Proportional
    groups: branch 0 gets 6 devices, branch 1 gets 2."""
    import optax
    from jax.sharding import Mesh

    from hydragnn_tpu.graph import collate
    from hydragnn_tpu.parallel.multibranch import (
        branch_of_param,
        make_branch_parallel_train_step,
        stack_device_batches,
        tag_dataset_ids,
    )
    from hydragnn_tpu.train.trainer import make_loss_fn

    d0 = tag_dataset_ids([make_branch_dataset(24, 1.0, 0)])
    d1 = tag_dataset_ids([[], make_branch_dataset(8, -2.0, 1)])
    branch_sizes = (6, 2)
    # device d gets 4 graphs of its own branch's dataset
    dev_batches = []
    pads = dict(n_node_pad=64, n_edge_pad=256, n_graph_pad=5)
    for d in range(6):
        dev_batches.append(collate(d0[d * 4 : (d + 1) * 4], **pads))
    for d in range(2):
        dev_batches.append(collate(d1[d * 4 : (d + 1) * 4], **pads))

    branches = (
        BranchConfig("branch-0", 1, 8, 1, (8,)),
        BranchConfig("branch-1", 1, 8, 1, (8,)),
    )
    cfg = ArchConfig(
        mpnn_type="GIN", input_dim=1, hidden_dim=8, output_dim=(1,),
        output_type=("graph",), graph_branches=branches, node_branches=(),
        num_conv_layers=2, num_nodes=6,
    )
    model = create_model(cfg)
    opt = select_optimizer({"Optimizer": {"type": "SGD",
                                          "learning_rate": 0.05}})
    state = init_state(model, dev_batches[0], opt)

    mesh = Mesh(np.array(jax.devices()[:8]), ("branch",))
    step = make_branch_parallel_train_step(
        model, cfg, opt, mesh, branch_sizes
    )
    stacked = stack_device_batches(dev_batches)
    key = jax.random.PRNGKey(0)
    s1, loss1, _ = step(state, stacked, key)

    # reference: per-device grads via the plain loss_fn, combined manually
    loss_fn = make_loss_fn(model, cfg, False)
    rng0 = jax.random.fold_in(key, int(state.step))
    per_dev = []
    losses = []
    for d, b in enumerate(dev_batches):
        rng = jax.random.fold_in(rng0, d)
        (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, b, rng, True
        )
        per_dev.append(g)
        losses.append(float(l))

    def combine(path, *gs):
        b = branch_of_param(path)
        if b is None:
            return sum(gs) / len(gs)  # encoder: mean over WORLD
        lo = sum(branch_sizes[:b])
        grp = gs[lo : lo + branch_sizes[b]]
        return sum(grp) / len(grp)  # decoder: mean over the branch group

    g_ref = jax.tree_util.tree_map_with_path(combine, *per_dev)
    want_params = optax.apply_updates(
        state.params, opt.update(g_ref, state.opt_state, state.params)[0]
    )

    np.testing.assert_allclose(float(loss1), np.mean(losses), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(want_params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )
