"""Pipeline parallelism over the REAL HydraBase model.

Stages the model as: embedding + first conv layer + decoders REPLICATED
(they are one layer + small heads), conv layers 1..L-1 stacked [S, k] on
the ``pipe`` mesh axis and streamed GPipe-style (parallel/pipeline.py),
driven end-to-end through the trainer's loss (models/losses.compute_loss).
Reverse-mode through the scan + ppermute gives the backward pipeline
schedule automatically, so one ``jax.value_and_grad`` trains the staged
model.

Scope: homogeneous hidden->hidden conv stacks (every HydraBase subclass
whose ``_conv_plan`` repeats (hidden, hidden) after layer 0 — the GFM
flagship EGNN included). Per-layer norms ride along in eval mode
(running statistics are not updated inside the pipeline). GPS-wrapped
stacks and MACE (per-layer decoders) are out of scope and raise.

Beyond reference parity: the reference has no pipeline axis at all
(SURVEY.md §2.2 "NOT present").
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from hydragnn_tpu.models.arch import ArchConfig
from hydragnn_tpu.models.base import HydraBase
from hydragnn_tpu.models.losses import compute_loss
from hydragnn_tpu.parallel.pipeline import (
    make_pipelined_apply,
    stack_layer_params,
)


def _conv_layer_names(params: Dict[str, Any]):
    names = sorted(
        (k for k in params if k.startswith("conv_")),
        key=lambda s: int(s.split("_")[1]),
    )
    return names


def split_conv_params(params: Dict[str, Any], n_stages: int):
    """Full flax params -> (outer, stacked). ``outer`` keeps everything but
    conv/norm layers 1..L-1; ``stacked`` carries those with leading [S, k]
    dims for the pipe axis. L-1 must be divisible by n_stages."""
    params = dict(params)
    names = _conv_layer_names(params)
    pipe_names = names[1:]
    assert len(pipe_names) % n_stages == 0, (
        f"{len(pipe_names)} pipelined layers not divisible by "
        f"{n_stages} stages"
    )
    layers = []
    for nm in pipe_names:
        i = int(nm.split("_")[1])
        layer = {"conv": params.pop(nm)}
        norm_nm = f"norm_{i}"
        if norm_nm in params:
            layer["norm"] = params.pop(norm_nm)
        layers.append(layer)
    stacked = stack_layer_params(layers, n_stages)
    return params, stacked


def merge_conv_params(outer: Dict[str, Any], stacked) -> Dict[str, Any]:
    """Inverse of split_conv_params (for checkpoints / comparisons)."""
    full = dict(outer)
    leaves = jax.tree_util.tree_leaves(stacked)
    S, k = leaves[0].shape[:2]
    for s in range(S):
        for j in range(k):
            layer = jax.tree_util.tree_map(lambda a: a[s, j], stacked)
            i = 1 + s * k + j
            full[f"conv_{i}"] = layer["conv"]
            if "norm" in layer:
                full[f"norm_{i}"] = layer["norm"]
    return full


def make_pipelined_hydra_loss(
    model: HydraBase,
    cfg: ArchConfig,
    mesh: Mesh,
    n_stages: int,
    n_micro: int,
    axis: str = "pipe",
) -> Callable:
    """Returns ``loss_fn(outer, stacked, micro_batches) -> loss`` where
    ``micro_batches`` is a GraphBatch pytree with leading M on every leaf
    (trainer.stack_batches of M microbatches) and the loss is the mean of
    the trainer's per-microbatch losses (models/losses.compute_loss)."""
    if cfg.use_global_attn:
        raise NotImplementedError("pipeline staging does not cover GPS")
    if cfg.mpnn_type == "MACE":
        raise NotImplementedError(
            "MACE's per-layer decoders need every stage's output"
        )

    # build a standalone conv module with the stack's own get_conv; a
    # non-module shim carries cfg so flax does not try to register the
    # template as a child of the (unbound) model
    import types as _types

    shim = _types.SimpleNamespace(cfg=cfg)
    conv_template = type(model).get_conv(
        shim, cfg.hidden_dim, cfg.hidden_dim, edge_dim=cfg.edge_dim,
        name=None,
    )

    from hydragnn_tpu.models.layers import activation_function_selection

    act = activation_function_selection(cfg.activation)

    def layer_fn(p, h, bundle):
        mb, ctx, equiv = bundle
        if "norm" in p:
            raise NotImplementedError(
                "pipelined stacks with per-layer BatchNorm are not staged "
                "yet (running statistics live outside params); use a "
                "norm-free stack (SchNet/EGNN/PAINN-style)"
            )
        out, _ = conv_template.apply(
            {"params": p["conv"]}, h, equiv, mb, ctx, train=False
        )
        return act(out)

    pipe = make_pipelined_apply(layer_fn, mesh, n_stages, n_micro, axis=axis)

    def loss_fn(outer, stacked, micro_batches):
        M = n_micro
        # ---- replicated prologue: embedding + conv layer 0 per microbatch
        xs, ctxs, equivs, mbs = [], [], [], []
        for m in range(M):
            mb = jax.tree_util.tree_map(
                lambda a: a[m] if hasattr(a, "ndim") and a.ndim else a,
                micro_batches,
            )
            inv, equiv, ctx = model.apply(
                {"params": outer}, mb, method="embed_and_first_layer"
            )
            xs.append(inv)
            ctxs.append(ctx)
            equivs.append(equiv)
            mbs.append(mb)
        micro_x = jnp.stack(xs)
        bundle = jax.tree_util.tree_map(
            lambda *ls: (
                jnp.stack(ls) if hasattr(ls[0], "ndim") else ls[0]
            ),
            *[(mb, ctx, eq) for mb, ctx, eq in zip(mbs, ctxs, equivs)],
        )
        # ---- staged middle: conv layers 1..L-1 across the pipe axis
        outs = pipe(stacked, micro_x, bundle)
        # ---- replicated epilogue: decode + trainer loss per microbatch
        losses = []
        for m in range(M):
            mb = mbs[m]
            pred = model.apply(
                {"params": outer}, outs[m], equivs[m], mb, ctxs[m],
                method="decode",
            )
            loss, _ = compute_loss(cfg, pred, mb)
            losses.append(loss)
        return jnp.mean(jnp.stack(losses))

    return loss_fn


def sequential_microbatch_loss(model, cfg, params, micro_batches, n_micro):
    """The single-device definition the pipelined loss must equal: mean of
    per-microbatch trainer losses with the same (merged) params."""
    losses = []
    for m in range(n_micro):
        mb = jax.tree_util.tree_map(
            lambda a: a[m] if hasattr(a, "ndim") and a.ndim else a,
            micro_batches,
        )
        pred = model.apply({"params": params}, mb, train=False)
        loss, _ = compute_loss(cfg, pred, mb)
        losses.append(loss)
    return jnp.mean(jnp.stack(losses))
