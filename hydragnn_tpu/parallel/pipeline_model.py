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
flagship EGNN included). Norm-carrying stacks (the CI-default PNA's
MaskedBatchNorm) are staged too: per-layer running statistics are
per-layer pytrees, so they stack [S, k] alongside the params
(``split_conv_state``) and each stage applies its norm in eval mode
(running statistics are not UPDATED inside the pipeline — the sequential
definition this must equal runs eval-mode norms as well). GPS-wrapped
stacks are staged as full GPSConv layers (local conv + per-graph global
attention + FFN; the wrapped conv's params are the sibling ``conv_{i}``
tree, its norm1-3 running stats ride the stacked pytree). MACE (per-layer
decoders need every stage's output) is out of scope and raises.

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


def pipeline_prefix(cfg: ArchConfig) -> str:
    """Layer-param prefix staged by the pipeline: GPS-wrapped stacks name
    their conv layers ``gps_{i}`` (models/base.py setup), plain stacks
    ``conv_{i}``."""
    return (
        "gps_"
        if cfg.use_global_attn and cfg.global_attn_engine == "GPS"
        else "conv_"
    )


def _conv_layer_names(params: Dict[str, Any], prefix: str = "conv_"):
    names = sorted(
        (k for k in params if k.startswith(prefix)),
        key=lambda s: int(s.split("_")[-1]),
    )
    return names


def split_conv_state(
    params: Dict[str, Any],
    batch_stats: Optional[Dict[str, Any]],
    n_stages: int,
    prefix: str = "conv_",
):
    """Full flax state -> (outer_params, outer_stats, stacked).

    ``outer`` keeps everything but conv/norm layers 1..L-1; ``stacked``
    carries those with leading [S, k] dims for the pipe axis — including
    each staged norm's running statistics ({"stats": {mean, var}}), which
    are per-layer pytrees exactly like the params. L-1 must be divisible
    by n_stages."""
    params = dict(params)
    batch_stats = dict(batch_stats) if batch_stats else {}
    names = _conv_layer_names(params, prefix)
    pipe_names = names[1:]
    assert len(pipe_names) % n_stages == 0, (
        f"{len(pipe_names)} pipelined layers not divisible by "
        f"{n_stages} stages"
    )
    layers = []
    for nm in pipe_names:
        i = int(nm.split("_")[-1])
        if prefix == "gps_":
            # a GPS layer is TWO sibling param trees: gps_{i} (attention +
            # FFN + norm1-3) and conv_{i} (the wrapped local conv, bound
            # to the stack in base.setup before wrapping)
            layer = {
                "gps": params.pop(nm),
                "conv": params.pop(f"conv_{i}"),
            }
            if nm in batch_stats:
                layer["gps_stats"] = batch_stats.pop(nm)
            if f"conv_{i}" in batch_stats:
                layer["conv_inner_stats"] = batch_stats.pop(f"conv_{i}")
        else:
            layer = {"conv": params.pop(nm)}
        norm_nm = f"norm_{i}"
        if norm_nm in params:
            layer["norm"] = params.pop(norm_nm)
        if norm_nm in batch_stats:
            layer["stats"] = batch_stats.pop(norm_nm)
        layers.append(layer)
    stacked = stack_layer_params(layers, n_stages)
    return params, batch_stats, stacked


def split_conv_params(params: Dict[str, Any], n_stages: int,
                      prefix: str = "conv_"):
    """Params-only convenience wrapper of ``split_conv_state``."""
    outer, _, stacked = split_conv_state(params, None, n_stages, prefix)
    return outer, stacked


def merge_conv_params(outer: Dict[str, Any], stacked) -> Dict[str, Any]:
    """Inverse of split_conv_params (for checkpoints / comparisons).

    No prefix argument: GPS layers are detected by the "gps" key in the
    stacked layer dict, and the reconstructed names are always conv_{i} /
    gps_{i} / norm_{i} regardless of which prefix selected the layers."""
    full = dict(outer)
    leaves = jax.tree_util.tree_leaves(stacked)
    S, k = leaves[0].shape[:2]
    for s in range(S):
        for j in range(k):
            layer = jax.tree_util.tree_map(lambda a: a[s, j], stacked)
            i = 1 + s * k + j
            full[f"conv_{i}"] = layer["conv"]
            if "gps" in layer:
                full[f"gps_{i}"] = layer["gps"]
            if "norm" in layer:
                full[f"norm_{i}"] = layer["norm"]
    return full


def merge_conv_state(outer, outer_stats, stacked):
    """Inverse of split_conv_state -> (params, batch_stats).
    merge_conv_params only reads the "conv"/"gps"/"norm" entries, so the
    staged "stats"/"gps_stats"/"conv_inner_stats" are re-homed into the
    batch_stats tree here."""
    params = merge_conv_params(outer, stacked)
    stats = dict(outer_stats) if outer_stats else {}
    leaves = jax.tree_util.tree_leaves(stacked)
    S, k = leaves[0].shape[:2]
    for s in range(S):
        for j in range(k):
            layer = jax.tree_util.tree_map(lambda a: a[s, j], stacked)
            if "stats" in layer:
                stats[f"norm_{1 + s * k + j}"] = layer["stats"]
            if "gps_stats" in layer:
                stats[f"gps_{1 + s * k + j}"] = layer["gps_stats"]
            if "conv_inner_stats" in layer:
                stats[f"conv_{1 + s * k + j}"] = layer["conv_inner_stats"]
    return params, stats


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
    if cfg.mpnn_type == "MACE":
        # per-layer decoder outputs ride the pipeline as pytree
        # activations — dedicated builder (plain MACE; the GPS-wrapped
        # variant remains out of scope)
        return make_pipelined_mace_loss(
            model, cfg, mesh, n_stages, n_micro, axis=axis
        )

    # build a standalone conv module with the stack's own get_conv; a
    # non-module shim carries cfg so flax does not try to register the
    # template as a child of the (unbound) model
    import types as _types

    shim = _types.SimpleNamespace(cfg=cfg)
    is_gps = cfg.use_global_attn and cfg.global_attn_engine == "GPS"
    conv_template = type(model).get_conv(
        shim, cfg.hidden_dim, cfg.hidden_dim,
        edge_dim=(
            cfg.hidden_dim if cfg.use_global_attn else cfg.edge_dim
        ),
        # match split_conv_state's canonical inner-conv scope name
        name="conv" if is_gps else None,
    )
    if is_gps:
        # mirror models/base.py setup: each staged layer is the full
        # GPSConv (local conv + global attention + FFN, norm1-3 running
        # stats riding the stacked pytree as "conv_stats")
        from hydragnn_tpu.models.gps import GPSConv

        conv_template = GPSConv(
            channels=cfg.hidden_dim,
            conv=conv_template,
            heads=cfg.global_attn_heads,
            dropout=cfg.dropout,
            attn_type=cfg.global_attn_type or "multihead",
        )

    from hydragnn_tpu.models.layers import (
        MaskedBatchNorm,
        activation_function_selection,
    )

    act = activation_function_selection(cfg.activation)
    norm_template = MaskedBatchNorm()

    def layer_fn(p, h, bundle):
        mb, ctx, equiv = bundle
        if "gps" in p:
            # GPSConv template: attention/FFN/norm1-3 params from gps_{i},
            # the wrapped conv's params grafted in under its "conv" scope
            variables = {"params": dict(p["gps"], conv=p["conv"])}
            bs = dict(p.get("gps_stats", {}))
            if "conv_inner_stats" in p:
                bs["conv"] = p["conv_inner_stats"]
            if bs:
                variables["batch_stats"] = bs
        else:
            variables = {"params": p["conv"]}
        out, _ = conv_template.apply(
            variables, h, equiv, mb, ctx, train=False
        )
        if "norm" in p:
            # staged MaskedBatchNorm in eval mode: params [scale, bias]
            # and running stats both ride the [S, k] stacked pytree
            out = norm_template.apply(
                {"params": p["norm"],
                 "batch_stats": p.get("stats", {})},
                out, mb.node_mask, use_running_average=True,
            )
        return act(out)

    pipe = make_pipelined_apply(layer_fn, mesh, n_stages, n_micro, axis=axis)

    def loss_fn(outer, stacked, micro_batches, outer_stats=None):
        M = n_micro
        variables = {"params": outer}
        if outer_stats:
            variables["batch_stats"] = outer_stats
        # ---- replicated prologue: embedding + conv layer 0 per microbatch
        xs, ctxs, equivs, mbs = [], [], [], []
        for m in range(M):
            mb = jax.tree_util.tree_map(
                lambda a: a[m] if hasattr(a, "ndim") and a.ndim else a,
                micro_batches,
            )
            inv, equiv, ctx = model.apply(
                variables, mb, method="embed_and_first_layer"
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
                variables, outs[m], equivs[m], mb, ctxs[m],
                method="decode",
            )
            loss, _ = compute_loss(cfg, pred, mb)
            losses.append(loss)
        return jnp.mean(jnp.stack(losses))

    return loss_fn


def split_mace_state(params: Dict[str, Any], n_stages: int):
    """MACE staging split: conv layers 1..L-2 (hidden -> hidden, shape-
    homogeneous) are stacked [S, k] TOGETHER with their per-layer decoders
    (decoder_{i+1}); layer 0 (scalar input), layer L-1 (scalar output,
    different shapes), decoder_0/1/L, and the embedding stay outer.
    Requires L - 2 divisible by n_stages."""
    params = dict(params)
    names = _conv_layer_names(params, "conv_")
    L = len(names)
    assert L >= 3, "MACE pipeline staging needs >= 3 conv layers"
    pipe_idx = list(range(1, L - 1))
    assert len(pipe_idx) % n_stages == 0, (
        f"{len(pipe_idx)} staged MACE layers not divisible by "
        f"{n_stages} stages"
    )
    layers = []
    for i in pipe_idx:
        layer = {
            "conv": params.pop(f"conv_{i}"),
            "dec": params.pop(f"decoder_{i + 1}"),
        }
        layers.append(layer)
    return params, stack_layer_params(layers, n_stages)


def merge_mace_state(outer: Dict[str, Any], stacked) -> Dict[str, Any]:
    """Inverse of split_mace_state."""
    full = dict(outer)
    leaves = jax.tree_util.tree_leaves(stacked)
    S, k = leaves[0].shape[:2]
    for s in range(S):
        for j in range(k):
            layer = jax.tree_util.tree_map(lambda a: a[s, j], stacked)
            i = 1 + s * k + j
            full[f"conv_{i}"] = layer["conv"]
            full[f"decoder_{i + 1}"] = layer["dec"]
    return full


def make_pipelined_mace_loss(
    model: HydraBase,
    cfg: ArchConfig,
    mesh: Mesh,
    n_stages: int,
    n_micro: int,
    axis: str = "pipe",
) -> Callable:
    """MACE through the model pipeline. Unlike the homogeneous stacks, MACE
    sums a PER-LAYER decoder output into the heads (models/mace.py
    __call__; ref: MACEStack.forward accumulates multihead_decoders), so
    the pipeline activation is the pytree {inv, equiv, outs: (heads...)} —
    each staged layer applies its conv AND its decoder and adds into the
    accumulators riding the ICI ring. Prologue (embedding + layer 0 +
    decoder_0/1) and epilogue (layer L-1, scalar output irreps + nonlinear
    decoder_L) run replicated (models/mace.py mace_prologue/mace_epilogue)."""
    from hydragnn_tpu.models.mace import (
        Irreps,
        MaceConv,
        MultiheadDecoderBlock,
    )

    hidden_irreps = Irreps.uniform(cfg.hidden_dim, cfg.node_max_ell)
    interaction_irreps = Irreps(
        tuple((cfg.hidden_dim, l) for l in range(cfg.max_ell + 1))
    )
    sh_irreps = Irreps.spherical(cfg.max_ell)
    edge_attrs_irreps = (
        Irreps.scalars(cfg.edge_dim) + sh_irreps
        if (cfg.edge_dim or 0) > 0
        else sh_irreps
    )
    correlations = (list(cfg.correlation) if cfg.correlation else [2]) * (
        cfg.num_conv_layers
    )
    conv_template = MaceConv(
        node_feats_irreps=hidden_irreps,
        edge_attrs_irreps=edge_attrs_irreps,
        num_edge_feats=cfg.num_radial,
        interaction_irreps=interaction_irreps,
        hidden_irreps=hidden_irreps,
        output_irreps=hidden_irreps,
        avg_num_neighbors=float(cfg.avg_num_neighbors or 1.0),
        correlation=int(correlations[1]),
    )
    dec_template = MultiheadDecoderBlock(hidden_irreps, cfg, nonlinear=False)
    n_sc = cfg.hidden_dim

    def layer_fn(p, act, bundle):
        mb, ctx = bundle
        nf = jnp.concatenate([act["inv"], act["equiv"]], axis=-1)
        h = conv_template.apply(
            {"params": p["conv"]}, nf, mb, ctx["edge_attrs"],
            ctx["edge_feats"], ctx["node_onehot"],
        )
        out = dec_template.apply({"params": p["dec"]}, h, mb)
        return {
            "inv": h[:, :n_sc],
            "equiv": h[:, n_sc:],
            "outs": tuple(o + d for o, d in zip(act["outs"], out)),
        }

    pipe = make_pipelined_apply(layer_fn, mesh, n_stages, n_micro, axis=axis)

    def loss_fn(outer, stacked, micro_batches, outer_stats=None):
        M = n_micro
        variables = {"params": outer}
        acts, ctxs, mbs = [], [], []
        for m in range(M):
            mb = jax.tree_util.tree_map(
                lambda a: a[m] if hasattr(a, "ndim") and a.ndim else a,
                micro_batches,
            )
            inv, equiv, ctx, outs = model.apply(
                variables, mb, method="mace_prologue"
            )
            acts.append({"inv": inv, "equiv": equiv, "outs": outs})
            ctxs.append(ctx)
            mbs.append(mb)
        micro_act = jax.tree_util.tree_map(
            lambda *ls: jnp.stack(ls), *acts
        )
        bundle = jax.tree_util.tree_map(
            lambda *ls: (
                jnp.stack(ls) if hasattr(ls[0], "ndim") else ls[0]
            ),
            *[(mb, ctx) for mb, ctx in zip(mbs, ctxs)],
        )
        final = pipe(stacked, micro_act, bundle)
        losses = []
        for m in range(M):
            act_m = jax.tree_util.tree_map(lambda a: a[m], final)
            pred = model.apply(
                variables, act_m["inv"], act_m["equiv"],
                list(act_m["outs"]), mbs[m], ctxs[m],
                method="mace_epilogue",
            )
            loss, _ = compute_loss(cfg, pred, mbs[m])
            losses.append(loss)
        return jnp.mean(jnp.stack(losses))

    return loss_fn


def sequential_microbatch_loss(model, cfg, params, micro_batches, n_micro,
                               batch_stats=None):
    """The single-device definition the pipelined loss must equal: mean of
    per-microbatch trainer losses with the same (merged) params."""
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    losses = []
    for m in range(n_micro):
        mb = jax.tree_util.tree_map(
            lambda a: a[m] if hasattr(a, "ndim") and a.ndim else a,
            micro_batches,
        )
        pred = model.apply(variables, mb, train=False)
        loss, _ = compute_loss(cfg, pred, mb)
        losses.append(loss)
    return jnp.mean(jnp.stack(losses))
