"""JSON config system, schema-compatible with the reference.

Mirrors ``hydragnn/utils/input_config_parsing/config_utils.py`` (ref: :25-160
``update_config`` defaulting pass, :221-260 output-dim inference from the first
data sample, :314 ``get_log_name_config``) so reference JSON configs run
unmodified. Differences (TPU-first):

  - output bookkeeping is resolved at collate time into dense per-head target
    arrays instead of dynamic ``y_loc`` index maps;
  - PNA degree histograms / MACE avg_num_neighbors are computed host-side with
    numpy over the dataset (no torch.distributed reduction needed per-host; a
    cross-host allreduce hook is provided in parallel.mesh).
"""

from __future__ import annotations

import copy
import json
import os
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from hydragnn_tpu.graph import GraphSample


def load_config(path: str) -> Dict[str, Any]:
    with open(path, "r") as f:
        return json.load(f)


def merge_config(base: Dict[str, Any], override: Dict[str, Any]) -> Dict[str, Any]:
    """Deep merge (ref: config_utils.py:380-388)."""
    out = copy.deepcopy(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge_config(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def save_config(config: Dict[str, Any], log_name: str, path: str = "./logs/") -> None:
    """Rank-0 config snapshot (ref: config_utils.py:352-358). Gated on
    process 0: in a real multi-process run every rank shares the log dir
    and concurrent writes to one config.json would race (caught by
    tests/test_multiprocess_real.py)."""
    import jax

    if jax.process_index() != 0:
        return
    fname = os.path.join(path, log_name, "config.json")
    os.makedirs(os.path.dirname(fname), exist_ok=True)
    with open(fname, "w") as f:
        json.dump(config, f, indent=2)


def update_multibranch_heads(output_heads: Dict[str, Any]) -> Dict[str, Any]:
    """Legacy single-branch head config -> branch list (ref: utils/model/model.py:152-187)."""
    updated = dict(output_heads)
    for name, val in output_heads.items():
        if isinstance(val, list):
            for branch in val:
                if not (
                    isinstance(branch, dict)
                    and "type" in branch
                    and "architecture" in branch
                ):
                    raise ValueError(
                        f"output_heads['{name}'] does not contain proper branch config"
                    )
        elif isinstance(val, dict):
            updated[name] = [{"type": "branch-0", "architecture": val}]
        else:
            raise ValueError("Unknown output_heads config!")
    return updated


def gather_deg(dataset: Sequence[GraphSample], max_deg: Optional[int] = None) -> List[int]:
    """In-degree histogram for PNA (ref: preprocess/graph_samples_checks_and_updates.py:433-490)."""
    counts: Dict[int, int] = {}
    md = 0
    for s in dataset:
        if s.num_edges == 0:
            deg = np.zeros((s.num_nodes,), np.int64)
        else:
            deg = np.bincount(s.edge_index[1], minlength=s.num_nodes)
        for d in deg:
            counts[int(d)] = counts.get(int(d), 0) + 1
            md = max(md, int(d))
    if max_deg is not None:
        md = max(md, max_deg)
    return [counts.get(d, 0) for d in range(md + 1)]


def calculate_avg_deg(dataset: Sequence[GraphSample]) -> float:
    """Average neighbor count for MACE (ref: config_utils.py:91-96)."""
    tot_e = sum(s.num_edges for s in dataset)
    tot_n = sum(s.num_nodes for s in dataset)
    return float(tot_e) / max(tot_n, 1)


_EDGE_MODELS = [
    "GAT", "PNA", "PNAPlus", "PAINN", "PNAEq", "CGCNN", "SchNet", "EGNN",
    "DimeNet", "MACE",
]
_EQUIVARIANT_MODELS = ["EGNN", "SchNet", "PNAEq", "PAINN", "MACE"]


def check_if_graph_size_variable(*datasets: Sequence[GraphSample]) -> bool:
    """ref: graph_samples_checks_and_updates.py:32-87 (env override honored)."""
    env = os.getenv("HYDRAGNN_USE_VARIABLE_GRAPH_SIZE")
    if env is not None:
        return bool(int(env))
    sizes = set()
    for ds in datasets:
        for s in ds:
            sizes.add(s.num_nodes)
            if len(sizes) > 1:
                return True
    return False


def update_config(
    config: Dict[str, Any],
    train_dataset: Sequence[GraphSample],
    val_dataset: Sequence[GraphSample],
    test_dataset: Sequence[GraphSample],
) -> Dict[str, Any]:
    """Fill defaults + infer shapes from the first sample (ref: config_utils.py:25-160)."""
    config = copy.deepcopy(config)
    arch = config["NeuralNetwork"]["Architecture"]
    training = config["NeuralNetwork"]["Training"]
    var = config["NeuralNetwork"]["Variables_of_interest"]

    graph_size_variable = check_if_graph_size_variable(
        train_dataset, val_dataset, test_dataset
    )

    arch.setdefault("global_attn_engine", None)
    arch.setdefault("global_attn_type", None)
    arch.setdefault("global_attn_heads", 0)
    arch.setdefault("pe_dim", 0)
    arch["output_heads"] = update_multibranch_heads(arch["output_heads"])
    training.setdefault("compute_grad_energy", False)

    # --- output dims from the first sample (ref: config_utils.py:219-260) ---
    sample = train_dataset[0]
    output_type = list(var["type"])
    output_index = list(var.get("output_index", range(len(output_type))))
    if training["compute_grad_energy"]:
        dims_list = list(var["output_dim"])
    elif "output_dim" in var and len(var["output_dim"]) == len(output_type):
        # explicit per-head dims (the dftb_uv_spectrum configs set e.g.
        # output_dim [37500] directly; ref: examples/dftb_uv_spectrum/*.json)
        dims_list = [int(d) for d in var["output_dim"]]
    else:
        dims_list = []
        ds_cfg = config.get("Dataset", {})
        g_dims = ds_cfg.get("graph_features", {}).get("dim", [])
        n_dims = ds_cfg.get("node_features", {}).get("dim", [])
        gy = 0 if sample.y_graph is None else int(np.atleast_1d(sample.y_graph).size)
        ny = (
            0
            if sample.y_node is None
            else int(np.atleast_2d(sample.y_node.reshape(sample.num_nodes, -1)).shape[1])
        )
        goff = noff = 0
        for ihead, t in enumerate(output_type):
            if t == "graph":
                d = g_dims[output_index[ihead]] if g_dims else gy
                goff += d
            elif t == "node":
                d = n_dims[output_index[ihead]] if n_dims else ny
                if (
                    graph_size_variable
                    and arch["output_heads"].get("node", [{}])[0]
                    .get("architecture", {})
                    .get("type")
                    == "mlp_per_node"
                ):
                    raise ValueError(
                        '"mlp_per_node" is not allowed for variable graph size'
                    )
                noff += d
            else:
                raise ValueError(f"Unknown output type {t}")
            dims_list.append(int(d))
    arch["output_dim"] = dims_list
    arch["output_type"] = output_type
    arch["num_nodes"] = sample.num_nodes

    arch["input_dim"] = len(var["input_node_features"])

    if arch["mpnn_type"] in ("PNA", "PNAPlus", "PNAEq"):
        arch["pna_deg"] = gather_deg(train_dataset)
        arch["max_neighbours"] = len(arch["pna_deg"]) - 1
    else:
        arch.setdefault("pna_deg", None)

    # CGCNN conv preserves dimension; hidden = input unless GPS embeds first
    # (ref: config_utils.py:79-86)
    if arch["mpnn_type"] == "CGCNN" and not arch["global_attn_engine"]:
        arch["hidden_dim"] = arch["input_dim"]

    if arch["mpnn_type"] == "MACE":
        arch["avg_num_neighbors"] = calculate_avg_deg(train_dataset)
    else:
        arch["avg_num_neighbors"] = None

    for key in (
        "radius", "radial_type", "distance_transform", "num_gaussians",
        "num_filters", "envelope_exponent", "num_after_skip", "num_before_skip",
        "basis_emb_size", "int_emb_size", "out_emb_size", "num_radial",
        "num_spherical", "correlation", "max_ell", "node_max_ell",
    ):
        arch.setdefault(key, None)

    # edge_dim resolution (ref: config_utils.py:175-199)
    arch["edge_dim"] = None
    if arch.get("edge_features"):
        assert arch["mpnn_type"] in _EDGE_MODELS, (
            "Edge features can only be used with " + ", ".join(_EDGE_MODELS)
        )
        arch["edge_dim"] = len(arch["edge_features"])
    elif arch["mpnn_type"] == "CGCNN":
        arch["edge_dim"] = 0

    # equivariance flag (ref: config_utils.py:164-173)
    if arch.get("equivariance"):
        assert arch["mpnn_type"] in _EQUIVARIANT_MODELS, (
            "E(3) equivariance only for " + ", ".join(_EQUIVARIANT_MODELS)
        )
    else:
        arch["equivariance"] = False

    # TPU lane alignment: a hidden_dim that is not a multiple of 128 makes
    # XLA pad/relayout every [*, hidden] tensor (the reference's GFM config
    # uses 866 — an HPO artifact; 896 ran 34% faster in round-2 ablations,
    # bench/results/train_step_r2.md). "round_hidden_to_128": true rounds
    # UP (more parameters, strictly more capacity); default only warns.
    hd = int(arch.get("hidden_dim", 0) or 0)
    if hd and hd % 128:
        rounded = ((hd + 127) // 128) * 128
        if arch.get("round_hidden_to_128"):
            arch["hidden_dim"] = rounded
        elif hd >= 256:
            import warnings

            warnings.warn(
                f"hidden_dim={hd} is not a multiple of the TPU lane width "
                f"(128); set Architecture.round_hidden_to_128=true to use "
                f"{rounded} (faster on TPU, more parameters)",
                stacklevel=2,
            )
    arch.setdefault("round_hidden_to_128", False)

    arch.setdefault("freeze_conv_layers", False)
    arch.setdefault("initial_bias", None)
    arch.setdefault("activation_function", "relu")
    arch.setdefault("SyncBatchNorm", False)
    training.setdefault("conv_checkpointing", False)
    if training["conv_checkpointing"] == "auto":
        # GFM-scale preset: rematerialize conv layers with the "dots"
        # policy (matmul outputs stay resident, elementwise recomputed)
        # once activations get HBM-expensive — wide hidden dims are where
        # remat pays for itself (bench/results/train_step_r2.md)
        wide = int(arch.get("hidden_dim", 0) or 0) >= 512
        training["conv_checkpointing"] = wide
        if wide:
            training.setdefault("remat_policy", "dots")
    training.setdefault("loss_function_type", "mse")
    training.setdefault("Optimizer", {"type": "AdamW", "learning_rate": 1e-3})
    var.setdefault("denormalize_output", False)

    return config


def get_log_name_config(config: Dict[str, Any]) -> str:
    """ref: config_utils.py:314-350."""
    arch = config["NeuralNetwork"]["Architecture"]
    training = config["NeuralNetwork"]["Training"]
    name = (
        arch["mpnn_type"]
        + "-r-" + str(arch.get("radius"))
        + "-ncl-" + str(arch["num_conv_layers"])
        + "-hd-" + str(arch["hidden_dim"])
        + "-ne-" + str(training["num_epoch"])
        + "-lr-" + str(training["Optimizer"]["learning_rate"])
        + "-bs-" + str(training["batch_size"])
    )
    if "Dataset" in config and "name" in config["Dataset"]:
        name += "-data-" + config["Dataset"]["name"]
    return name
