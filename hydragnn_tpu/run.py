"""Top-level entry points (ref: hydragnn/run_training.py:48-182,
run_prediction.py:34-107).

``run_training(config_or_path)``: env/dist setup -> data load+split ->
config update -> model -> train_validate_test -> save. Library-style use
(examples calling the pieces directly) is equally supported.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple, Union

import jax

from hydragnn_tpu.config import (
    get_log_name_config,
    load_config,
    save_config,
    update_config,
)
from hydragnn_tpu.data.dataloader import create_dataloaders, split_dataset
from hydragnn_tpu.models.arch import arch_config_from_dict
from hydragnn_tpu.models.create import create_model
from hydragnn_tpu.train.trainer import (
    evaluate,
    make_eval_step,
    train_validate_test,
)
from hydragnn_tpu.utils.print_utils import setup_log


def _load_dataset(config: Dict[str, Any]):
    """Dataset dispatch by format (ref: preprocess/load_data.py:206-330)."""
    ds_cfg = config["Dataset"]
    fmt = ds_cfg.get("format", "unit_test")
    if fmt in ("unit_test", "LSMS"):
        from hydragnn_tpu.data.lsms import load_lsms_dataset

        paths = ds_cfg["path"]
        if "total" in paths:
            total = load_lsms_dataset(config, paths["total"])
            return split_dataset(
                total,
                config["NeuralNetwork"]["Training"]["perc_train"],
                ds_cfg.get("compositional_stratified_splitting", False),
            )
        train = load_lsms_dataset(config, paths["train"])
        val = load_lsms_dataset(config, paths["validate"])
        test = load_lsms_dataset(config, paths["test"])
        return train, val, test
    if fmt == "pickle":
        from hydragnn_tpu.data.pickledataset import SimplePickleDataset

        base = list(ds_cfg["path"].values())[0]
        # SERIALIZED_DATA_PATH redirects serialized datasets to another
        # filesystem (ref: load_data.py:363,403 env-rooted pkl paths)
        env_root = os.getenv("SERIALIZED_DATA_PATH")
        if env_root and not os.path.isdir(base):
            alt = os.path.join(
                env_root, "serialized_dataset", os.path.basename(base)
            )
            if os.path.isdir(alt):
                base = alt
        return (
            list(SimplePickleDataset(base, "trainset")),
            list(SimplePickleDataset(base, "valset")),
            list(SimplePickleDataset(base, "testset")),
        )
    if fmt == "adios":
        # arraystore — the ADIOS2 (.bp) equivalent: one store root with
        # trainset/valset/testset groups (ref: load_data.py:206-330 +
        # AdiosDataset(fname, "trainset", ...) usage in examples). Set
        # HYDRAGNN_USE_ddstore=1 to shard each split across processes with
        # any-rank gets (ref: adiosdataset.py:645-689 ddstore mode).
        from hydragnn_tpu.data.arraystore import GraphArrayStore

        base = list(ds_cfg["path"].values())[0]
        preload = bool(ds_cfg.get("preload", False))
        splits = [
            GraphArrayStore(os.path.join(base, split), preload=preload)
            for split in ("trainset", "valset", "testset")
        ]
        if os.getenv("HYDRAGNN_USE_ddstore", "0") == "1":
            from hydragnn_tpu.data.distdataset import DistDataset

            splits = [
                DistDataset(s, label=lbl)
                for s, lbl in zip(splits, ("trainset", "valset", "testset"))
            ]
        return tuple(splits)
    if fmt in ("CFG", "XYZ"):
        # raw structure-file pipeline (ref: load_data.py:380-392
        # transform_raw_data_to_serialized + total_to_train_val_test_pkls)
        from hydragnn_tpu.data.rawdataset import load_raw_dataset

        paths = ds_cfg["path"]
        if "total" in paths:
            total = load_raw_dataset(config, paths["total"])
            return split_dataset(
                total,
                config["NeuralNetwork"]["Training"]["perc_train"],
                ds_cfg.get("compositional_stratified_splitting", False),
            )
        return tuple(
            load_raw_dataset(config, paths[k])
            for k in ("train", "validate", "test")
        )
    raise ValueError(f"Unknown dataset format: {fmt}")


def run_training(
    config_or_path: Union[str, Dict[str, Any]],
    chosen_seed: Optional[int] = None,
):
    config = (
        load_config(config_or_path)
        if isinstance(config_or_path, str)
        else config_or_path
    )
    verbosity = config.get("Verbosity", {}).get("level", 0)

    trainset, valset, testset = _load_dataset(config)
    config = update_config(config, trainset, valset, testset)

    arch = config["NeuralNetwork"]["Architecture"]
    training_cfg = config["NeuralNetwork"]["Training"]
    # EGNN/SchNet/PAINN on TPU route through the fused per-graph-block
    # edge kernels (ops/pallas_egnn.py, pallas_schnet.py, pallas_painn.py)
    # which need the slotted node+edge collate; "auto" sizes both slots
    # from the dataset.
    # Override with Training["edge_slot"] = "off" (or an integer).
    edge_slot = training_cfg.get("edge_slot", "auto")
    use_edge_slot = (
        arch.get("mpnn_type") in ("EGNN", "SchNet", "PAINN")
        and not arch.get("equivariance")
        and edge_slot != "off"
    )
    train_loader, val_loader, test_loader = create_dataloaders(
        trainset, valset, testset,
        batch_size=training_cfg["batch_size"],
        # "auto" enables the slotted dense-adjacency collate (fastest
        # aggregation path) for small near-uniform graphs; override with
        # true/false in the config
        dense_adjacency=(
            False if use_edge_slot
            else training_cfg.get("dense_adjacency", "auto")
        ),
        edge_slot=edge_slot if use_edge_slot else None,
    )

    log_name = get_log_name_config(config)
    setup_log(log_name)
    save_config(config, log_name)

    cfg = arch_config_from_dict(config["NeuralNetwork"])
    model = create_model(cfg)

    rng = jax.random.PRNGKey(chosen_seed if chosen_seed is not None else 0)
    state, results = train_validate_test(
        model, cfg, config, train_loader, val_loader, test_loader,
        rng=rng, verbosity=verbosity,
        checkpoint_dir=os.path.join("./logs", log_name),
    )
    return model, cfg, config, state, results


def run_prediction(
    config: Dict[str, Any],
    model,
    cfg,
    state,
    test_loader=None,
):
    """ref: run_prediction.py:34-107 — run test() and return error metrics +
    predictions."""
    if test_loader is None:
        trainset, valset, testset = _load_dataset(config)
        arch = config["NeuralNetwork"]["Architecture"]
        training_cfg = config["NeuralNetwork"]["Training"]
        edge_slot = training_cfg.get("edge_slot", "auto")
        use_edge_slot = (
            arch.get("mpnn_type") in ("EGNN", "SchNet", "PAINN")
            and not arch.get("equivariance")
            and edge_slot != "off"
        )
        _, _, test_loader = create_dataloaders(
            trainset, valset, testset,
            batch_size=training_cfg["batch_size"],
            edge_slot=edge_slot if use_edge_slot else None,
        )
    eval_step = make_eval_step(model, cfg)
    metrics = evaluate(test_loader, state, eval_step, cfg)
    var = config["NeuralNetwork"]["Variables_of_interest"]
    if var.get("denormalize_output") and var.get("y_minmax"):
        # collect + denormalize predictions (ref: run_prediction.py:85-107)
        from hydragnn_tpu.models.losses import head_masks, head_targets
        from hydragnn_tpu.postprocess.postprocess import output_denormalize
        import numpy as np

        trues = [[] for _ in range(cfg.num_heads)]
        preds = [[] for _ in range(cfg.num_heads)]
        for batch in test_loader:
            _, _, pred = eval_step(state, batch)
            if cfg.var_output:
                pred = pred[0]
            ts = head_targets(cfg, batch)
            ms = head_masks(cfg, batch)
            for ih in range(cfg.num_heads):
                m = np.asarray(ms[ih])
                trues[ih].append(np.asarray(ts[ih])[m])
                preds[ih].append(np.asarray(pred[ih])[m])
        trues = [np.concatenate(t) for t in trues]
        preds = [np.concatenate(p) for p in preds]
        trues, preds = output_denormalize(var["y_minmax"], trues, preds)
        return metrics, trues, preds
    return metrics
