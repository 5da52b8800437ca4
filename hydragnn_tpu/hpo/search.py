"""Hyperparameter search (ref: hydragnn/utils/hpo/deephyper.py:5-177).

The reference wraps DeepHyper's SLURM launchers; here a self-contained
random-search driver evaluates config perturbations in-process (each trial =
one ``train_validate_test`` run), plus the launch-command builders for
cluster schedulers in hpo.launch."""

from __future__ import annotations

import copy
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

DEFAULT_SPACE = {
    "NeuralNetwork.Architecture.hidden_dim": [16, 32, 64, 128],
    "NeuralNetwork.Architecture.num_conv_layers": [2, 3, 4, 6],
    "NeuralNetwork.Training.Optimizer.learning_rate": [3e-4, 1e-3, 3e-3, 1e-2],
    "NeuralNetwork.Training.batch_size": [16, 32, 64],
}


def _set_path(config: Dict[str, Any], dotted: str, value: Any) -> None:
    keys = dotted.split(".")
    d = config
    for k in keys[:-1]:
        d = d[k]
    d[keys[-1]] = value


def suggest_config(
    base_config: Dict[str, Any],
    rng: np.random.RandomState,
    space: Optional[Dict[str, list]] = None,
) -> Dict[str, Any]:
    space = space or DEFAULT_SPACE
    cfg = copy.deepcopy(base_config)
    for dotted, choices in space.items():
        _set_path(cfg, dotted, choices[rng.randint(len(choices))])
    return cfg


def random_search(
    base_config: Dict[str, Any],
    objective_fn: Callable[[Dict[str, Any]], float],
    n_trials: int = 10,
    space: Optional[Dict[str, list]] = None,
    seed: int = 0,
) -> Tuple[Dict[str, Any], float, List[Tuple[Dict[str, Any], float]]]:
    """Minimize objective_fn(config) (e.g. final val loss). Returns
    (best_config, best_value, all_trials)."""
    rng = np.random.RandomState(seed)
    trials = []
    best_cfg, best_val = None, float("inf")
    for _ in range(n_trials):
        cfg = suggest_config(base_config, rng, space)
        val = float(objective_fn(cfg))
        trials.append((cfg, val))
        if val < best_val:
            best_cfg, best_val = cfg, val
    return best_cfg, best_val, trials
