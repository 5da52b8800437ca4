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


def _encode(space: Dict[str, list], cfg: Dict[str, Any]) -> List[float]:
    """Config -> choice-index feature vector for the surrogate."""
    vec = []
    for dotted, choices in space.items():
        d = cfg
        for k in dotted.split("."):
            d = d[k]
        vec.append(float(choices.index(d)))
    return vec


def model_based_search(
    base_config: Dict[str, Any],
    objective_fn: Callable[[Dict[str, Any]], float],
    n_trials: int = 20,
    space: Optional[Dict[str, list]] = None,
    seed: int = 0,
    n_init: int = 5,
    n_candidates: int = 256,
    kappa: float = 1.0,
    max_workers: int = 1,
) -> Tuple[Dict[str, Any], float, List[Tuple[Dict[str, Any], float]]]:
    """Asynchronous model-based search — the DeepHyper CBO equivalent
    (ref: hydragnn/utils/hpo/deephyper.py:5-177 builds DeepHyper trials; its
    default search is Bayesian optimization with a random-forest surrogate).

    A RandomForest surrogate fits (choice-index vector -> objective); each
    step scores ``n_candidates`` random configs by lower-confidence-bound
    (mean - kappa * std across trees) and evaluates the best. With
    ``max_workers > 1`` trials run concurrently; pending points are filled
    in with the current best value (constant liar) so the surrogate keeps
    proposing diverse configs — the async behavior of DeepHyper's
    centralized BO. Minimizes objective_fn; returns
    (best_config, best_value, trials)."""
    from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor, wait

    from sklearn.ensemble import RandomForestRegressor

    space = space or DEFAULT_SPACE
    rng = np.random.RandomState(seed)
    trials: List[Tuple[Dict[str, Any], float]] = []
    X: List[List[float]] = []
    y: List[float] = []

    def propose() -> Dict[str, Any]:
        if len(y) < n_init:
            return suggest_config(base_config, rng, space)
        model = RandomForestRegressor(
            n_estimators=32, random_state=rng.randint(2**31)
        )
        liar = min(y) if y else 0.0
        Xp = X + [x for x, _ in pending.values()]
        yp = y + [liar] * len(pending)
        model.fit(np.asarray(Xp), np.asarray(yp))
        cands = [
            suggest_config(base_config, rng, space)
            for _ in range(n_candidates)
        ]
        enc = np.asarray([_encode(space, c) for c in cands])
        preds = np.stack(
            [t.predict(enc) for t in model.estimators_], axis=0
        )
        lcb = preds.mean(0) - kappa * preds.std(0)
        return cands[int(np.argmin(lcb))]

    pending: Dict[Any, Tuple[List[float], Dict[str, Any]]] = {}
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        launched = 0
        futures = set()
        while launched < n_trials or futures:
            while launched < n_trials and len(futures) < max_workers:
                cfg = propose()
                fut = pool.submit(objective_fn, cfg)
                pending[fut] = (_encode(space, cfg), cfg)
                futures.add(fut)
                launched += 1
            done, futures = wait(futures, return_when=FIRST_COMPLETED)
            for fut in done:
                enc, cfg = pending.pop(fut)
                val = float(fut.result())
                trials.append((cfg, val))
                X.append(enc)
                y.append(val)

    best_i = int(np.argmin([v for _, v in trials]))
    return trials[best_i][0], trials[best_i][1], trials
