"""Optimizer selection (ref: hydragnn/utils/optimizer/optimizer.py:12-113).

optax equivalents of the torch optimizers. ZeRO-style optimizer-state
sharding is a sharding annotation concern under pjit (see parallel.mesh),
not a different optimizer class — optax states shard with the params.
Learning rate is injected as a mutable hyperparameter so the host-side
ReduceLROnPlateau scheduler can rescale it without re-jitting.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import optax


def select_optimizer(training_config: Dict[str, Any]) -> optax.GradientTransformation:
    opt_cfg = training_config["Optimizer"]
    name = opt_cfg.get("type", "AdamW")
    lr = float(opt_cfg.get("learning_rate", 1e-3))
    table = {
        "SGD": lambda: optax.sgd(lr),
        "Adam": lambda: optax.adam(lr),
        "Adadelta": lambda: optax.adadelta(lr),
        "Adagrad": lambda: optax.adagrad(lr),
        "Adamax": lambda: optax.adamax(lr),
        "AdamW": lambda: optax.adamw(lr),
        "RMSprop": lambda: optax.rmsprop(lr),
        # DeepSpeed FusedLAMB equivalent
        "FusedLAMB": lambda: optax.lamb(lr),
        "LAMB": lambda: optax.lamb(lr),
    }
    if name not in table:
        raise ValueError(f"Optimizer {name} not supported")

    def make(learning_rate):
        return {
            "SGD": optax.sgd,
            "Adam": optax.adam,
            "Adadelta": optax.adadelta,
            "Adagrad": optax.adagrad,
            "Adamax": optax.adamax,
            "AdamW": optax.adamw,
            "RMSprop": optax.rmsprop,
            "FusedLAMB": optax.lamb,
            "LAMB": optax.lamb,
        }[name](learning_rate)

    return optax.inject_hyperparams(make)(learning_rate=lr)


def freeze_conv_params(
    optimizer: optax.GradientTransformation,
) -> optax.GradientTransformation:
    """Zero updates for encoder conv/norm parameters — the reference's
    freeze_conv option (ref: hydragnn/models/Base.py:247-251
    requires_grad=False). Param subtrees named conv_*/norm_*/gps_* are
    frozen; decoders/heads stay trainable."""

    def mask_fn(params):
        def label(path, leaf):
            top = path[0].key if path else ""
            frozen = any(
                str(top).startswith(p) for p in ("conv_", "norm_", "gps_")
            )
            return "frozen" if frozen else "trainable"

        return jax.tree_util.tree_map_with_path(label, params)

    return optax.multi_transform(
        {"trainable": optimizer, "frozen": optax.set_to_zero()}, mask_fn
    )


class ReduceLROnPlateau:
    """Host-side LR scheduler (ref: run_training.py:102-104:
    factor=0.5, patience=5, min_lr=1e-5, mode='min')."""

    def __init__(self, factor: float = 0.5, patience: int = 5,
                 min_lr: float = 1e-5):
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.best = float("inf")
        self.num_bad = 0

    def step(self, metric: float, lr: float) -> float:
        if metric < self.best:
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.num_bad > self.patience:
            self.num_bad = 0
            return max(lr * self.factor, self.min_lr)
        return lr


class EarlyStopping:
    """ref: hydragnn/utils/model/model.py:305-320."""

    def __init__(self, patience: int = 10, min_delta: float = 0.0):
        self.patience = patience
        self.min_delta = min_delta
        self.best = float("inf")
        self.count = 0
        self.early_stop = False

    def __call__(self, val_loss: float) -> bool:
        if val_loss < self.best - self.min_delta:
            self.best = val_loss
            self.count = 0
        else:
            self.count += 1
            if self.count >= self.patience:
                self.early_stop = True
        return self.early_stop
