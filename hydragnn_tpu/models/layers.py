"""Shared NN building blocks (flax.linen).

Activation/loss registries mirror the reference
(ref: hydragnn/utils/model/model.py:29-61). BatchNorm is mask-aware: padded
node slots are excluded from batch moments (the reference's PyG BatchNorm sees
no padding because shapes are dynamic; masking restores identical statistics
on TPU's padded batches).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


def activation_function_selection(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    table = {
        "relu": jax.nn.relu,
        "selu": jax.nn.selu,
        "elu": jax.nn.elu,
        "lrelu_01": lambda x: jax.nn.leaky_relu(x, 0.1),
        "lrelu_025": lambda x: jax.nn.leaky_relu(x, 0.25),
        "lrelu_05": lambda x: jax.nn.leaky_relu(x, 0.5),
        "sigmoid": jax.nn.sigmoid,
        # prelu needs a parameter; approximated with leaky_relu(0.25) init slope
        "prelu": lambda x: jax.nn.leaky_relu(x, 0.25),
        "silu": jax.nn.silu,
        "tanh": jnp.tanh,
        "softplus": jax.nn.softplus,
    }
    if name not in table:
        raise ValueError(f"Unknown activation function: {name}")
    return table[name]


def loss_function_selection(name: str):
    """Returns fn(pred, target) -> scalar, mean-reduced over given elements."""
    if name == "mse":
        return lambda p, t: jnp.mean((p - t) ** 2)
    if name == "mae":
        return lambda p, t: jnp.mean(jnp.abs(p - t))
    if name == "rmse":
        return lambda p, t: jnp.sqrt(jnp.mean((p - t) ** 2))
    if name == "smooth_l1":

        def smooth_l1(p, t, beta=1.0):
            d = jnp.abs(p - t)
            return jnp.mean(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta))

        return smooth_l1
    if name == "GaussianNLLLoss":

        def gnll(p, t, var, eps=1e-6):
            var = jnp.maximum(var, eps)
            return jnp.mean(0.5 * (jnp.log(var) + (p - t) ** 2 / var))

        return gnll
    raise ValueError(f"Unknown loss function: {name}")


def masked_loss_function_selection(name: str):
    """Mask-weighted version: mean over valid rows only (padding excluded).
    Equivalent to the reference's unpadded reduction."""
    def _wmean(err, w):
        w = w.astype(err.dtype)
        if err.ndim > w.ndim:
            w = w.reshape(w.shape + (1,) * (err.ndim - w.ndim))
        # NaN-safe: masked entries may hold NaN/inf from padding-slot math
        # (e.g. force gradients at zero-length padding edges); NaN * 0 = NaN,
        # so select before weighting
        err = jnp.where(w > 0, err, 0.0)
        denom = jnp.maximum(jnp.sum(w) * (err.size / w.size), 1.0)
        return jnp.sum(err * w) / denom

    if name == "mse":
        return lambda p, t, m: _wmean((p - t) ** 2, m)
    if name == "mae":
        return lambda p, t, m: _wmean(jnp.abs(p - t), m)
    if name == "rmse":
        return lambda p, t, m: jnp.sqrt(_wmean((p - t) ** 2, m))
    if name == "smooth_l1":

        def smooth_l1(p, t, m, beta=1.0):
            d = jnp.abs(p - t)
            return _wmean(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta), m)

        return smooth_l1
    if name == "GaussianNLLLoss":

        def gnll(p, t, m, var, eps=1e-6):
            var = jnp.maximum(var, eps)
            return _wmean(0.5 * (jnp.log(var) + (p - t) ** 2 / var), m)

        return gnll
    raise ValueError(f"Unknown loss function: {name}")


def split_init(fan_piece: int, fan_total: int):
    """Initializer for one column-slice of a linear layer that was split
    into per-input Denses (transform-then-gather): variance 1/fan_total —
    the distribution the unsplit [fan_total, out] lecun_normal kernel would
    have given this slice. Without this, a low-fan piece (e.g. a [1, H]
    radial column) would get O(1) weights instead of O(1/sqrt(fan_total))
    and destabilize early training."""
    return nn.initializers.variance_scaling(
        fan_piece / fan_total, "fan_in", "truncated_normal"
    )


class MLP(nn.Module):
    """Dense stack: Linear(+act) per hidden layer, final Linear bare unless
    ``activate_final``."""

    features: Sequence[int]
    activation: Callable = jax.nn.relu
    activate_final: bool = False
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, f in enumerate(self.features):
            x = nn.Dense(f, use_bias=self.use_bias, name=f"dense_{i}")(x)
            if i < len(self.features) - 1 or self.activate_final:
                x = self.activation(x)
        return x


class MaskedBatchNorm(nn.Module):
    """BatchNorm over node rows with padding-aware moments.

    Matches PyG ``BatchNorm(hidden_dim)`` (torch BatchNorm1d: eps 1e-5,
    momentum 0.1, affine, running stats; ref: hydragnn/models/Base.py:206).
    ``use_running_average=True`` for eval. Cross-device moment sync (the
    reference's SyncBatchNorm, ref: distributed.py:344-347) happens when the
    surrounding step is jitted over a mesh: moments here use masked global
    sums, which XLA converts to psums under shard_map/jit sharding.
    """

    momentum: float = 0.1
    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: jnp.ndarray,
        use_running_average: bool = False,
    ) -> jnp.ndarray:
        features = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            w = mask.astype(jnp.float32)[:, None]
            cnt = jnp.maximum(jnp.sum(w), 1.0)
            mean = jnp.sum(x * w, axis=0) / cnt
            var = jnp.sum(w * (x - mean) ** 2, axis=0) / cnt
            if not self.is_initializing():
                # torch uses unbiased variance for the running estimate
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = (
                    (1 - self.momentum) * ra_mean.value + self.momentum * mean
                )
                ra_var.value = (
                    (1 - self.momentum) * ra_var.value + self.momentum * unbiased
                )
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


class MaskedLayerNorm(nn.Module):
    """Plain LayerNorm (row-wise; padding rows are garbage-in/garbage-out and
    masked downstream). Preferred static-shape norm for GPS blocks."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.LayerNorm(epsilon=self.epsilon)(x)
