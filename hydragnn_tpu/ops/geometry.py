"""Edge geometry (ref: hydragnn/utils/model/operations.py:21-36)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def get_edge_vectors_and_lengths(
    positions: jnp.ndarray,  # [N, 3]
    senders: jnp.ndarray,  # [E]
    receivers: jnp.ndarray,  # [E]
    shifts: Optional[jnp.ndarray] = None,  # [E, 3]
    normalize: bool = False,
    eps: float = 1e-9,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """vectors = pos[recv] - pos[send] + shifts; lengths [E, 1].

    Zero-safe norm: padding edges connect identical endpoints (vec = 0) and
    a plain ``linalg.norm`` there has a 0/0 gradient that poisons force
    training; sqrt(|v|^2 + tiny) has gradient exactly 0 at v = 0."""
    vectors = positions[receivers] - positions[senders]
    if shifts is not None:
        vectors = vectors + shifts
    lengths = jnp.sqrt(
        jnp.sum(vectors * vectors, axis=-1, keepdims=True) + 1e-24
    )
    if normalize:
        return vectors / (lengths + eps), lengths
    return vectors, lengths
