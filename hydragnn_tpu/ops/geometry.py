"""Edge geometry (ref: hydragnn/utils/model/operations.py:21-36)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def safe_edge_geometry(
    vectors: jnp.ndarray,  # [E, 3]
    lengths: jnp.ndarray,  # [E, 1] or [E]
    edge_mask: jnp.ndarray,  # [E] bool
    safe_length: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Replace padding-edge geometry with a benign constant (unit-z vector,
    length ``safe_length``). Padding edges have zero-length vectors whose
    forward values are masked out downstream, but 1/|v|-style terms (RBF
    envelopes, normalized directions, spherical harmonics) have second-order
    position-gradients that overflow fp32 at |v| -> 0 and poison
    energy-force training. Every derivative of the constant geometry is 0."""
    m = edge_mask
    mv = m[:, None].astype(vectors.dtype)
    safe_vec = jnp.zeros_like(vectors).at[:, 2].set(safe_length)
    vectors = vectors * mv + safe_vec * (1.0 - mv)
    ml = m.astype(lengths.dtype)
    if lengths.ndim == 2:
        ml = ml[:, None]
    lengths = lengths * ml + safe_length * (1.0 - ml)
    return vectors, lengths


def get_edge_vectors_and_lengths(
    positions: jnp.ndarray,  # [N, 3]
    senders: jnp.ndarray,  # [E]
    receivers: jnp.ndarray,  # [E]
    shifts: Optional[jnp.ndarray] = None,  # [E, 3]
    normalize: bool = False,
    eps: float = 1e-9,
    edge_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """vectors = pos[recv] - pos[send] + shifts; lengths [E, 1].

    Zero-safe norm: padding edges connect identical endpoints (vec = 0) and
    a plain ``linalg.norm`` there has a 0/0 gradient that poisons force
    training; sqrt(|v|^2 + tiny) has gradient exactly 0 at v = 0. Pass
    ``edge_mask`` to additionally swap padding-edge geometry for benign
    constants (see safe_edge_geometry) — required for second-order (force)
    training through 1/length-style bases."""
    vectors = positions[receivers] - positions[senders]
    if shifts is not None:
        vectors = vectors + shifts
    lengths = jnp.sqrt(
        jnp.sum(vectors * vectors, axis=-1, keepdims=True) + 1e-24
    )
    if edge_mask is not None:
        vectors, lengths = safe_edge_geometry(vectors, lengths, edge_mask)
    if normalize:
        return vectors / (lengths + eps), lengths
    return vectors, lengths
