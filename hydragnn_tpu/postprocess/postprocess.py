"""Output denormalization (ref: hydragnn/postprocess/postprocess.py:13-54)."""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


def output_denormalize(
    y_minmax: Sequence[Sequence[float]],
    true_values: List[np.ndarray],
    predicted_values: List[np.ndarray],
):
    """Invert the [0,1] min-max scaling per head (ref: postprocess.py:13-34)."""
    for ihead in range(len(y_minmax)):
        ymin, ymax = float(y_minmax[ihead][0]), float(y_minmax[ihead][1])
        for arrs in (true_values, predicted_values):
            arrs[ihead] = np.asarray(arrs[ihead]) * (ymax - ymin) + ymin
    return true_values, predicted_values


def unscale_features_by_num_nodes(values: np.ndarray, num_nodes: np.ndarray):
    """Invert per-num-nodes scaling (ref: postprocess.py:37-54)."""
    return np.asarray(values) * np.asarray(num_nodes).reshape(-1, 1)
