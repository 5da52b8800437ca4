"""Deterministic synthetic BCC-lattice dataset — the primary test fixture.

Numpy re-implementation of ``tests/deterministic_graph_data.py:20-173`` from
the reference: random BCC supercells, node feature = random type id, nodal
outputs x (KNN-smoothed feature), x^2 + feature, x^3, graph output = sum of
all three. Written as LSMS-format text files so the real raw-loader path
(``hydragnn_tpu.data.lsms``) is exercised end-to-end, exactly like the
reference CI (``format: unit_test``).
"""

from __future__ import annotations

import os
import shutil
from typing import List, Optional

import numpy as np


def _knn_predict(pos: np.ndarray, feat: np.ndarray, k: int) -> np.ndarray:
    """KNeighborsRegressor.predict(pos) with fit on (pos, feat): mean of the
    k nearest training points (the query point itself is in the training set)."""
    n = pos.shape[0]
    k = min(k, n)
    d = np.linalg.norm(pos[:, None, :] - pos[None, :, :], axis=-1)
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    return feat[idx, 0].mean(axis=1, keepdims=True)


def create_configuration(
    path: str,
    configuration: int,
    configuration_start: int,
    uc_x: int,
    uc_y: int,
    uc_z: int,
    types: List[int],
    number_neighbors: int,
    linear_only: bool,
    rng: np.random.RandomState,
) -> None:
    number_nodes = 2 * uc_x * uc_y * uc_z
    positions = np.zeros((number_nodes, 3), np.float64)
    count = 0
    for x in range(uc_x):
        for y in range(uc_y):
            for z in range(uc_z):
                positions[count] = (x, y, z)
                positions[count + 1] = (x + 0.5, y + 0.5, z + 0.5)
                count += 2
    node_ids = np.arange(number_nodes, dtype=np.float64).reshape(-1, 1)
    node_feature = rng.randint(min(types), max(types) + 1, (number_nodes, 1)).astype(
        np.float64
    )
    if linear_only:
        node_output_x = node_feature.copy()
    else:
        node_output_x = _knn_predict(positions, node_feature, number_neighbors)
    node_output_x_square = node_output_x ** 2 + node_feature
    node_output_x_cube = node_output_x ** 3

    table = np.concatenate(
        (node_feature, node_ids, positions, node_output_x,
         node_output_x_square, node_output_x_cube),
        axis=1,
    )
    if linear_only:
        total_value = node_output_x.sum()
        header = np.array2string(np.float64(total_value))
    else:
        total_linear = node_output_x.sum()
        total_value = (
            node_output_x.sum() + node_output_x_square.sum() + node_output_x_cube.sum()
        )
        header = (
            np.array2string(np.float64(total_value))
            + "\t"
            + np.array2string(np.float64(total_linear))
        )
    txt = header
    for row in table:
        s = np.array2string(row, precision=2, separator="\t", suppress_small=True)
        txt += "\n" + s.lstrip("[").rstrip("]")
    fname = os.path.join(path, f"output{configuration + configuration_start}.txt")
    with open(fname, "w") as f:
        f.write(txt)


def deterministic_graph_data(
    path: str,
    number_configurations: int = 500,
    configuration_start: int = 0,
    unit_cell_x_range=(1, 3),
    unit_cell_y_range=(1, 3),
    unit_cell_z_range=(1, 2),
    number_types: int = 3,
    types: Optional[List[int]] = None,
    number_neighbors: int = 2,
    linear_only: bool = False,
    seed: int = 0,
) -> None:
    if types is None:
        types = list(range(number_types))
    rng = np.random.RandomState(seed)
    if os.path.isdir(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    ux = rng.randint(unit_cell_x_range[0], unit_cell_x_range[1], number_configurations)
    uy = rng.randint(unit_cell_y_range[0], unit_cell_y_range[1], number_configurations)
    uz = rng.randint(unit_cell_z_range[0], unit_cell_z_range[1], number_configurations)
    for c in range(number_configurations):
        create_configuration(
            path, c, configuration_start, int(ux[c]), int(uy[c]), int(uz[c]),
            types, number_neighbors, linear_only, rng,
        )
