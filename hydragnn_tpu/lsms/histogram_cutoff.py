"""Compositional histogram downselection (ref:
hydragnn/utils/lsms/compositional_histogram_cutoff.py:8-100): cap the number
of samples per binary-composition bin."""

from __future__ import annotations

import os
import shutil
from typing import Sequence

import numpy as np


def find_bin(comp: float, nbins: int) -> int:
    bins = np.linspace(0, 1, nbins)
    for bi in range(len(bins) - 1):
        if bins[bi] < comp < bins[bi + 1]:
            return bi
    return nbins - 1


def compositional_histogram_cutoff(
    dir: str,
    elements_list: Sequence[float],
    histogram_cutoff: int,
    num_bins: int,
    overwrite_data: bool = False,
) -> str:
    dir = dir.rstrip("/")
    new_dir = dir + "_histogram_cutoff/"
    if os.path.exists(new_dir):
        if overwrite_data:
            shutil.rmtree(new_dir)
        else:
            return new_dir
    os.makedirs(new_dir, exist_ok=True)

    elements_list = sorted(elements_list)
    counts_per_bin = np.zeros(num_bins, int)
    for fname in sorted(os.listdir(dir)):
        path = os.path.join(dir, fname)
        atoms = np.atleast_2d(np.loadtxt(path, skiprows=1))
        elements, counts = np.unique(atoms[:, 0], return_counts=True)
        cdict = {e: 0 for e in elements_list}
        for e, c in zip(elements, counts):
            cdict[e] = int(c)
        comp = cdict[elements_list[0]] / atoms.shape[0]
        b = find_bin(comp, num_bins)
        if counts_per_bin[b] < histogram_cutoff:
            counts_per_bin[b] += 1
            shutil.copy(path, os.path.join(new_dir, fname))
    return new_dir
