"""Compositional stratified splitting
(ref: hydragnn/preprocess/compositional_data_splitting.py:19-156).

Stratify train/val/test by elemental composition (the multiset of atomic
types in each graph); compositions with a single sample are duplicated so
every split sees every composition — same behavior as the reference's
duplicate-singleton pass."""

from __future__ import annotations

from collections import defaultdict
from typing import List, Sequence, Tuple

import numpy as np

from hydragnn_tpu.graph import GraphSample


def composition_key(sample: GraphSample) -> tuple:
    vals, counts = np.unique(
        np.round(np.asarray(sample.x)[:, 0]).astype(int), return_counts=True
    )
    return tuple(zip(vals.tolist(), counts.tolist()))


def duplicate_unique_compositions(
    dataset: Sequence[GraphSample],
) -> List[GraphSample]:
    """ref: compositional_data_splitting.py duplicate pass — compositions with
    fewer than 3 samples are repeated so each split can hold one."""
    groups = defaultdict(list)
    for s in dataset:
        groups[composition_key(s)].append(s)
    out = []
    for comps in groups.values():
        while len(comps) < 3:
            comps = comps + [comps[0]]
        out.extend(comps)
    return out


def compositional_stratified_splitting(
    dataset: Sequence[GraphSample],
    perc_train: float,
    seed: int = 0,
) -> Tuple[List[GraphSample], List[GraphSample], List[GraphSample]]:
    """Per-composition proportional assignment (ref: :19-156 using sklearn
    StratifiedShuffleSplit twice; here a direct per-group deal)."""
    rng = np.random.RandomState(seed)
    dataset = duplicate_unique_compositions(dataset)
    groups = defaultdict(list)
    for s in dataset:
        groups[composition_key(s)].append(s)
    train, val, test = [], [], []
    perc_val = (1 - perc_train) / 2
    for comps in groups.values():
        idx = np.arange(len(comps))
        rng.shuffle(idx)
        n = len(comps)
        n_val = max(int(round(n * perc_val)), 1)
        n_test = max(int(round(n * perc_val)), 1)
        n_train = n - n_val - n_test
        if n_train <= 0:
            n_train, n_val, n_test = n - 2, 1, 1
        for k, i in enumerate(idx):
            if k < n_train:
                train.append(comps[i])
            elif k < n_train + n_val:
                val.append(comps[i])
            else:
                test.append(comps[i])
    rng.shuffle(train)
    return train, val, test
