"""Model parameter summary (ref: hydragnn/utils/model/model.py:289-303
print_model)."""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def count_params(params: Any) -> int:
    return int(sum(np.prod(a.shape) for a in jax.tree_util.tree_leaves(params)))


def print_model(params: Any, max_depth: int = 2) -> None:
    """Per-subtree parameter counts."""
    from collections import defaultdict

    totals = defaultdict(int)
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        key = "/".join(str(getattr(p, "key", p)) for p in path[:max_depth])
        totals[key] += int(np.prod(leaf.shape))
    for k in sorted(totals):
        print(f"{k}: {totals[k]:,}")
    print(f"TOTAL: {count_params(params):,}")
