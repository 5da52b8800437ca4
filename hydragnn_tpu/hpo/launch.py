"""Cluster launch-command builders (ref: hydragnn/utils/hpo/deephyper.py:94-177
SLURM node-parsing + per-trial command construction)."""

from __future__ import annotations

import os
from typing import List, Optional


def parse_slurm_nodelist(nodelist: Optional[str] = None) -> List[str]:
    """Expand 'node[001-003,007]' style SLURM_NODELIST
    (ref: deephyper.py node parsing)."""
    s = nodelist or os.getenv("SLURM_NODELIST", "")
    if not s:
        return []
    if "[" not in s:
        return s.split(",")
    prefix, rest = s.split("[", 1)
    rest = rest.rstrip("]")
    nodes = []
    for part in rest.split(","):
        if "-" in part:
            a, b = part.split("-")
            width = len(a)
            for i in range(int(a), int(b) + 1):
                nodes.append(f"{prefix}{i:0{width}d}")
        else:
            nodes.append(prefix + part)
    return nodes


def slurm_launch_command(
    script: str,
    config_path: str,
    nodes: int = 1,
    tasks_per_node: int = 1,
    extra_env: Optional[dict] = None,
) -> List[str]:
    """Per-trial srun command (ref: deephyper.py launch-command builder)."""
    cmd = [
        "srun",
        f"--nodes={nodes}",
        f"--ntasks-per-node={tasks_per_node}",
        "--exact",
    ]
    for k, v in (extra_env or {}).items():
        cmd += [f"--export=ALL,{k}={v}"]
    cmd += ["python", script, config_path]
    return cmd
