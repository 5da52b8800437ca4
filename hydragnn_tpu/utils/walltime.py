"""Walltime guard (ref: hydragnn/utils/distributed/distributed.py:394-419).

Each epoch rank 0 probes remaining job time (SLURM ``squeue -h -j $JOBID -o
%L``, or the ``HYDRAGNN_WALLTIME_DEADLINE`` unix-seconds env for non-SLURM
schedulers) and the boolean stop decision is broadcast to all processes via a
device collective (the reference uses torch.distributed broadcast)."""

from __future__ import annotations

import os
import subprocess
import time
from typing import Optional

import numpy as np


def _parse_slurm_remaining(s: str) -> Optional[float]:
    """'D-HH:MM:SS' / 'HH:MM:SS' / 'MM:SS' -> seconds."""
    s = s.strip()
    if not s or s in ("INVALID", "NOT_SET", "UNLIMITED"):
        return None
    days = 0
    if "-" in s:
        d, s = s.split("-", 1)
        days = int(d)
    parts = [int(p) for p in s.split(":")]
    while len(parts) < 3:
        parts.insert(0, 0)
    h, m, sec = parts
    return ((days * 24 + h) * 60 + m) * 60 + sec


def remaining_seconds() -> Optional[float]:
    deadline = os.getenv("HYDRAGNN_WALLTIME_DEADLINE")
    if deadline:
        return float(deadline) - time.time()
    jobid = os.getenv("SLURM_JOB_ID")
    if jobid:
        try:
            out = subprocess.check_output(
                ["squeue", "-h", "-j", jobid, "-o", "%L"],
                timeout=10,
            ).decode()
            return _parse_slurm_remaining(out)
        except Exception:
            return None
    return None


def check_remaining(epoch_seconds: float, margin: float = 2.0) -> bool:
    """True if there is time for another epoch (rank-0 decision broadcast
    across processes). ``margin`` epochs of headroom are required."""
    import jax

    if jax.process_index() == 0:
        rem = remaining_seconds()
        ok = rem is None or rem > margin * max(epoch_seconds, 1.0)
    else:
        ok = True
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        ok = bool(
            multihost_utils.broadcast_one_to_all(np.asarray(ok, np.bool_))
        )
    return ok
