"""Named cumulative timers (ref: hydragnn/utils/profiling_and_tracing/time_utils.py:22-138).

The reference reduces MIN/MAX/AVG across ranks at every ``stop()`` (a device
collective per region interval, time_utils.py:60-80). TPU-native redesign:
timers accumulate locally and the cross-process reduction happens ONCE in
``print_timers`` via ``multihost_utils.process_allgather`` — one host-side
collective for all timers instead of three per stop. The reported statistics
are therefore MIN/MAX/AVG over each rank's cumulative total (the stat the
reference's per-interval accumulation converges to for aligned call
patterns, which region timers in an SPMD step loop always are).
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import numpy as np

_registry: Dict[str, "Timer"] = {}


class Timer:
    def __init__(self, name: str):
        self.name = name
        prev = _registry.get(name)
        self.elapsed = prev.elapsed if prev is not None else 0.0
        self.calls = prev.calls if prev is not None else 0
        self._start = None
        _registry[name] = self

    def start(self):
        self._start = time.perf_counter()
        self.calls += 1

    def stop(self):
        if self._start is not None:
            self.elapsed += time.perf_counter() - self._start
            self._start = None


def reset_timers():
    _registry.clear()


def reduce_timers() -> Optional[Dict[str, Dict[str, float]]]:
    """Cross-process MIN/MAX/AVG of each named timer's cumulative total
    (ref: time_utils.py:95-138 reduces over ranks before printing).
    Returns {name: {min, max, avg}} when more than one JAX process is
    initialized, None single-process. Collective: every process must call."""
    import jax

    if jax.process_count() <= 1:
        return None
    names = sorted(_registry)
    vals = np.asarray([_registry[n].elapsed for n in names], np.float64)
    from jax.experimental import multihost_utils

    allv = np.asarray(multihost_utils.process_allgather(vals))  # [P, k]
    return {
        n: {
            "min": float(allv[:, i].min()),
            "max": float(allv[:, i].max()),
            "avg": float(allv[:, i].mean()),
        }
        for i, n in enumerate(names)
    }


def print_timers(verbosity: int = 0):
    """Local timers always; with >1 process additionally the reduced
    MIN/MAX/AVG tables, printed once (process 0) — the reference's
    print_timers contract (time_utils.py:95-138)."""
    import jax

    for name, t in sorted(
        _registry.items(), key=lambda kv: kv[1].elapsed, reverse=True
    ):
        print(
            f"[timer] process {jax.process_index()} - {name}: "
            f"{t.elapsed:.4f}s ({t.calls} calls)"
        )
    stats = reduce_timers()
    if stats is not None and jax.process_index() == 0:
        for label in ("min", "max", "avg"):
            print(f"[timer] {label.capitalize()} timers:")
            for name, s in sorted(
                stats.items(), key=lambda kv: kv[1][label], reverse=True
            ):
                print(f"[timer]   {name}: {s[label]:.4f}s")
