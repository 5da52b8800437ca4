"""Step-scheduled device profiler (ref:
hydragnn/utils/profiling_and_tracing/profile.py:9-70).

torch.profiler's schedule(wait/warmup/active) + tensorboard trace becomes a
``jax.profiler`` trace window: after ``wait + warmup`` steps, capture
``active`` steps into a TensorBoard/XProf-readable trace directory. Same
config surface: ``Profile: {enable, wait, warmup, active, path}``.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


class Profiler:
    def __init__(self, config: Optional[dict] = None):
        config = config or {}
        self.enabled = bool(config.get("enable", 0))
        self.wait = int(config.get("wait", 5))
        self.warmup = int(config.get("warmup", 3))
        self.active = int(config.get("active", 3))
        self.path = config.get("path", "./logs/profile")
        self._step = 0
        self._tracing = False

    def setup(self, config: dict) -> None:
        self.__init__(config)

    def set_current_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def step(self) -> None:
        if not self.enabled:
            return
        start = self.wait + self.warmup
        if self._step == start and not self._tracing:
            os.makedirs(self.path, exist_ok=True)
            jax.profiler.start_trace(self.path)
            self._tracing = True
        if self._step == start + self.active and self._tracing:
            jax.profiler.stop_trace()
            self._tracing = False
            self.enabled = False  # one capture window, like the reference
        self._step += 1

    def close(self) -> None:
        if self._tracing:
            jax.profiler.stop_trace()
            self._tracing = False


def annotate(name: str):
    """Context manager: named region visible in XProf traces."""
    return jax.profiler.TraceAnnotation(name)
