"""Region tracer (ref: hydragnn/utils/profiling_and_tracing/tracer.py:14-167).

GPTL/Score-P are replaced by a host-side named-region timer registry plus
``jax.profiler`` trace annotations (TraceAnnotation shows regions in
TensorBoard/XProf). ``HYDRAGNN_TRACE_LEVEL=1`` adds a device sync
(``block_until_ready`` analogue of torch.cuda.synchronize) per region stop
for accurate attribution.
"""

from __future__ import annotations

import os
import time
from collections import defaultdict
from functools import wraps
from typing import Dict, Optional

import jax

_enabled = True
_starts: Dict[str, float] = {}
_totals: Dict[str, float] = defaultdict(float)
_counts: Dict[str, int] = defaultdict(int)
_annotations: Dict[str, object] = {}


def _sync() -> None:
    if os.getenv("HYDRAGNN_TRACE_LEVEL", "0") == "1":
        (jax.device_put(0.0) + 0).block_until_ready()


def enable() -> None:
    global _enabled
    _enabled = True


def disable() -> None:
    global _enabled
    _enabled = False


def reset() -> None:
    _starts.clear()
    _totals.clear()
    _counts.clear()


def start(name: str) -> None:
    if not _enabled:
        return
    ann = jax.profiler.TraceAnnotation(name)
    ann.__enter__()
    _annotations[name] = ann
    _starts[name] = time.perf_counter()


def stop(name: str) -> None:
    if not _enabled or name not in _starts:
        return
    _sync()
    _totals[name] += time.perf_counter() - _starts.pop(name)
    _counts[name] += 1
    ann = _annotations.pop(name, None)
    if ann is not None:
        ann.__exit__(None, None, None)


def profile(name: Optional[str] = None):
    """Decorator (ref: tracer.py:145-167)."""

    def deco(fn):
        region = name or fn.__name__

        @wraps(fn)
        def wrapper(*args, **kwargs):
            start(region)
            try:
                return fn(*args, **kwargs)
            finally:
                stop(region)

        return wrapper

    return deco


def summary() -> Dict[str, Dict[str, float]]:
    return {
        k: {"total_s": _totals[k], "count": _counts[k]}
        for k in sorted(_totals)
    }


def print_report() -> None:
    for k, v in summary().items():
        print(f"[tracer] {k}: {v['total_s']:.4f}s over {v['count']} calls")
