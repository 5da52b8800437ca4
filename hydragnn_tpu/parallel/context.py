"""Ambient graph-parallel execution settings.

``enable_halo_exchange(mesh, axis)`` makes every conv-stack aggregation
(ops.segment.gather_scatter_sum/mean) on a halo-partitioned batch
(parallel/halo.partition_batch) run as an explicit shard_map island — ONE
all_to_all of the static halo overlapped with local aggregation — while the
rest of the model stays under GSPMD jit. Sticky, not scoped: jit retraces
must see the same setting, so enable it once for the life of the program
(tests use try/finally around a single trace)."""

from __future__ import annotations

from typing import Optional, Tuple

_HALO: Optional[Tuple] = None


def enable_halo_exchange(mesh, axis: str = "graph") -> None:
    global _HALO
    _HALO = (mesh, axis)


def disable_halo_exchange() -> None:
    global _HALO
    _HALO = None


def halo_exchange_config() -> Optional[Tuple]:
    return _HALO
