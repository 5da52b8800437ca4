"""HydraGNN-TPU: a TPU-native (JAX/XLA/Pallas/pjit) multi-task graph neural
network framework with the capabilities of HydraGNN (ArCho48/HydraGNN-gps-support).

Design (TPU-first, not a port):
  - Static-shape padded ``GraphBatch`` containers (vs PyG dynamic ``Data``/``Batch``),
    bucketed padding to bound recompiles.
  - Message passing as gather + masked segment reductions, with Pallas TPU kernels
    for the aggregation hot path and XLA ``segment_sum`` fallback.
  - SPMD data parallelism via ``jax.sharding.Mesh`` + ``jax.jit`` sharding
    (vs torch DDP/NCCL), collectives over ICI.
  - Functional training step (optax) with ``jax.grad``; forces as
    ``-d(energy)/d(pos)`` via nested autodiff (vs torch autograd.grad).

Reference parity map: see SURVEY.md. Reference call sites are cited in
docstrings as ``ref: <file>:<line>`` (paths relative to the HydraGNN repo).
"""

__version__ = "0.1.0"

import os as _os

# Honor JAX_PLATFORMS even when a site hook (e.g. a PJRT plugin's
# sitecustomize) has already pinned jax_platforms at interpreter start —
# subprocess smoke tests and CI set JAX_PLATFORMS=cpu and expect it to win.
_plat = _os.environ.get("JAX_PLATFORMS")
if _plat:
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _plat)
    except Exception:  # pragma: no cover - config may be frozen post-init
        pass

from hydragnn_tpu.graph import GraphSample, GraphBatch, collate, pad_sizes
from hydragnn_tpu.config import load_config, update_config
from hydragnn_tpu.models.create import create_model, create_model_config
from hydragnn_tpu.train.trainer import train_validate_test
from hydragnn_tpu.run import run_training, run_prediction
