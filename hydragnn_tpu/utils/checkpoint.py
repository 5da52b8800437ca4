"""Checkpoint save/load (ref: hydragnn/utils/model/model.py:63-149,305-363).

Single-file msgpack checkpoints (flax.serialization) of the full TrainState
pytree {params, batch_stats, opt_state, step} — the analogue of the
reference's single ``.pk`` with model+optimizer state. Per-epoch files plus a
"best" symlink mirror the reference layout. For sharded multi-host arrays use
``save_checkpoint_orbax`` (orbax) instead.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
from flax import serialization


def _ckpt_file(path: str, epoch: Optional[int]) -> str:
    name = "checkpoint.msgpack" if epoch is None else f"checkpoint_ep{epoch}.msgpack"
    return os.path.join(path, name)


def save_checkpoint(path: str, state: Any, epoch: Optional[int] = None) -> str:
    if jax.process_index() != 0:
        return _ckpt_file(path, epoch)
    os.makedirs(path, exist_ok=True)
    host_state = jax.device_get(state)
    data = serialization.to_bytes(host_state)
    fname = _ckpt_file(path, epoch)
    with open(fname, "wb") as f:
        f.write(data)
    # best-symlink convention (ref: model.py:77-104)
    link = os.path.join(path, "best.msgpack")
    try:
        if os.path.islink(link) or os.path.exists(link):
            os.remove(link)
        os.symlink(os.path.basename(fname), link)
    except OSError:
        pass
    return fname


def load_checkpoint(path: str, template_state: Any, epoch: Optional[int] = None):
    fname = _ckpt_file(path, epoch)
    if not os.path.exists(fname):
        best = os.path.join(path, "best.msgpack")
        if os.path.exists(best):
            fname = best
        else:
            raise FileNotFoundError(fname)
    with open(fname, "rb") as f:
        data = f.read()
    return serialization.from_bytes(template_state, data)


def save_checkpoint_orbax(path: str, state: Any, step: int = 0) -> None:
    """Sharded multi-host checkpoint via orbax."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(os.path.abspath(path), f"orbax_{step}"), state)
    ckptr.wait_until_finished()


def load_checkpoint_orbax(path: str, template_state: Any, step: int = 0):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(
        os.path.join(os.path.abspath(path), f"orbax_{step}"), template_state
    )
