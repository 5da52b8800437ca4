"""Test env: run JAX on CPU with 8 virtual devices so multi-chip sharding
logic is exercised without TPU hardware (the JAX analogue of the reference's
``mpirun -n 2 --oversubscribe`` CI job; ref: .github/workflows/CI.yml:49-55).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# jax may already be imported (axon sitecustomize); env alone is too late then
import jax

jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
