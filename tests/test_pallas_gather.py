"""Windowed one-hot gather kernel correctness (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hydragnn_tpu.ops.pallas_gather import gather_rows_windowed


@pytest.fixture(autouse=True)
def _interpret():
    from jax.experimental.pallas import tpu as pltpu

    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def test_gather_windowed_local_ids_exact():
    rng = np.random.RandomState(0)
    N, F, E = 4096, 128, 6000
    x = jnp.asarray(rng.randn(N, F).astype(np.float32))
    front = np.sort(rng.randint(0, N, E)).astype(np.int32)
    ids = np.clip(front + rng.randint(-100, 100, E), 0, N - 1).astype(
        np.int32
    )
    got = np.asarray(
        gather_rows_windowed(x, jnp.asarray(ids), tile=512, window=512)
    )
    np.testing.assert_array_equal(got, np.asarray(x)[ids])  # bit-exact (p3)


def test_gather_windowed_scattered_ids_fallback():
    rng = np.random.RandomState(1)
    N, F, E = 4096, 128, 3000
    x = jnp.asarray(rng.randn(N, F).astype(np.float32))
    ids = rng.randint(0, N, E).astype(np.int32)  # span >> window
    got = np.asarray(
        gather_rows_windowed(x, jnp.asarray(ids), tile=512, window=512)
    )
    np.testing.assert_array_equal(got, np.asarray(x)[ids])


def test_gather_windowed_bf16_and_fchunk():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1024, 512).astype(np.float32))
    ids = np.sort(rng.randint(0, 1024, 3000)).astype(np.int32)
    got = np.asarray(
        gather_rows_windowed(x, jnp.asarray(ids), tile=512, window=512)
    )
    np.testing.assert_array_equal(got, np.asarray(x)[ids])
    xb = x.astype(jnp.bfloat16)
    gotb = gather_rows_windowed(xb, jnp.asarray(ids), tile=512, window=512)
    np.testing.assert_array_equal(
        np.asarray(gotb.astype(jnp.float32)),
        np.asarray(xb.astype(jnp.float32))[ids],
    )
