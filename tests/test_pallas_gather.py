"""Pallas DMA row-gather: interpreter-mode correctness + VJP parity.

On the CPU test mesh the kernel runs through the Pallas interpreter; the
compiled TPU path is exercised by bench.py / dev_scripts probes.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgnerf_tpu.ops.pallas_gather import gather_rows_pallas


@pytest.mark.parametrize("dtype", [jnp.int16, jnp.float32])
def test_gather_matches_xla(dtype):
    rng = np.random.default_rng(0)
    T, ROW, S = 257, 40, 133
    table = jnp.asarray(rng.standard_normal((T, ROW))).astype(dtype)
    idx = jnp.asarray(rng.integers(0, T, (S,), dtype=np.int32))
    out = gather_rows_pallas(table, idx, 4, True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(table)[idx])


def test_gather_multidim_idx():
    rng = np.random.default_rng(1)
    T, ROW = 64, 8
    table = jnp.asarray(rng.standard_normal((T, ROW)), dtype=jnp.float32)
    idx = jnp.asarray(rng.integers(0, T, (6, 5, 4), dtype=np.int32))
    out = gather_rows_pallas(table, idx, 4, True)
    assert out.shape == (6, 5, 4, ROW)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(table)[np.asarray(idx)])


def test_gather_vjp_matches_xla_gather_vjp():
    rng = np.random.default_rng(2)
    T, ROW, S = 32, 8, 96  # duplicate indices guaranteed
    table = jnp.asarray(rng.standard_normal((T, ROW)), dtype=jnp.float32)
    idx = jnp.asarray(rng.integers(0, T, (S,), dtype=np.int32))
    g = jnp.asarray(rng.standard_normal((S, ROW)), dtype=jnp.float32)

    _, vjp_p = jax.vjp(lambda t: gather_rows_pallas(t, idx, 4, True), table)
    _, vjp_x = jax.vjp(lambda t: t[idx], table)
    np.testing.assert_allclose(np.asarray(vjp_p(g)[0]),
                               np.asarray(vjp_x(g)[0]), rtol=1e-6, atol=1e-6)

