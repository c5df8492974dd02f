"""Pallas small-LU kernels (interpret mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from janus_tpu.ops import linsolve_fused, lu_factor_t, lu_solve_t


@pytest.mark.parametrize("d", [2, 3, 4, 6])
def test_fused_solve_matches_numpy(rng, d):
    m = 1024
    a = jnp.asarray(rng.standard_normal((m, d, d)), jnp.float32) \
        + 5.0 * jnp.eye(d, dtype=jnp.float32)
    b = jnp.asarray(rng.standard_normal((m, d)), jnp.float32)
    a_t = jnp.transpose(a, (1, 2, 0)).reshape(d * d, m)
    x_t = linsolve_fused(a_t, b.T, interpret=True)
    expect = np.linalg.solve(np.asarray(a, np.float64),
                             np.asarray(b, np.float64)[..., None])[..., 0]
    np.testing.assert_allclose(x_t.T, expect, rtol=2e-4, atol=2e-4)


def test_factor_then_solve(rng):
    m, d = 512, 3
    a = jnp.asarray(rng.standard_normal((m, d, d)), jnp.float32) \
        + 4.0 * jnp.eye(d, dtype=jnp.float32)
    b = jnp.asarray(rng.standard_normal((m, d)), jnp.float32)
    a_t = jnp.transpose(a, (1, 2, 0)).reshape(d * d, m)
    lu_t = lu_factor_t(a_t, interpret=True)
    x_t = lu_solve_t(lu_t, b.T, interpret=True)
    fused = linsolve_fused(a_t, b.T, interpret=True)
    np.testing.assert_allclose(x_t, fused, rtol=1e-6)


def test_nonmultiple_tile_batch(rng):
    """Batch not a multiple of the tile size still works (cdiv grid)."""
    m, d = 700, 2
    a = jnp.asarray(rng.standard_normal((m, d, d)), jnp.float32) \
        + 4.0 * jnp.eye(d, dtype=jnp.float32)
    b = jnp.asarray(rng.standard_normal((m, d)), jnp.float32)
    a_t = jnp.transpose(a, (1, 2, 0)).reshape(d * d, m)
    x_t = linsolve_fused(a_t, b.T, interpret=True)
    expect = np.linalg.solve(np.asarray(a, np.float64),
                             np.asarray(b, np.float64)[..., None])[..., 0]
    np.testing.assert_allclose(x_t.T, expect, rtol=2e-4, atol=2e-4)
