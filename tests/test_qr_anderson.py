"""Batched Householder QR fallback + Anderson acceleration (NGMRES role)."""

import jax.numpy as jnp
import numpy as np
import pytest

from janus_tpu.linalg.qr import qr_linsolve, qr_factor
from janus_tpu.control.anderson import anderson_solve


@pytest.mark.parametrize("d", [2, 4, 6])
def test_qr_solve_matches_numpy(rng, d):
    m = 9
    a = jnp.asarray(rng.standard_normal((m, d, d))) + 2.0 * jnp.eye(d)
    b = jnp.asarray(rng.standard_normal((m, d)))
    x = qr_linsolve(a, b)
    expect = np.linalg.solve(np.asarray(a), np.asarray(b)[..., None])[..., 0]
    np.testing.assert_allclose(x, expect, rtol=1e-9, atol=1e-11)


def test_qr_handles_lu_hostile(rng):
    """Matrix with pathological pivoting structure (zero leading pivot)."""
    a = jnp.asarray([[[0.0, 1.0], [1.0, 1e-14]]])
    b = jnp.asarray([[1.0, 2.0]])
    x = qr_linsolve(a, b)
    expect = np.linalg.solve(np.asarray(a), np.asarray(b)[..., None])[..., 0]
    np.testing.assert_allclose(x, expect, rtol=1e-9)


def test_qr_r_is_upper_triangular(rng):
    a = jnp.asarray(rng.standard_normal((3, 4, 4)))
    vs, r = qr_factor(a)
    low = np.tril(np.asarray(r), -1)
    np.testing.assert_allclose(low, 0.0, atol=1e-12)


def test_anderson_linear_system(rng):
    amat = jnp.asarray(rng.standard_normal((2, 3, 3))) * 0.1 + jnp.eye(3)
    bvec = jnp.asarray(rng.standard_normal((2, 3)))
    f = lambda x: bvec - jnp.einsum("mij,mj->mi", amat, x)
    res = anderson_solve(f, jnp.zeros((2, 3)), tol=1e-10)
    assert bool(jnp.all(res.converged))
    expect = np.linalg.solve(np.asarray(amat), np.asarray(bvec)[..., None])[..., 0]
    np.testing.assert_allclose(res.x, expect, rtol=1e-7, atol=1e-9)


def test_anderson_nonlinear_beats_picard():
    """cos fixed point: Anderson converges much faster than plain Picard."""
    f = lambda x: jnp.cos(x) - x       # root: Dottie number
    res = anderson_solve(f, jnp.full((1, 1), 0.0), tol=1e-12, beta=1.0)
    assert bool(res.converged[0])
    np.testing.assert_allclose(res.x[0, 0], 0.7390851332151607, rtol=1e-10)
    assert int(res.iters[0]) < 20      # plain Picard needs ~60+ for 1e-12
