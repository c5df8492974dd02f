"""Batched LU parity vs numpy/scipy + JVP factorization-reuse correctness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from janus_tpu.linalg import lu_factor, lu_solve, linsolve, solve_real_complex
from janus_tpu.linalg.smalllu import lu_ok


@pytest.mark.parametrize("d", [1, 2, 3, 5, 8])
def test_solve_matches_numpy(rng, d):
    m = 7
    a = jnp.asarray(rng.standard_normal((m, d, d))) + 3.0 * jnp.eye(d)
    b = jnp.asarray(rng.standard_normal((m, d)))
    x = linsolve(a, b)
    expect = np.linalg.solve(np.asarray(a), np.asarray(b)[..., None])[..., 0]
    np.testing.assert_allclose(x, expect, rtol=1e-9, atol=1e-11)


def test_solve_needs_pivoting(rng):
    """Zero leading pivot forces row exchange."""
    a = jnp.asarray([[[0.0, 1.0], [1.0, 0.0]],
                     [[1e-14, 1.0], [1.0, 1.0]]])
    b = jnp.asarray([[2.0, 3.0], [1.0, 2.0]])
    x = linsolve(a, b)
    expect = np.linalg.solve(np.asarray(a), np.asarray(b)[..., None])[..., 0]
    np.testing.assert_allclose(x, expect, rtol=1e-9)


def test_multi_rhs(rng):
    m, d, k = 4, 5, 3
    a = jnp.asarray(rng.standard_normal((m, d, d))) + 3.0 * jnp.eye(d)
    b = jnp.asarray(rng.standard_normal((m, d, k)))
    x = linsolve(a, b)
    np.testing.assert_allclose(x, np.linalg.solve(np.asarray(a),
                                                  np.asarray(b)), rtol=1e-9)


def test_lu_ok_flags_singular(rng):
    a = jnp.stack([jnp.eye(3),
                   jnp.ones((3, 3))])  # second is singular
    lu, piv = lu_factor(a)
    ok = lu_ok(lu)
    assert bool(ok[0]) and not bool(ok[1])


def test_jvp_rule_vs_fd(rng):
    m, d = 3, 4
    a = jnp.asarray(rng.standard_normal((m, d, d))) + 3.0 * jnp.eye(d)
    b = jnp.asarray(rng.standard_normal((m, d)))
    da = jnp.asarray(rng.standard_normal((m, d, d)))
    db = jnp.asarray(rng.standard_normal((m, d)))
    x, dx = jax.jvp(linsolve, (a, b), (da, db))
    eps = 1e-7
    fd = (np.linalg.solve(np.asarray(a + eps * da),
                          np.asarray(b + eps * db)[..., None])[..., 0]
          - np.linalg.solve(np.asarray(a - eps * da),
                            np.asarray(b - eps * db)[..., None])[..., 0]) / (2 * eps)
    np.testing.assert_allclose(dx, fd, rtol=1e-6, atol=1e-8)


def test_grad_through_linsolve(rng):
    """Reverse mode falls out of the JVP via transposition-free... JAX derives
    a VJP by transposing the linear JVP; verify against FD."""
    d = 3
    a = jnp.asarray(rng.standard_normal((1, d, d))) + 3.0 * jnp.eye(d)
    b = jnp.asarray(rng.standard_normal((1, d)))

    def loss(a):
        return jnp.sum(linsolve(a, b) ** 2)

    g = jax.grad(loss)(a)
    eps = 1e-6
    gfd = np.zeros_like(np.asarray(a))
    for i in range(d):
        for j in range(d):
            e = np.zeros_like(np.asarray(a))
            e[0, i, j] = eps
            gfd[0, i, j] = (loss(a + e) - loss(a - e)) / (2 * eps)
    np.testing.assert_allclose(g, gfd, rtol=1e-5, atol=1e-7)


def test_complex_block_solve(rng):
    m, d = 5, 4
    ar = np.asarray(rng.standard_normal((m, d, d))) + 3 * np.eye(d)
    ai = np.asarray(rng.standard_normal((m, d, d)))
    br = np.asarray(rng.standard_normal((m, d)))
    bi = np.asarray(rng.standard_normal((m, d)))
    xr, xi = solve_real_complex(jnp.asarray(ar), jnp.asarray(ai),
                                jnp.asarray(br), jnp.asarray(bi))
    expect = np.linalg.solve(ar + 1j * ai, (br + 1j * bi)[..., None])[..., 0]
    np.testing.assert_allclose(xr, expect.real, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(xi, expect.imag, rtol=1e-9, atol=1e-11)


def test_vmapped_jvp_sensitivity_columns(rng):
    """N tangent directions through one solve (the solve_LUdual pattern)."""
    m, d, n = 2, 3, 4
    a = jnp.asarray(rng.standard_normal((m, d, d))) + 3.0 * jnp.eye(d)
    b = jnp.asarray(rng.standard_normal((m, d)))
    das = jnp.asarray(rng.standard_normal((n, m, d, d)))
    dbs = jnp.asarray(rng.standard_normal((n, m, d)))
    _, dxs = jax.vmap(lambda da, db: jax.jvp(linsolve, (a, b), (da, db)))(
        das, dbs)
    for k in range(n):
        _, expect = jax.jvp(linsolve, (a, b), (das[k], dbs[k]))
        np.testing.assert_allclose(dxs[k], expect, rtol=1e-10)
