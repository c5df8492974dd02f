"""Krylov preconditioners (reference GMRES+ILU role, linsolve.py:60-111).

Structure-exploiting TPU-native preconditioners: block-Jacobi (colored-probe
diagonal blocks + batched LU) and tridiagonal (3-probe band + Thomas scan).
Checked against dense solves and exercised inside newton_krylov on a stiff
method-of-lines boundary-value residual.
"""

import jax
import jax.numpy as jnp
import numpy as np

from janus_tpu.control import (
    block_jacobi_precond,
    newton_krylov,
    newton_solve,
    probe_colored_jacobian,
    tridiag_precond,
    tridiag_solve,
)

N = 24


def mol_residual(x):
    """Steady 1-D reaction-diffusion: u'' + lam*(u - u^3) + s(z) = 0,
    Dirichlet 0 ends, 3-point stencil -> exactly tridiagonal Jacobian."""
    m, n = x.shape
    h = 1.0 / (n + 1)
    z = jnp.linspace(h, 1.0 - h, n)
    lam = 6.0
    left = jnp.concatenate([jnp.zeros((m, 1), x.dtype), x[:, :-1]], axis=-1)
    right = jnp.concatenate([x[:, 1:], jnp.zeros((m, 1), x.dtype)], axis=-1)
    upp = (left - 2.0 * x + right) / h**2
    return upp + lam * (x - x**3) + 40.0 * jnp.sin(jnp.pi * z)[None, :]


def test_tridiag_solve_vs_dense():
    rng = np.random.RandomState(1)
    m = 5
    d = jnp.asarray(rng.randn(m, N)) + 4.0
    dl = jnp.asarray(rng.randn(m, N)) * 0.5
    du = jnp.asarray(rng.randn(m, N)) * 0.5
    dl = dl.at[:, 0].set(0.0)
    du = du.at[:, -1].set(0.0)
    b = jnp.asarray(rng.randn(m, N))
    x = tridiag_solve(dl, d, du, b)
    for i in range(m):
        T = np.diag(np.asarray(d[i])) + np.diag(np.asarray(du[i, :-1]), 1) \
            + np.diag(np.asarray(dl[i, 1:]), -1)
        np.testing.assert_allclose(np.asarray(x[i]),
                                   np.linalg.solve(T, np.asarray(b[i])),
                                   rtol=1e-9, atol=1e-10)


def test_probe_colored_recovers_tridiagonal():
    x = jnp.asarray(np.random.RandomState(2).randn(2, N))
    J = jax.vmap(jax.jacfwd(lambda v: mol_residual(v[None])[0]))(x)
    cols = probe_colored_jacobian(mol_residual, x, 3)
    # column j of J == cols[j % 3][:, :] restricted to rows |i-j|<=1
    for j in [0, 1, 7, N - 1]:
        exact = np.asarray(J[:, :, j])
        got = np.asarray(cols[j % 3])
        rows = [i for i in (j - 1, j, j + 1) if 0 <= i < N]
        np.testing.assert_allclose(got[:, rows], exact[:, rows],
                                   rtol=1e-6, atol=1e-8)


def test_tridiag_precond_is_exact_inverse_here():
    """Jacobian of mol_residual IS tridiagonal -> M^-1 v == J^-1 v."""
    x = jnp.asarray(np.random.RandomState(3).randn(3, N)) * 0.1
    J = jax.vmap(jax.jacfwd(lambda v: mol_residual(v[None])[0]))(x)
    apply = tridiag_precond(mol_residual, x)
    v = jnp.asarray(np.random.RandomState(4).randn(3, N))
    got = np.asarray(apply(v))
    want = np.stack([np.linalg.solve(np.asarray(J[i]), np.asarray(v[i]))
                     for i in range(3)])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_block_jacobi_matches_block_diagonal_inverse():
    """On a genuinely block-diagonal map the preconditioner is exact."""
    rng = np.random.RandomState(5)
    b, nb, m = 4, 6, 3
    n = b * nb
    A = np.zeros((m, n, n))
    for i in range(m):
        for k in range(nb):
            blk = rng.randn(b, b) + 3.0 * np.eye(b)
            A[i, k * b:(k + 1) * b, k * b:(k + 1) * b] = blk
    Aj = jnp.asarray(A)

    def f(x):
        return jnp.einsum("mij,mj->mi", Aj, x)

    apply = block_jacobi_precond(f, jnp.zeros((m, n)), b)
    v = jnp.asarray(rng.randn(m, n))
    want = np.stack([np.linalg.solve(A[i], np.asarray(v[i]))
                     for i in range(m)])
    np.testing.assert_allclose(np.asarray(apply(v)), want,
                               rtol=1e-5, atol=1e-7)


def test_newton_krylov_preconditioned_bvp():
    """Stiff MOL BVP: the unpreconditioned GMRES (tight iteration budget)
    stalls; tridiag/block-Jacobi preconditioning converges — and matches the
    dense-Jacobian Newton answer."""
    x0 = jnp.zeros((2, N))
    budget = dict(tol=1e-8, max_iter=12, gmres_tol=1e-6,
                  gmres_restart=5, gmres_maxiter=1)

    res_tri = newton_krylov(mol_residual, x0, precond="tridiag", **budget)
    assert bool(jnp.all(res_tri.converged)), np.asarray(res_tri.fnorm)

    # block-Jacobi drops the stencil coupling at block boundaries, so it
    # needs a slightly larger Krylov budget on this 1-D chain than tridiag
    # (which is exact here) — still far below the unpreconditioned need
    res_bj = newton_krylov(mol_residual, x0, precond="block_jacobi",
                           precond_block=4, tol=1e-8, max_iter=12,
                           gmres_tol=1e-6, gmres_restart=10, gmres_maxiter=2)
    assert bool(jnp.all(res_bj.converged)), np.asarray(res_bj.fnorm)

    res_none = newton_krylov(mol_residual, x0, **budget)

    dense = newton_solve(mol_residual, x0, tol=1e-10)
    assert bool(jnp.all(dense.converged))
    np.testing.assert_allclose(np.asarray(res_tri.x), np.asarray(dense.x),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(res_bj.x), np.asarray(dense.x),
                               rtol=1e-5, atol=1e-7)
    # preconditioning must beat the unpreconditioned run under this budget
    assert (not bool(jnp.all(res_none.converged))) or \
        float(jnp.max(res_none.fnorm)) > float(jnp.max(res_tri.fnorm)) or \
        int(jnp.max(res_none.iters)) > int(jnp.max(res_tri.iters))
