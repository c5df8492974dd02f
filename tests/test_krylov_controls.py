"""Newton–Krylov (matrix-free GMRES) + piecewise-control helpers."""

import jax.numpy as jnp
import numpy as np

from janus_tpu.control.krylov import newton_krylov
from janus_tpu.models.controls import piecewise_constant, piecewise_linear
from janus_tpu.models.problems import vdp_rhs
from janus_tpu.solve import solve_ivp


def test_newton_krylov_bratu_line():
    """1-D Bratu-style nonlinear line problem (method-of-lines flavor, the
    PETSc meinhart/pseudo-transient use case), N=64, matrix-free."""
    n = 64
    hgrid = 1.0 / (n + 1)

    def residual(x):
        lap = (jnp.roll(x, 1, -1) + jnp.roll(x, -1, -1) - 2 * x)
        lap = lap.at[..., 0].set(x[..., 1] - 2 * x[..., 0])
        lap = lap.at[..., -1].set(x[..., -2] - 2 * x[..., -1])
        return lap / hgrid ** 2 + 2.0 * jnp.exp(x)

    x0 = jnp.zeros((2, n))
    res = newton_krylov(residual, x0, tol=1e-8)
    assert bool(jnp.all(res.converged))
    np.testing.assert_allclose(residual(res.x), 0.0, atol=1e-7)
    assert float(jnp.max(res.x)) > 0.1      # nontrivial solution


def test_newton_krylov_matches_dense():
    from janus_tpu.control import newton_solve
    f = lambda x: x ** 3 + x - jnp.arange(1.0, 4.0)
    x0 = jnp.ones((1, 3))
    a = newton_krylov(f, x0, tol=1e-10)
    b = newton_solve(f, x0, tol=1e-10)
    np.testing.assert_allclose(a.x, b.x, rtol=1e-8)


def test_piecewise_constant_control_in_solver():
    """Bang-bang forcing through the adaptive solver."""
    knots = jnp.array([0.0, 1.0, 2.0])
    vals = jnp.array([1.0, -1.0])
    u = piecewise_constant(knots, vals)

    def rhs(t, y, args):
        return jnp.broadcast_to(u(t)[..., None], y.shape)

    sol = solve_ivp(rhs, (0.0, 2.0), jnp.zeros((1, 1)), method="dopri5",
                    rtol=1e-9, atol=1e-12, options=None,
                    t_eval=jnp.array([0.5, 1.0, 1.5, 2.0]))
    # ∫u: 0.5, 1.0, then back down 0.5, 0.0
    np.testing.assert_allclose(sol.ys[0, :, 0], [0.5, 1.0, 0.5, 0.0],
                               atol=1e-6)


def test_piecewise_linear():
    u = piecewise_linear(jnp.array([0.0, 1.0]), jnp.array([0.0, 2.0]))
    np.testing.assert_allclose(u(jnp.array([0.25, 0.5])), [0.5, 1.0])
