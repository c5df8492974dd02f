"""Nonlinear PMP optimal control of VdP (the reference's L3 flagship family)
— compact version of examples/vdp_pmp_energy.py."""

import jax.numpy as jnp
import numpy as np

from janus_tpu.control import (newton_solve, single_shooting,
                               multiple_shooting_residual)
from janus_tpu.control.homotopy import homotopy
from janus_tpu.solve import solve_ivp, Options
import pytest

# heavy tier: large custom-vjp / jacfwd-through-solve compiles (CLAUDE.md
# suite-budget notes); excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

X0 = jnp.array([1.0, 0.5])
TF = 2.0


def pmp_rhs(t, y, mu):
    x1, x2, p1, p2 = y[..., 0], y[..., 1], y[..., 2], y[..., 3]
    mu = jnp.broadcast_to(jnp.asarray(mu, y.dtype), x1.shape)
    return jnp.stack([
        x2,
        mu * (1 - x1 ** 2) * x2 - x1 - p2,
        p2 * (2 * mu * x1 * x2 + 1.0),
        -p1 - p2 * mu * (1 - x1 ** 2),
    ], axis=-1)


def _ms_residual(mu, nseg=4):
    t_nodes = jnp.linspace(0.0, TF, nseg + 1)

    def bc(y_start, y_end):
        return jnp.concatenate([y_start[:, :2] - X0[None], y_end[:, :2]],
                               axis=-1)

    return multiple_shooting_residual(
        pmp_rhs, t_nodes, bc, method="radau", args=mu,
        options=Options(rtol=1e-8, atol=1e-11))


def test_single_shooting_mild():
    def residual(p0):
        y0 = jnp.concatenate([jnp.tile(X0[None], (p0.shape[0], 1)), p0],
                             axis=-1)
        sol = solve_ivp(pmp_rhs, (0.0, TF), y0, method="radau", args=1.0,
                        options=Options(rtol=1e-9, atol=1e-12))
        return sol.y[:, :2]

    res = single_shooting(residual, jnp.zeros((1, 2)), tol=1e-8)
    assert bool(res.converged[0])
    assert float(res.fnorm[0]) < 1e-8


def test_multishoot_homotopy_to_stiff():
    """Continuation 0 → μ=5 on the multiple-shooting unknowns."""
    nseg = 4
    res = newton_solve(_ms_residual(0.0, nseg),
                       jnp.tile(jnp.concatenate([X0, jnp.zeros(2)])[None],
                                (1, nseg)).reshape(1, -1), tol=1e-8)
    assert bool(res.converged[0])

    mu_t = 5.0

    def g(z, lam):
        return _ms_residual(lam * mu_t, nseg)(z)

    h = homotopy(g, res.x, dlam0=0.5, tol=1e-6, newton_iters=5)
    assert bool(h.converged[0]), float(h.lam[0])
    final = _ms_residual(mu_t, nseg)(h.x)
    assert float(jnp.linalg.norm(final)) < 1e-6
    # terminal state actually reaches the origin when integrated forward
    y0 = h.x[:, :4]
    sol = solve_ivp(pmp_rhs, (0.0, TF), y0, method="radau", args=mu_t,
                    options=Options(rtol=1e-10, atol=1e-13))
    np.testing.assert_allclose(sol.y[0, :2], 0.0, atol=1e-5)
