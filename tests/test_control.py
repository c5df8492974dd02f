"""Control layer: LQR-PMP shooting vs Riccati oracle, Ψtc on Newton-hostile
problems, homotopy continuation, augmented Lagrangian KKT check.

These cover the reference's L3 workloads (SURVEY §2.3) as generic algorithms;
the LQR config is BASELINE.json config 3."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp as ss

# slow tier (re-tiered from the measured round-5 fast-tier survey:
# jacfwd-through-solve compiles, 262 s measured; the deeper L3 coverage
# — the PMP files — was already slow-marked)
pytestmark = pytest.mark.slow

from janus_tpu.control import (
    newton_solve, psitc, homotopy, augmented_lagrangian,
    single_shooting, multiple_shooting_residual,
)
from janus_tpu.control.homotopy import convex_homotopy
from janus_tpu.solve import solve_ivp, Options

# LQR data: ẋ = a x + b u, J = ½∫ q x² + r u² dt, u* = −(b/r)p
A_, B_, Q_, R_, T_ = -1.0, 1.0, 2.0, 1.0, 1.0


def lqr_aug_rhs(t, y, args):
    """y = [x, p]: closed-loop PMP dynamics."""
    x, p = y[..., 0], y[..., 1]
    dx = A_ * x - (B_ ** 2 / R_) * p
    dp = -Q_ * x - A_ * p
    return jnp.stack([dx, dp], axis=-1)


def riccati_p0():
    """Oracle: integrate the Riccati ODE backwards, P(T)=0."""
    sol = ss(lambda t, P: -(2 * A_ * P - (B_ ** 2 / R_) * P ** 2 + Q_),
             (T_, 0.0), [0.0], rtol=1e-12, atol=1e-14)
    return sol.y[0, -1]


def test_lqr_single_shooting_vs_riccati():
    x0s = jnp.array([1.0, 2.0, -0.5])
    m = 3

    def residual(p0):
        y0 = jnp.stack([x0s, p0[:, 0]], axis=-1)
        sol = solve_ivp(lqr_aug_rhs, (0.0, T_), y0, method="radau",
                        rtol=1e-10, atol=1e-13)
        return sol.y[:, 1:2]            # p(T) = 0

    res = single_shooting(residual, jnp.zeros((m, 1)), tol=1e-10)
    assert bool(jnp.all(res.converged))
    p0_expect = riccati_p0() * np.asarray(x0s)
    np.testing.assert_allclose(res.x[:, 0], p0_expect, rtol=1e-7)


def test_lqr_multiple_shooting():
    x0 = 1.5
    t_nodes = jnp.linspace(0.0, T_, 5)   # 4 segments

    def bc(y_start, y_end):
        return jnp.stack([y_start[:, 0] - x0, y_end[:, 1]], axis=-1)

    residual = multiple_shooting_residual(
        lqr_aug_rhs, t_nodes, bc, method="radau",
        options=Options(rtol=1e-10, atol=1e-13))
    z0 = jnp.tile(jnp.array([[x0, 0.0]]), (1, 4))   # [1, S·D]
    res = newton_solve(residual, z0, tol=1e-9)
    assert bool(res.converged[0])
    p0 = float(res.x[0, 1])
    np.testing.assert_allclose(p0, riccati_p0() * x0, rtol=1e-6)


def test_psitc_arctan_both_controllers():
    """Plain Newton diverges on arctan from |x|>1.39; Ψtc converges."""
    f = lambda x: jnp.arctan(5.0 * x)
    x0 = jnp.array([[3.0], [-2.0], [10.0]])
    for ctrl in ("ser-a", "ser-b"):
        res = psitc(f, x0, delta0=0.5, controller=ctrl, tol=1e-10)
        assert bool(jnp.all(res.converged)), ctrl
        np.testing.assert_allclose(res.x, 0.0, atol=1e-9)


def test_psitc_heterogeneous_lanes():
    """Lanes with different conditioning converge independently."""
    f = lambda x: jnp.stack([jnp.arctan(3 * x[:, 0]),
                             x[:, 1] ** 3 + x[:, 1] - 1.0], axis=-1)
    x0 = jnp.array([[4.0, 2.0], [-4.0, -3.0]])
    res = psitc(f, x0, delta0=0.5, tol=1e-10)
    assert bool(jnp.all(res.converged))
    root1 = 0.6823278038280193   # real root of x³+x−1
    np.testing.assert_allclose(res.x[:, 0], 0.0, atol=1e-8)
    np.testing.assert_allclose(res.x[:, 1], root1, rtol=1e-8)


def test_homotopy_cubic():
    """x³ − 3x + 3 = 0: Newton from 0/1 cycles; homotopy tracks the root."""
    f = lambda x: x ** 3 - 3.0 * x + 3.0
    x0 = jnp.zeros((2, 1))
    g = convex_homotopy(f, x0)
    res = homotopy(g, x0, dlam0=0.05, tol=1e-10)
    assert bool(jnp.all(res.converged))
    np.testing.assert_allclose(res.x, -2.1038034027355366, rtol=1e-8)


def test_auglag_quadratic_kkt():
    """min ½‖x‖² s.t. Σx = 1 → x = 1/n, λ = −1/n."""
    obj = lambda x: 0.5 * jnp.sum(x * x, -1)
    con = lambda x: (jnp.sum(x, -1) - 1.0)[:, None]
    res = augmented_lagrangian(obj, con, jnp.zeros((2, 4)))
    assert bool(jnp.all(res.converged))
    np.testing.assert_allclose(res.x, 0.25, rtol=1e-6)
    np.testing.assert_allclose(res.lam, -0.25, rtol=1e-4)


def test_shooting_is_jittable_and_differentiable():
    """The whole shooting solve can sit under jit and under jacfwd
    (sensitivity of the optimal p0 to the initial state)."""
    def solve_p0(x0):
        def residual(p0):
            y0 = jnp.stack([jnp.full((1,), x0), p0[:, 0]], axis=-1)
            sol = solve_ivp(lqr_aug_rhs, (0.0, T_), y0, method="radau",
                            rtol=1e-10, atol=1e-13)
            return sol.y[:, 1:2]
        return single_shooting(residual, jnp.zeros((1, 1)), tol=1e-10).x[0, 0]

    p0 = jax.jit(solve_p0)(1.0)
    np.testing.assert_allclose(p0, riccati_p0(), rtol=1e-7)
    dp0 = jax.jacfwd(solve_p0)(1.0)
    np.testing.assert_allclose(dp0, riccati_p0(), rtol=1e-5)  # linear in x0
