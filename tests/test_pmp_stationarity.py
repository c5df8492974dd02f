"""Explicit-control Hamiltonian partials (Hu twins) + PMP stationarity.

Reference analog: the Hu partial zoo (janus_ode_common.hpp:178-2074),
evalDynsU/evalDynsUDual (:2117-2189) and u2d_pmp_solver.hpp — H with an
EXPLICIT control argument so the interior-arc condition dH/du = 0 can be
formed directly. Here: energy-regularized Dubins car solved two ways
(stationarity transcription vs folded-feedback continuous solve) that must
agree; FD-vs-AD checks on the u-partials.
"""

import jax
import jax.numpy as jnp
import numpy as np

from janus_tpu import ham
from janus_tpu.control import newton_solve
from janus_tpu.solve import solve_ivp, Options
import pytest

# heavy tier: large custom-vjp / jacfwd-through-solve compiles (CLAUDE.md
# suite-budget notes); excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

V = 1.0
LAM = 0.5
TF = 2.0
TARGET = jnp.array([1.2, 0.8])
N = 6   # transcription intervals


def dubins_H(x, p, u, args):
    """H = L + p·f for min time + (lam/2)u^2 regularization (standard PMP)."""
    th = x[2]
    return (1.0 + 0.5 * LAM * u[0] ** 2
            + p[0] * V * jnp.cos(th) + p[1] * V * jnp.sin(th) + p[2] * u[0])


def test_grad_u_fd_vs_ad():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3))
    p = jnp.asarray(rng.randn(3))
    u = jnp.asarray(rng.randn(1))
    gu = ham.grad_u(dubins_H)(x, p, u, None)
    eps = 1e-6
    fd = (dubins_H(x, p, u + eps, None) - dubins_H(x, p, u - eps, None)) / (2 * eps)
    np.testing.assert_allclose(float(gu[0]), float(fd), rtol=1e-6)
    # second partials
    huu = ham.hessian_uu(dubins_H)(x, p, u, None)
    np.testing.assert_allclose(float(huu[0, 0]), LAM, rtol=1e-10)
    hup = ham.hessian_up(dubins_H)(x, p, u, None)
    np.testing.assert_allclose(np.asarray(hup), [[0.0, 0.0, 1.0]], atol=1e-12)


def test_pmp_dynamics_u_signs():
    """pmp_dynamics_u must produce xdot = +dH/dp, pdot = -dH/dx."""
    f = ham.pmp_dynamics_u(dubins_H, batched=True)
    y = jnp.array([[0.3, -0.2, 0.7, 0.1, 0.2, 1.1]])   # [p, x]
    u = jnp.array([[0.4]])
    dy = f(0.0, y, u, None)
    th = 1.1
    # xdot = (V cos th, V sin th, u)
    np.testing.assert_allclose(np.asarray(dy[0, 3:]),
                               [V * np.cos(th), V * np.sin(th), 0.4],
                               rtol=1e-6)
    # pdot = -dH/dx = (0, 0, p1 V sin th - p2 V cos th)
    np.testing.assert_allclose(
        np.asarray(dy[0, :3]),
        [0.0, 0.0, 0.3 * V * np.sin(th) - (-0.2) * V * np.cos(th)],
        rtol=1e-6, atol=1e-12)


def _solve_continuous():
    """Folded-feedback reference: u* = -p3/lam (from dH/du = 0) inside f."""

    def rhs(t, y, args):
        p, x = y[..., :3], y[..., 3:]
        u = (-p[..., 2:3] / LAM)
        th = x[..., 2]
        xdot = jnp.stack([V * jnp.cos(th), V * jnp.sin(th), u[..., 0]],
                         axis=-1)
        pdot = jnp.stack([jnp.zeros_like(th), jnp.zeros_like(th),
                          p[..., 0] * V * jnp.sin(th)
                          - p[..., 1] * V * jnp.cos(th)], axis=-1)
        return jnp.concatenate([pdot, xdot], axis=-1)

    def residual(p0):
        y0 = jnp.concatenate([p0, jnp.zeros_like(p0)], axis=-1)
        # Dubins is non-stiff: dopri853 keeps the jacfwd-through-solve cheap
        sol = solve_ivp(rhs, (0.0, TF), y0, method="dopri853",
                        options=Options(rtol=1e-7, atol=1e-10))
        return jnp.concatenate([sol.y[:, 3:5] - TARGET[None],
                                sol.y[:, 2:3]], axis=-1)

    # the Dubins PMP BVP has multiple extremals; start near the low-energy
    # (small-u) branch so both solves anchor to the same one
    res = newton_solve(residual, jnp.array([[1.5, 1.3, 0.3]]), tol=1e-7)
    assert bool(res.converged[0])
    # controls from the interior-arc law along the converged trajectory, at
    # interval left nodes (warm start) and midpoints (profile comparison)
    y0 = jnp.concatenate([res.x, jnp.zeros_like(res.x)], axis=-1)
    dt = TF / N
    nodes = solve_ivp(rhs, (0.0, TF), y0, method="dopri853",
                      options=Options(rtol=1e-7, atol=1e-10),
                      t_eval=jnp.arange(N) * dt)
    mids = solve_ivp(rhs, (0.0, TF), y0, method="dopri853",
                     options=Options(rtol=1e-7, atol=1e-10),
                     t_eval=jnp.arange(N) * dt + dt / 2)
    u_nodes = -nodes.ys[:, :, 2] / LAM                       # [1, N]
    u_mids = -mids.ys[:, :, 2] / LAM
    return res.x, u_nodes, u_mids


def test_dubins_solved_via_stationarity_residual():
    """Direct transcription: unknowns [p0, u_1..u_N]; residuals = boundary
    conditions + dH/du = 0 at the interval nodes, integrated on a FIXED
    control-aligned grid (solve.fixed — the reference's per-step θ-slab
    machinery, dopri853ted.hpp:224-229): adaptive steps straddling a control
    switch give jacfwd a noisy flow-map derivative, while the fixed grid is
    exactly differentiable. Warm-started from a perturbed continuous
    folded-feedback solution (cold-start is outside plain Newton's ball —
    that is what the homotopy/Ψtc layers are for); Newton must pull the
    perturbation out and agree with the continuous solve."""
    from janus_tpu.solve.fixed import odeint_fixed

    SPI = 8                                  # fixed RK4 steps per interval
    f_u = ham.pmp_dynamics_u(dubins_H, batched=True)
    r_stat = ham.stationarity_residual(dubins_H, batched=True)

    def rhs(t, y, a):
        _, u_k = a                           # per-step control slab [M]
        return f_u(t, y, u_k[:, None], None)

    def residual(z):
        m = z.shape[0]
        p0, us = z[:, :3], z[:, 3:]
        y0 = jnp.concatenate([p0, jnp.zeros_like(p0)], axis=-1)
        slab = us[:, jnp.arange(N * SPI) // SPI].T        # [S, M]
        yT, traj = odeint_fixed(rhs, 0.0, TF, y0, N * SPI, step_args=slab,
                                save_trajectory=True)     # traj [S+1, M, 6]
        bc = jnp.concatenate([yT[:, 3:5] - TARGET[None], yT[:, 2:3]],
                             axis=-1)                     # [M, 3]
        # stationarity at interval MIDPOINTS: the left-node rule carries an
        # O(dt) bias (u_k represents the whole interval); midpoint is O(dt²)
        nodes = traj[SPI // 2::SPI][:N]                   # [N, M, 6]
        pk = nodes[:, :, :3].reshape(N * m, 3)
        xk = nodes[:, :, 3:].reshape(N * m, 3)
        uk = us.T.reshape(N * m, 1)
        stat = r_stat(xk, pk, uk, None).reshape(N, m).T   # [M, N]
        return jnp.concatenate([bc, stat], axis=-1)

    p0_cont, u_nodes, u_mids = _solve_continuous()
    z0 = jnp.concatenate([p0_cont * 1.15 + 0.02, u_nodes * 1.2 - 0.05],
                         axis=-1)
    r0 = float(jnp.linalg.norm(residual(z0)))
    assert r0 > 1e-2          # the perturbed start is genuinely off
    res = newton_solve(residual, z0, tol=1e-8, max_iter=30)
    assert bool(res.converged[0]), float(res.fnorm[0])

    p0_disc = res.x[:, :3]
    # piecewise-constant discretization error ~ O(dt): agree to a few percent
    np.testing.assert_allclose(np.asarray(p0_disc), np.asarray(p0_cont),
                               rtol=0.08, atol=0.03)
    # converged controls trace the continuous interior-arc profile at the
    # interval midpoints (each u_k represents its whole interval)
    us_sol = np.asarray(res.x[0, 3:])
    np.testing.assert_allclose(us_sol, np.asarray(u_mids[0]),
                               rtol=0.25, atol=0.25)
    assert np.ptp(us_sol) > 1e-3             # nontrivial arc
