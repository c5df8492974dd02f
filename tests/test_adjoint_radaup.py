"""Continuous-adjoint reverse mode over the VARIABLE-ORDER radaup ladder.

radau_adjoint now routes Options(min_stages < max_stages) through
solve_radau_vo: the forward records each accepted step's collocation
polynomial PADDED to the ladder's top stage count (absent orders carry zero
coefficients, so evaluating the padded power basis IS the lane's own
interpolant), and the backward sweep integrates the linear adjoint ODE at
the ladder's top order on that mesh — per-lane order adaptivity lives
entirely in the forward mesh choice. Oracles: central FD of a jitted loss
through the full solver (O(rtol) mesh-noise contract, same as the
fixed-stage adjoint tests). The reference's flagship dual solver IS
variable-order with event duals (src/cpp/radauted.hpp:241-296,
radauted_impl.hpp:2306) — forward mode only; this is its reverse twin.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from janus_tpu.solve import Options, solve_adjoint, solve_ivp
from janus_tpu.solve.events import Event

pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def _clear_caches_each_test():
    yield
    jax.clear_caches()


def vdp(t, y, mu):
    x, v = y[:, 0], y[:, 1]
    return jnp.stack([v, mu * ((1 - x ** 2) * v) - x], axis=-1)


MU_MIXED = jnp.array([3.0, 30.0, 120.0])     # 3 decades ⇒ the ladder mixes
Y0_MIXED = jnp.array([[2.0, 0.0], [1.5, 0.5], [2.2, -0.3]])


def _fd(loss, x, idx, eps):
    e = jnp.zeros_like(x).at[idx].set(eps)
    return (loss(x + e) - loss(x - e)) / (2 * eps)


def test_terminal_grads_vs_fd_mixed_orders():
    opts = Options(rtol=1e-8, atol=1e-10, adjoint_steps=512)

    @jax.jit
    def loss2(y0, mu):
        y = solve_adjoint(vdp, (0.0, 2.0), y0, method="radaup", args=mu,
                          options=opts)
        return jnp.sum(y ** 2)

    g_y0, g_mu = jax.jit(jax.grad(loss2, argnums=(0, 1)))(Y0_MIXED, MU_MIXED)
    assert jnp.all(jnp.isfinite(g_y0)) and jnp.all(jnp.isfinite(g_mu))
    eps = 1e-6
    for (i, j) in [(0, 0), (1, 1), (2, 0)]:
        fd = _fd(lambda z: loss2(z, MU_MIXED), Y0_MIXED, (i, j), eps)
        assert abs(fd - g_y0[i, j]) <= 3e-4 * abs(fd) + 1e-7, (i, j)
    for i in range(3):
        ei = eps * max(1.0, float(MU_MIXED[i]))
        fd = _fd(lambda z: loss2(Y0_MIXED, z), MU_MIXED, (i,), ei)
        assert abs(fd - g_mu[i]) <= 3e-4 * abs(fd) + 1e-8, i


def test_forward_value_matches_solve_ivp():
    """The custom-vjp primal IS solve_radau_vo — values must agree exactly."""
    opts = Options(rtol=1e-8, atol=1e-10, adjoint_steps=512)
    y = solve_adjoint(vdp, (0.0, 2.0), Y0_MIXED, method="radaup",
                      args=MU_MIXED, options=opts)
    sol = solve_ivp(vdp, (0.0, 2.0), Y0_MIXED, method="radaup",
                    args=MU_MIXED, options=opts)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(sol.y))


def test_t_eval_trajectory_grads_vs_fd():
    opts = Options(rtol=1e-8, atol=1e-10, adjoint_steps=512)
    te = jnp.array([0.5, 1.0, 1.7])

    @jax.jit
    def loss(y0, mu):
        ys = solve_adjoint(vdp, (0.0, 2.0), y0, method="radaup", args=mu,
                           options=opts, t_eval=te)
        return jnp.sum(ys ** 2)

    g_y0, g_mu = jax.jit(jax.grad(loss, argnums=(0, 1)))(Y0_MIXED, MU_MIXED)
    eps = 1e-6
    fd = _fd(lambda z: loss(z, MU_MIXED), Y0_MIXED, (0, 0), eps)
    assert abs(fd - g_y0[0, 0]) <= 3e-4 * abs(fd)
    fd = _fd(lambda z: loss(Y0_MIXED, z), MU_MIXED, (0,), eps)
    assert abs(fd - g_mu[0]) <= 3e-4 * abs(fd) + 1e-8


def test_terminal_event_grads_vs_fd():
    """Differentiable (y*, t*) at the first x-downcrossing; mild stiffness
    (heterogeneous stiff event lanes amplify mesh-vs-FD noise O(rtol·amp) —
    calibrated against the fixed-stage adjoint on the same problem)."""
    mu = jnp.array([3.0, 8.0])
    y0 = jnp.array([[2.0, 0.0], [1.5, 0.5]])
    opts = Options(rtol=1e-9, atol=1e-11, adjoint_steps=512)
    ev = Event(lambda t, y, a: y[:, 0], terminal=True, direction=-1)

    @jax.jit
    def loss(y0, mu):
        y, tstar = solve_adjoint(vdp, (0.0, 10.0), y0, method="radaup",
                                 args=mu, options=opts, events=ev)
        return jnp.sum(y[:, 1] ** 2) + jnp.sum(tstar)

    g_y0, g_mu = jax.jit(jax.grad(loss, argnums=(0, 1)))(y0, mu)
    eps = 1e-6
    fd = _fd(lambda z: loss(z, mu), y0, (1, 1), eps)
    assert abs(fd - g_y0[1, 1]) <= 3e-4 * abs(fd) + 1e-7
    fd = _fd(lambda z: loss(y0, z), mu, (0,), eps)
    assert abs(fd - g_mu[0]) <= 3e-4 * abs(fd) + 1e-8


def test_integral_cost_grads_vs_fd():
    opts = Options(rtol=1e-9, atol=1e-11, adjoint_steps=512)
    mu = jnp.array([3.0, 8.0])
    y0 = jnp.array([[2.0, 0.0], [1.5, 0.5]])

    def run_cost(t, y, mu):
        return jnp.sum(y ** 2, axis=-1)

    @jax.jit
    def loss(y0, mu):
        y, q = solve_adjoint(vdp, (0.0, 2.0), y0, method="radaup", args=mu,
                             options=opts, cost=run_cost)
        return jnp.sum(q) + 0.1 * jnp.sum(y ** 2)

    g_y0, g_mu = jax.jit(jax.grad(loss, argnums=(0, 1)))(y0, mu)
    eps = 1e-6
    fd = _fd(lambda z: loss(z, mu), y0, (0, 1), eps)
    assert abs(fd - g_y0[0, 1]) <= 3e-4 * abs(fd)
    fd = _fd(lambda z: loss(y0, z), mu, (1,), eps)
    assert abs(fd - g_mu[1]) <= 3e-4 * abs(fd) + 1e-8


def test_mass_matrix_grads_vs_fd():
    """Invertible (non-diagonal) mass: M·y' = f; the terminal ν = M⁻ᵀλ and
    boundary λ(t0) = Mᵀν(t0) projections are order-independent."""
    mass = jnp.array([[1.0, 0.2], [0.1, 1.5]])
    mu = jnp.array([2.0, 12.0])
    y0 = jnp.array([[2.0, 0.0], [1.5, 0.5]])
    opts = Options(rtol=1e-9, atol=1e-11, adjoint_steps=512)

    @jax.jit
    def loss(y0, mu):
        y = solve_adjoint(vdp, (0.0, 1.5), y0, method="radaup", args=mu,
                          options=opts, mass=mass)
        return jnp.sum(y ** 2)

    g_y0, g_mu = jax.jit(jax.grad(loss, argnums=(0, 1)))(y0, mu)
    eps = 1e-6
    fd = _fd(lambda z: loss(z, mu), y0, (1, 0), eps)
    assert abs(fd - g_y0[1, 0]) <= 3e-4 * abs(fd)
    fd = _fd(lambda z: loss(y0, z), mu, (1,), eps)
    assert abs(fd - g_mu[1]) <= 3e-4 * abs(fd) + 1e-8


def test_matrix_free_variable_order_adjoint_matches_fd():
    """round 5: stage_solver='tridiag' on the VARIABLE-ORDER adjoint — the
    forward ladder runs per-order matrix-free stage solvers (radaup.py)
    and the backward sweep (top-order, order-parameterized already) rides
    the fixed-stage matrix-free machinery. D=16 Fisher-KPP MOL line,
    parameter gradients vs central FD."""
    d = 16
    dx = 1.0 / (d + 1)
    xg = np.linspace(dx, 1.0 - dx, d)

    def rhs(t, y, args):
        nu, r = args
        left = jnp.pad(y[:, :-1], ((0, 0), (1, 0)))
        right = jnp.pad(y[:, 1:], ((0, 0), (0, 1)))
        lap = (left - 2 * y + right) / dx ** 2
        return nu * lap + r * y * (1.0 - y)

    m = 2
    y0 = jnp.tile(jnp.asarray(np.exp(-100 * (xg - 0.3) ** 2))[None],
                  (m, 1))
    rates = jnp.array([1.0, 8.0])[:, None]
    opts = Options(rtol=1e-6, atol=1e-9, stage_solver="tridiag",
                   min_stages=1, max_stages=5, adjoint_steps=256)

    def loss(z, r):
        yT = solve_adjoint(rhs, (0.0, 0.4), z, method="radaup",
                           args=(0.01, r), options=opts)
        return jnp.sum(jnp.asarray(xg)[None] * yT ** 2)

    g_y0, g_r = jax.jit(jax.grad(loss, argnums=(0, 1)))(y0, rates)
    assert bool(jnp.all(jnp.isfinite(g_y0)))

    from janus_tpu.solve import solve_ivp

    def lfd(rv):
        s = solve_ivp(rhs, (0.0, 0.4), y0, method="radaup",
                      args=(0.01, rv), options=opts)
        return float(jnp.sum(jnp.asarray(xg)[None] * s.y ** 2))

    eps = 1e-5
    for i in range(m):
        e = jnp.zeros((m, 1)).at[i, 0].set(eps)
        fd = (lfd(rates + e) - lfd(rates - e)) / (2 * eps)
        assert abs(g_r[i, 0] - fd) <= 3e-4 * max(abs(fd), 1e-8)
