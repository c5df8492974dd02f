"""Running-cost quadratures: solve_radau(quad=...) and radau_adjoint(cost=...).

The CVODES quadrature-integration role (the reference has no quadrature
machinery at all): q = ∫ l(t, y) dt accumulated per accepted step at the
step's own Radau order, and reverse-mode gradients of integral-cost
(Lagrange-term) objectives through the continuous adjoint — the backward
sweep picks up the source term λ' = −Jᵀλ − l_yᵀq̄ plus boundary/quadrature
pieces (solve/adjoint.py docstring). Oracles: scipy augmented-state solves
and central-difference re-solves.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from janus_tpu.solve import Options
from janus_tpu.solve.adjoint import radau_adjoint
from janus_tpu.solve.events import Event
from janus_tpu.solve.radau import solve_radau

# heavy tier: large custom-vjp / jacfwd-through-solve compiles (CLAUDE.md
# suite-budget notes); excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def _clear_caches_each_test():
    # same custom-vjp executable-accumulation workaround as test_adjoint.py
    yield
    jax.clear_caches()


def _vdp(t, y, mu):
    return jnp.stack([y[:, 1], mu * (1 - y[:, 0] ** 2) * y[:, 1] - y[:, 0]],
                     axis=-1)


def _osc(t, y, k):
    return jnp.stack([y[:, 1], -k * y[:, 0]], axis=-1)


def test_forward_quad_matches_scipy_augmented():
    """∫ y₀² dt over a stiff VdP solve vs scipy Radau on the augmented
    system, to solver tolerance."""
    from scipy.integrate import solve_ivp as sp_solve

    y0 = jnp.array([[2.0, 0.0], [1.5, 0.5]])
    sol = solve_radau(_vdp, 0.0, 3.0, y0, args=5.0,
                      options=Options(rtol=1e-10, atol=1e-12),
                      quad=lambda t, y, a: y[:, 0] ** 2)
    assert sol.quad.shape == (2,)
    for i in range(2):
        ref = sp_solve(lambda t, y: [y[1], 5.0 * (1 - y[0] ** 2) * y[1] - y[0],
                                     y[0] ** 2],
                       (0.0, 3.0), list(np.asarray(y0[i])) + [0.0],
                       method="Radau", rtol=1e-12, atol=1e-13)
        np.testing.assert_allclose(float(sol.quad[i]), ref.y[2, -1],
                                   rtol=1e-8)


def test_forward_quad_vector_and_event_truncation():
    """[M, Q] quadratures; an elapsed-time slot (l ≡ 1) must integrate to
    exactly t* on event-terminated lanes and to tf on the rest."""
    y0 = jnp.array([[2.0, 0.0], [1.5, 0.5]])

    def l2(t, y, a):
        return jnp.stack([y[:, 0] ** 2, jnp.ones_like(t)], axis=-1)

    ev = Event(lambda t, y, a: y[:, 0], terminal=True)
    sol = solve_radau(_vdp, 0.0, 3.0, y0, args=5.0,
                      options=Options(rtol=1e-10, atol=1e-12),
                      quad=l2, events=ev)
    assert sol.quad.shape == (2, 2)
    # lane 0 starts at the y0=2 branch and never crosses before t=3 at mu=5
    elapsed = np.asarray(sol.quad[:, 1])
    t_stop = np.where(np.asarray(sol.event_idx) >= 0,
                      np.asarray(sol.event_t), 3.0)
    np.testing.assert_allclose(elapsed, t_stop, rtol=1e-9)
    assert int(jnp.sum(sol.event_idx >= 0)) >= 1   # the truncation path ran


def test_cost_adjoint_matches_fd_all_inputs():
    """grad of Σq + terminal term w.r.t. y0, θ (incl. a cost-only θ term),
    t0, and tf matches central differences."""
    y0 = jnp.array([[2.0, 0.0], [1.5, 0.5]])
    opts = Options(rtol=1e-8, atol=1e-10, adjoint_steps=512)

    def cost(t, y, mu):
        return y[:, 0] ** 2 + 0.1 * mu * jnp.sin(t)

    def loss(z, mu, t0, tf):
        y, q = radau_adjoint(_vdp, (t0, tf), z, args=mu, options=opts,
                             cost=cost)
        return jnp.sum(q) + 0.3 * jnp.sum(y ** 2)

    g_y0, g_mu, g_t0, g_tf = jax.grad(loss, argnums=(0, 1, 2, 3))(
        y0, 4.0, 0.0, 3.0)
    eps = 1e-6
    for i in range(2):
        for j in range(2):
            e = jnp.zeros((2, 2)).at[i, j].set(eps)
            fd = (loss(y0 + e, 4.0, 0.0, 3.0)
                  - loss(y0 - e, 4.0, 0.0, 3.0)) / (2 * eps)
            np.testing.assert_allclose(float(g_y0[i, j]), float(fd),
                                       rtol=2e-5, atol=1e-9)
    fd = (loss(y0, 4.0 + eps, 0.0, 3.0) - loss(y0, 4.0 - eps, 0.0, 3.0)) \
        / (2 * eps)
    np.testing.assert_allclose(float(g_mu), float(fd), rtol=2e-5)
    fd = (loss(y0, 4.0, eps, 3.0) - loss(y0, 4.0, -eps, 3.0)) / (2 * eps)
    np.testing.assert_allclose(float(g_t0), float(fd), rtol=2e-5)
    fd = (loss(y0, 4.0, 0.0, 3.0 + eps) - loss(y0, 4.0, 0.0, 3.0 - eps)) \
        / (2 * eps)
    np.testing.assert_allclose(float(g_tf), float(fd), rtol=2e-5)


def test_cost_adjoint_mass_matrix():
    mass = jnp.array([[2.0, 0.3], [0.1, 1.5]])
    y0 = jnp.array([[1.0, 0.0], [0.5, 0.3]])
    opts = Options(rtol=1e-8, atol=1e-10, adjoint_steps=512)

    def fm(t, y, a):
        return jnp.stack([y[:, 1], -a * y[:, 0] - 0.2 * y[:, 1]], axis=-1)

    def loss(a):
        y, q = radau_adjoint(fm, (0.0, 4.0), y0, args=a, options=opts,
                             mass=mass, cost=lambda t, y, _: y[:, 0] ** 2)
        return jnp.sum(q) + jnp.sum(y[:, 0])

    g = float(jax.grad(loss)(1.7))
    eps = 1e-6
    fd = float((loss(1.7 + eps) - loss(1.7 - eps)) / (2 * eps))
    np.testing.assert_allclose(g, fd, rtol=1e-6)


def test_cost_adjoint_event_truncated_integral():
    """∫₀^{t*} l dt with a terminal event: the jump w picks up q̄·l(t*)."""
    y0 = jnp.array([[1.0, 0.1], [0.8, -0.2]])
    opts = Options(rtol=1e-8, atol=1e-10, adjoint_steps=512)
    ev = Event(lambda t, y, a: y[:, 0], terminal=True)

    def loss(k):
        y, tst, q = radau_adjoint(_osc, (0.0, 3.0), y0, args=k, options=opts,
                                  events=ev,
                                  cost=lambda t, y, _: y[:, 1] ** 2)
        return jnp.sum(q) + 0.2 * jnp.sum(tst)

    g = float(jax.grad(loss)(1.3))
    eps = 1e-6
    fd = float((loss(1.3 + eps) - loss(1.3 - eps)) / (2 * eps))
    np.testing.assert_allclose(g, fd, rtol=1e-6)


def test_cost_adjoint_t_eval_combination():
    """Integral cost + trajectory samples: q sums over the chained segments
    and both outputs' cotangents flow."""
    y0 = jnp.array([[1.0, 0.1], [0.8, -0.2]])
    opts = Options(rtol=1e-8, atol=1e-10, adjoint_steps=512)
    tg = jnp.array([1.0, 2.0, 3.0])

    def loss(k):
        ys, q = radau_adjoint(_osc, (0.0, 3.0), y0, args=k, options=opts,
                              t_eval=tg, cost=lambda t, y, _: y[:, 1] ** 2)
        return jnp.sum(q) + 0.1 * jnp.sum(ys ** 2)

    g = float(jax.grad(loss)(1.3))
    eps = 1e-6
    fd = float((loss(1.3 + eps) - loss(1.3 - eps)) / (2 * eps))
    np.testing.assert_allclose(g, fd, rtol=1e-6)


def test_cost_adjoint_gmres_and_deep_arnoldi():
    """cost= through the matrix-free backward sweep — AND the GMRES
    exhaustion guard: gmres_iters far beyond the Krylov dimension used to
    inject rank-deficient back-substitution garbage that diverged the
    backward iteration (linalg/gmres.py docstring)."""
    y0 = jnp.array([[1.0, 0.1], [0.8, -0.2]])
    opts = Options(rtol=1e-8, atol=1e-10, adjoint_steps=512,
                   stage_solver="gmres", gmres_iters=20)

    def loss(k):
        y, q = radau_adjoint(_osc, (0.0, 3.0), y0, args=k, options=opts,
                             cost=lambda t, y, _: y[:, 1] ** 2)
        return jnp.sum(q) + jnp.sum(y)

    g = float(jax.grad(loss)(1.3))
    eps = 1e-6
    fd = float((loss(1.3 + eps) - loss(1.3 - eps)) / (2 * eps))
    np.testing.assert_allclose(g, fd, rtol=1e-6)


def test_cost_adjoint_vector_q():
    y0 = jnp.array([[1.0, 0.1]])
    opts = Options(rtol=1e-8, atol=1e-10, adjoint_steps=512)

    def lv(t, y, k):
        return jnp.stack([y[:, 0] ** 2, k * y[:, 1] ** 2], axis=-1)

    def loss(k):
        y, q = radau_adjoint(_osc, (0.0, 3.0), y0, args=k, options=opts,
                             cost=lv)
        return jnp.sum(q[:, 0]) + 2.0 * jnp.sum(q[:, 1])

    g = float(jax.grad(loss)(1.3))
    eps = 1e-6
    fd = float((loss(1.3 + eps) - loss(1.3 - eps)) / (2 * eps))
    np.testing.assert_allclose(g, fd, rtol=1e-6)


def test_cost_with_n_alg_raises():
    with pytest.raises(ValueError, match="cost"):
        radau_adjoint(_osc, (0.0, 1.0), jnp.zeros((1, 2)),
                      mass=jnp.diag(jnp.array([1.0, 0.0])), n_alg=1,
                      cost=lambda t, y, a: y[:, 0])


def test_gmres_exhaustion_rank_guard():
    """Unit test for the exhaustion fix: iters ≫ N must still solve exactly
    (A = I breaks down at column 0 with a HEALTHY pivot — kept; dependent
    columns past the Krylov dimension are dropped)."""
    from janus_tpu.linalg.gmres import gmres_batched

    x, _ = gmres_batched(lambda v: v, jnp.array([[3.0, -2.0]]), None, 10)
    np.testing.assert_allclose(np.asarray(x), [[3.0, -2.0]], rtol=0, atol=0)

    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (4, 3, 3))
    a = a @ jnp.swapaxes(a, -1, -2) + 3 * jnp.eye(3)
    b = jax.random.normal(jax.random.PRNGKey(1), (4, 3))
    mv = lambda v: jnp.einsum("mij,mj->mi", a, v)      # noqa: E731
    x, _ = gmres_batched(mv, b, None, 20)
    np.testing.assert_allclose(np.asarray(mv(x)), np.asarray(b), atol=1e-12)


def test_solve_ivp_quad_wiring():
    """Top-level API: quad= reaches the radau backend; other methods raise."""
    from janus_tpu.solve import solve_ivp

    y0 = jnp.array([[2.0, 0.0]])
    l = lambda t, y, a: y[:, 0] ** 2                   # noqa: E731
    opts = Options(rtol=1e-8, atol=1e-10)
    s1 = solve_ivp(_vdp, (0.0, 2.0), y0, method="radau", args=5.0,
                   options=opts, quad=l)
    s2 = solve_radau(_vdp, 0.0, 2.0, y0, args=5.0, options=opts, quad=l)
    np.testing.assert_allclose(np.asarray(s1.quad), np.asarray(s2.quad),
                               rtol=0, atol=0)
    with pytest.raises(ValueError, match="quad"):
        solve_ivp(_vdp, (0.0, 2.0), y0, method="dopri5", args=5.0, quad=l)
    with pytest.raises(ValueError, match="fixed.stage"):
        solve_ivp(_vdp, (0.0, 2.0), y0, method="radaup", args=5.0,
                  options=Options(min_stages=1, max_stages=7), quad=l)


def test_quad_tangents_match_jvp_and_fd():
    """IND tangents of the quadrature (Solution.sens_quad) vs jvp through
    the solve and FD re-solves, with y0 AND parameter seeds."""
    m = 2
    y0 = jnp.array([[2.0, 0.0], [1.5, 0.5]])
    mus = jnp.array([20.0, 60.0])
    opts = Options(rtol=1e-9, atol=1e-12)
    seeds = jnp.stack([jnp.eye(2)[0][None].repeat(m, 0),
                       jnp.eye(2)[1][None].repeat(m, 0),
                       jnp.zeros((m, 2))])                    # K=3
    dmu = jnp.stack([jnp.zeros(m), jnp.zeros(m), jnp.ones(m)])

    def l(t, y, a):
        return a * y[:, 0] ** 2 + jnp.sin(t)

    sol = solve_radau(_vdp, 0.0, 1.5, y0, args=mus, options=opts, quad=l,
                      tangents=seeds, args_tangents=dmu)
    assert sol.sens_quad.shape == (3, m)

    def qfin(z, mm):
        return solve_radau(_vdp, 0.0, 1.5, z, args=mm, options=opts,
                           quad=l).quad

    for k in range(3):
        _, dq = jax.jvp(qfin, (y0, mus), (seeds[k], dmu[k]))
        # IND (frozen mesh) vs jvp (controller differentiated) agree to
        # O(step error), as in test_radau_tangents
        np.testing.assert_allclose(np.asarray(sol.sens_quad[k]),
                                   np.asarray(dq), rtol=5e-4, atol=1e-7)
        eps = 1e-6
        fd = (qfin(y0 + eps * seeds[k], mus + eps * dmu[k])
              - qfin(y0 - eps * seeds[k], mus - eps * dmu[k])) / (2 * eps)
        np.testing.assert_allclose(np.asarray(sol.sens_quad[k]),
                                   np.asarray(fd), rtol=5e-4, atol=1e-6)


def test_quad_tangents_event_truncated():
    """Quadrature tangents on event-terminated lanes: the moving endpoint
    adds l(t*)·dt*_k. Oracle: FD of the truncated integral (elapsed-time
    slot doubles as a dt*/dθ check)."""
    y0 = jnp.array([[1.0, 0.1], [0.8, -0.2]])
    opts = Options(rtol=1e-10, atol=1e-13)
    ev = Event(lambda t, y, a: y[:, 0], terminal=True)
    seeds = jnp.zeros((1, 2, 2))
    dk = jnp.ones((1,))

    def l2(t, y, k):
        return jnp.stack([k * y[:, 1] ** 2, jnp.ones_like(t)], axis=-1)

    sol = solve_radau(_osc, 0.0, 3.0, y0, args=1.3, options=opts, quad=l2,
                      events=ev, tangents=seeds, args_tangents=dk)
    assert int(jnp.sum(sol.event_idx >= 0)) == 2
    assert sol.sens_quad.shape == (1, 2, 2)

    def qfin(k):
        return solve_radau(_osc, 0.0, 3.0, y0, args=k, options=opts,
                           quad=l2, events=ev).quad

    eps = 1e-6
    fd = (qfin(1.3 + eps) - qfin(1.3 - eps)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(sol.sens_quad[0]),
                               np.asarray(fd), rtol=1e-5, atol=1e-9)


def test_forward_quad_with_t_eval():
    """quad accumulates over the whole span while t_eval samples inside the
    same solve (independent mechanisms, one pass)."""
    y0 = jnp.array([[2.0, 0.0]])
    opts = Options(rtol=1e-10, atol=1e-12)
    ts = jnp.array([0.5, 1.5])
    l = lambda t, y, a: y[:, 0] ** 2                      # noqa: E731
    s = solve_radau(_vdp, 0.0, 2.0, y0, args=5.0, options=opts,
                    quad=l, t_eval=ts)
    s2 = solve_radau(_vdp, 0.0, 2.0, y0, args=5.0, options=opts, quad=l)
    np.testing.assert_allclose(np.asarray(s.quad), np.asarray(s2.quad),
                               rtol=0, atol=0)
    assert s.ys.shape == (1, 2, 2) and bool(jnp.all(jnp.isfinite(s.ys)))


@pytest.mark.parametrize("method,qtol", [("rodas", 1e-6), ("seulex", 5e-5)])
def test_quad_rodas_seulex_matches_scipy_augmented(method, qtol):
    """quad= on the Rosenbrock and extrapolation families (VERDICT round-3
    item 5): GL-3 on the dense interpolant vs scipy Radau on the augmented
    system. Mildly stiff VdP so both families take real adaptive steps.
    The quadrature tracks each family's INTERPOLANT accuracy: RODAS's
    CONTRO cubic rides the order-4 method; SEULEX's quartic is O(h^5) per
    step while the ladder takes big high-order steps — same plateau its
    t_eval sampling has, hence the looser bound."""
    from scipy.integrate import solve_ivp as sp_solve
    from janus_tpu.solve import solve_ivp

    y0 = jnp.array([[2.0, 0.0], [1.5, 0.5]])
    sol = solve_ivp(_vdp, (0.0, 3.0), y0, method=method, args=5.0,
                    options=Options(rtol=1e-9, atol=1e-12),
                    quad=lambda t, y, a: y[:, 0] ** 2)
    assert sol.quad.shape == (2,)
    for i in range(2):
        ref = sp_solve(lambda t, y: [y[1], 5.0 * (1 - y[0] ** 2) * y[1] - y[0],
                                     y[0] ** 2],
                       (0.0, 3.0), list(np.asarray(y0[i])) + [0.0],
                       method="Radau", rtol=1e-12, atol=1e-13)
        np.testing.assert_allclose(float(sol.quad[i]), ref.y[2, -1],
                                   rtol=qtol, err_msg=f"lane {i}")


@pytest.mark.parametrize("method,qtol", [("rodas", 1e-6), ("seulex", 2e-5)])
def test_quad_rodas_seulex_event_truncation(method, qtol):
    """An elapsed-time quadrature slot (l ≡ 1) must integrate to exactly t*
    on event-terminated lanes — the partial last step re-quadratures on the
    scaled interpolant."""
    from janus_tpu.solve import solve_ivp, EVENT_TERMINATED

    y0 = jnp.array([[1.0, 0.0], [1.0, 0.0]])
    levels = jnp.array([-0.5, -2.0])          # lane 1 never crosses

    def g(t, y, a):
        return y[:, 0] - levels

    sol = solve_ivp(_osc, (0.0, 2.5), y0, method=method, args=1.0,
                    options=Options(rtol=1e-10, atol=1e-13),
                    events=Event(g, terminal=True),
                    quad=lambda t, y, a: jnp.stack(
                        [jnp.ones_like(t), y[:, 0] ** 2], axis=-1))
    assert int(sol.status[0]) == EVENT_TERMINATED
    np.testing.assert_allclose(float(sol.quad[0, 0]), float(sol.t[0]),
                               rtol=1e-7)
    np.testing.assert_allclose(float(sol.quad[1, 0]), 2.5, rtol=1e-9)
    # analytic: ∫₀ᵗ cos² = t/2 + sin(2t)/4 (tolerance per interpolant order,
    # see test_quad_rodas_seulex_matches_scipy_augmented)
    for i in range(2):
        t = float(sol.t[i])
        np.testing.assert_allclose(float(sol.quad[i, 1]),
                                   t / 2 + np.sin(2 * t) / 4, rtol=qtol)


def test_radaup_quad_matches_scipy_augmented():
    """quad= on the variable-order ladder: GL-3 on the lane's own
    collocation interpolant vs scipy Radau on the augmented system."""
    from scipy.integrate import solve_ivp as sp_solve_ivp
    from janus_tpu.models.problems import vdp_rhs
    from janus_tpu.solve import solve_ivp, SUCCESS

    mus = jnp.array([10.0, 500.0])
    y0 = jnp.tile(jnp.array([[2.0, 0.0]]), (2, 1))
    sol = solve_ivp(vdp_rhs, (0.0, 2.0), y0, method="radaup", args=mus,
                    rtol=1e-9, atol=1e-12, quad=lambda t, y, a: y[:, 0] ** 2)
    assert bool(jnp.all(sol.status == SUCCESS))
    for i, mu in enumerate(np.asarray(mus)):
        ref = sp_solve_ivp(
            lambda t, y: [y[1], mu * (1 - y[0] ** 2) * y[1] - y[0],
                          y[0] ** 2],
            (0, 2.0), [2.0, 0.0, 0.0], method="Radau",
            rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(float(sol.quad[i]), ref.y[2, -1],
                                   rtol=1e-8, err_msg=f"lane {i}")


def test_radaup_quad_event_truncation():
    """event-terminated lanes integrate the cost only to t* (harmonic
    x = cos t, event x = 0 at t* = pi/2: integral of cos^2 = pi/4)."""
    from janus_tpu.models.problems import harmonic_rhs
    from janus_tpu.solve import solve_ivp

    ev = Event(lambda t, y, a: y[..., 0], terminal=True, direction=-1.0)
    sol = solve_ivp(harmonic_rhs, (0.0, 10.0), jnp.array([[1.0, 0.0]]),
                    method="radaup", args=1.0, rtol=1e-10, atol=1e-13,
                    events=ev, quad=lambda t, y, a: y[:, 0] ** 2)
    np.testing.assert_allclose(float(sol.quad[0]), np.pi / 4.0, rtol=1e-7)
