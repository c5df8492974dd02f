"""First-class internal-differentiation sensitivities in solve_radau.

solve_radau(tangents=seeds) propagates K directional sensitivities through
ONE primal solve, solving the linear tangent collocation system per
accepted step with the step's own LU factors — the reference's RadauTeD
architecture (radauted_impl.hpp:620-2929, solve_LUdual :1901-1936) instead
of K vmapped jvp re-solves. Checks: vs vmapped jvp through the solver, vs
FD re-solves, stiff + mass-matrix cases, and the feature-exclusion raises.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# slow tier (re-tiered from the measured round-5 fast-tier survey:
# IND tangent-sweep compiles (287 s measured); fast-tier sensitivity signal lives in test_radau + the adjoint smokes)
pytestmark = pytest.mark.slow

from janus_tpu.models.problems import vdp_rhs, vdp_jac
from janus_tpu.solve import Options, SUCCESS
from janus_tpu.solve.radau import solve_radau


def _identity_seeds(m, d):
    return jnp.stack([jnp.zeros((m, d)).at[:, j].set(1.0) for j in range(d)])


def test_ind_matches_jvp_and_fd_stiff_vdp():
    mu, tf = 100.0, 1.0
    m = 3
    y0 = jnp.tile(jnp.array([[2.0, 0.0]]), (m, 1))
    mus = jnp.array([30.0, 100.0, 300.0])
    opts = Options(rtol=1e-9, atol=1e-12)
    seeds = _identity_seeds(m, 2)

    sol = solve_radau(vdp_rhs, 0.0, tf, y0, args=mus, options=opts,
                      jac=vdp_jac, tangents=seeds)
    assert bool(jnp.all(sol.status == SUCCESS))
    assert sol.sens.shape == (2, m, 2)

    # oracle 1: vmapped jvp THROUGH the adaptive solve
    def final(z):
        s = solve_radau(vdp_rhs, 0.0, tf, z, args=mus, options=opts,
                        jac=vdp_jac)
        return s.y

    # IND (frozen step sequence) and full jvp (controller differentiated)
    # are different consistent discretizations of the same sensitivity ODE:
    # they agree to O(tol-driven step error), not machine precision
    Jjvp = jnp.stack([jax.jvp(final, (y0,), (seeds[k],))[1]
                      for k in range(2)])
    np.testing.assert_allclose(np.asarray(sol.sens), np.asarray(Jjvp),
                               rtol=3e-4, atol=1e-7)

    # oracle 2: central FD re-solves
    eps = 1e-6
    for k in range(2):
        fp = final(y0 + eps * seeds[k])
        fm = final(y0 - eps * seeds[k])
        fd = (fp - fm) / (2 * eps)
        np.testing.assert_allclose(np.asarray(sol.sens[k]), np.asarray(fd),
                                   rtol=5e-4, atol=1e-6)


def test_ind_with_mass_matrix():
    """Index-1 DAE: y1' = -y1, 0 = y2 - y1 => dy(T)/dy1(0) = e^-T in BOTH
    components, zero sensitivity to the (determined) algebraic variable."""
    mass = jnp.diag(jnp.array([1.0, 0.0]))

    def f(t, y, args):
        return jnp.stack([-y[..., 0], y[..., 1] - y[..., 0]], axis=-1)

    y0 = jnp.array([[1.0, 1.0]])
    seeds = _identity_seeds(1, 2)
    sol = solve_radau(f, 0.0, 1.5, y0, mass=mass,
                      options=Options(rtol=1e-10, atol=1e-13),
                      tangents=seeds)
    assert int(sol.status[0]) == SUCCESS
    e = np.exp(-1.5)
    np.testing.assert_allclose(np.asarray(sol.sens[0, 0]), [e, e],
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(sol.sens[1, 0]), [0.0, 0.0],
                               atol=1e-8)


def test_ind_with_batched_mass_matrix():
    """Per-lane mass matrices [M,D,D] through the IND tangent sweep
    (regression: the tangent mdot used to reshape wd to [K, M*s, D], which
    the batched-mass einsum rejects at trace time)."""
    m = 2
    # lane 0: plain ODE mass = I; lane 1: index-1 DAE mass = diag(1, 0)
    mass = jnp.stack([jnp.eye(2), jnp.diag(jnp.array([1.0, 0.0]))])

    def f(t, y, args):
        return jnp.stack([-y[..., 0], y[..., 1] - y[..., 0]], axis=-1)

    y0 = jnp.array([[1.0, 0.3], [1.0, 1.0]])   # lane 1 consistent (y2 = y1)
    seeds = _identity_seeds(m, 2)
    opts = Options(rtol=1e-10, atol=1e-13)
    sol = solve_radau(f, 0.0, 1.0, y0, mass=mass, options=opts,
                      tangents=seeds)
    assert bool(jnp.all(sol.status == SUCCESS))

    def final(z):
        return solve_radau(f, 0.0, 1.0, z, mass=mass, options=opts).y

    J = jnp.stack([jax.jvp(final, (y0,), (seeds[k],))[1] for k in range(2)])
    np.testing.assert_allclose(np.asarray(sol.sens), np.asarray(J),
                               rtol=1e-5, atol=1e-8)


def test_ind_reverse_time():
    def f(t, y, args):
        return -0.7 * y

    y0 = jnp.array([[1.3, -0.4]])
    seeds = _identity_seeds(1, 2)
    sol = solve_radau(f, 2.0, 0.0, y0, options=Options(rtol=1e-10,
                                                       atol=1e-13),
                      tangents=seeds)
    assert int(sol.status[0]) == SUCCESS
    g = np.exp(0.7 * 2.0)           # backward flow expands
    np.testing.assert_allclose(np.asarray(sol.sens[0, 0]), [g, 0.0],
                               rtol=1e-7, atol=1e-9)


def test_ind_dense_tangent_output():
    """tangents + t_eval: Solution.sens_ys is the tangent of the collocation
    interpolant (reference ntrprad on TensorDual); oracle = jvp through
    dense solves at each grid point via the full transform."""
    mu, tf = 5.0, 2.0
    m = 2
    y0 = jnp.array([[2.0, 0.0], [1.0, 0.5]])
    mus = jnp.array([mu, 3.0])
    opts = Options(rtol=1e-10, atol=1e-13)
    seeds = _identity_seeds(m, 2)
    grid = jnp.array([0.4, 1.0, 1.7])

    sol = solve_radau(vdp_rhs, 0.0, tf, y0, args=mus, options=opts,
                      jac=vdp_jac, tangents=seeds, t_eval=grid)
    assert bool(jnp.all(sol.status == SUCCESS))
    assert sol.sens_ys.shape == (2, m, 3, 2)
    # dense primal consistency
    assert sol.ys.shape == (m, 3, 2)

    def at_grid(z):
        s = solve_radau(vdp_rhs, 0.0, tf, z, args=mus, options=opts,
                        jac=vdp_jac, t_eval=grid)
        return s.ys

    for k in range(2):
        _, want = jax.jvp(at_grid, (y0,), (seeds[k],))
        np.testing.assert_allclose(np.asarray(sol.sens_ys[k]),
                                   np.asarray(want), rtol=5e-5, atol=1e-8)


def test_ind_event_sensitivity_correction():
    """Terminal event g = y − c on scalar decay y' = −a·y: y(t*) ≡ c for
    every y0, so the TOTAL derivative dy(t*)/dy0 is exactly 0 — while the
    uncorrected state tangent at t* is c/y0. Verifies the implicit-function
    correction dt* = −(g_y·yd)/(g_t + g_y·f)."""
    from janus_tpu.solve.events import Event

    a, c = 0.8, 0.5
    y0 = jnp.array([[2.0]])
    ev = Event(lambda t, y, args: y[:, 0] - c, terminal=True)
    sol = solve_radau(lambda t, y, args: -a * y, 0.0, 10.0, y0,
                      options=Options(rtol=1e-10, atol=1e-13),
                      tangents=jnp.ones((1, 1, 1)), events=ev)
    from janus_tpu.solve import EVENT_TERMINATED
    assert int(sol.status[0]) == EVENT_TERMINATED
    t_star = np.log(2.0 / c) / a
    np.testing.assert_allclose(float(sol.t[0]), t_star, rtol=1e-8)
    # uncorrected tangent would be c / y0 = 0.25; corrected is 0
    np.testing.assert_allclose(float(sol.sens[0, 0, 0]), 0.0, atol=1e-7)


def test_ind_event_sensitivity_vs_fd():
    """Moving-event total derivative on VdP vs FD re-solves (the event time
    shifts with y0; FD of y at the event captures the total derivative)."""
    from janus_tpu.solve.events import Event

    def rhs(t, y, a):
        return jnp.stack([y[..., 1], -y[..., 0] - 0.3 * y[..., 1]], axis=-1)

    tf = 10.0
    opts = Options(rtol=1e-11, atol=1e-14)
    ev = Event(lambda t, y, args: y[:, 0] - 0.2, terminal=True,
               direction=-1.0)
    y0 = jnp.array([[2.0, 0.0]])
    seeds = _identity_seeds(1, 2)

    sol = solve_radau(rhs, 0.0, tf, y0, options=opts,
                      tangents=seeds, events=ev)
    from janus_tpu.solve import EVENT_TERMINATED
    assert int(sol.status[0]) == EVENT_TERMINATED

    eps = 1e-6
    for k in range(2):
        sp = solve_radau(rhs, 0.0, tf, y0 + eps * seeds[k],
                         options=opts, events=ev)
        sm = solve_radau(rhs, 0.0, tf, y0 - eps * seeds[k],
                         options=opts, events=ev)
        fd = (sp.y - sm.y) / (2 * eps)
        np.testing.assert_allclose(np.asarray(sol.sens[k]), np.asarray(fd),
                                   rtol=5e-5, atol=1e-8)


def test_ind_parameter_sensitivity():
    """args_tangents: dy(T)/dmu for stiff VdP vs jvp-through-solve and FD.
    Mixed case: direction 0 = pure parameter seed, direction 1 = pure y0
    seed — one IND solve carries both."""
    tf = 0.6
    m = 2
    y0 = jnp.tile(jnp.array([[2.0, 0.0]]), (m, 1))
    mus = jnp.array([20.0, 80.0])
    opts = Options(rtol=1e-9, atol=1e-12)

    seeds_y = jnp.stack([jnp.zeros((m, 2)),
                         jnp.zeros((m, 2)).at[:, 0].set(1.0)])
    seeds_mu = jnp.stack([jnp.ones((m,)), jnp.zeros((m,))])

    sol = solve_radau(vdp_rhs, 0.0, tf, y0, args=mus, options=opts,
                      jac=vdp_jac, tangents=seeds_y, args_tangents=seeds_mu)
    assert bool(jnp.all(sol.status == SUCCESS))

    def final(z, mm):
        return solve_radau(vdp_rhs, 0.0, tf, z, args=mm, options=opts,
                           jac=vdp_jac).y

    # direction 0: d/dmu (all lanes)
    _, dmu = jax.jvp(final, (y0, mus), (jnp.zeros_like(y0),
                                        jnp.ones_like(mus)))
    np.testing.assert_allclose(np.asarray(sol.sens[0]), np.asarray(dmu),
                               rtol=3e-4, atol=1e-8)
    eps = 1e-6
    fd = (final(y0, mus + eps) - final(y0, mus - eps)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(sol.sens[0]), np.asarray(fd),
                               rtol=5e-4, atol=1e-6)

    # direction 1: d/dy1(0)
    _, dy0 = jax.jvp(final, (y0, mus),
                     (jnp.zeros_like(y0).at[:, 0].set(1.0),
                      jnp.zeros_like(mus)))
    np.testing.assert_allclose(np.asarray(sol.sens[1]), np.asarray(dy0),
                               rtol=3e-4, atol=1e-7)


def test_ind_args_only():
    """args_tangents alone (y0 seeds implicit zero)."""
    def f(t, y, a):
        return -a[:, None] * y

    y0 = jnp.array([[2.0, 1.0]])
    a = jnp.array([0.8])
    sol = solve_radau(f, 0.0, 1.0, y0, args=a,
                      options=Options(rtol=1e-10, atol=1e-13),
                      args_tangents=jnp.ones((1, 1)))
    assert int(sol.status[0]) == SUCCESS
    # y = y0 e^{-a t}; dy/da = -t y
    want = -1.0 * np.asarray(y0[0]) * np.exp(-0.8)
    np.testing.assert_allclose(np.asarray(sol.sens[0, 0]), want, rtol=1e-7)


def test_shooting_newton_with_ind_jacobian():
    """Boundary-value shooting with the Newton Jacobian built from ONE IND
    solve (identity tangents) instead of N jvp re-solves: hit y-target for
    a batch of damped oscillators; must match the AD-Jacobian Newton."""
    from janus_tpu.control import newton_solve

    m, d = 3, 2
    target = jnp.asarray(np.array([[0.3, -0.1], [0.0, 0.5], [-0.2, -0.2]]))
    ks = jnp.array([1.0, 2.0, 4.0])
    tf = 1.3

    def rhs(t, y, k):
        return jnp.stack([y[..., 1], -k * y[..., 0] - 0.2 * y[..., 1]],
                         axis=-1)

    opts = Options(rtol=1e-10, atol=1e-13)
    seeds = _identity_seeds(m, d)

    def residual(x):
        return solve_radau(rhs, 0.0, tf, x, args=ks, options=opts).y - target

    def ind_jac(x):
        sol = solve_radau(rhs, 0.0, tf, x, args=ks, options=opts,
                          tangents=seeds)
        return jnp.transpose(sol.sens, (1, 2, 0))     # [M, D(out), D(in)]

    x0 = jnp.zeros((m, d))
    r_ind = newton_solve(residual, x0, tol=1e-9, jac=ind_jac)
    r_ad = newton_solve(residual, x0, tol=1e-9)
    assert bool(jnp.all(r_ind.converged)) and bool(jnp.all(r_ad.converged))
    np.testing.assert_allclose(np.asarray(r_ind.x), np.asarray(r_ad.x),
                               rtol=1e-7, atol=1e-9)
    # both hit the target
    np.testing.assert_allclose(
        np.asarray(solve_radau(rhs, 0.0, tf, r_ind.x, args=ks,
                               options=opts).y),
        np.asarray(target), rtol=1e-7, atol=1e-8)


def test_ind_event_param_dependence_and_mass():
    """The two event-tangent terms the plain formula misses (found by
    review, fixed together): (1) an event function touching a SEEDED
    parameter contributes −g_θ·dθ_k to dt*_k; (2) with a mass matrix the
    velocity in the correction is ẏ* = M⁻¹f, not f. System: M·y' = f
    (M = diag(2, 1)), event g = y0 − c with c seeded. FD oracle."""
    from janus_tpu.solve.events import Event
    from janus_tpu.solve import EVENT_TERMINATED

    mass = jnp.diag(jnp.array([2.0, 1.0]))

    def rhs(t, y, p):
        return jnp.stack([-p["a"] * y[:, 0] - 0.1 * y[:, 1],
                          -0.5 * y[:, 1] + 0.2 * y[:, 0]], axis=-1)

    ev = Event(lambda t, y, p: y[:, 0] - p["c"], terminal=True,
               direction=-1.0)
    y0 = jnp.array([[2.0, 1.0]])
    p0 = {"a": jnp.array([0.9]), "c": jnp.array([0.7])}
    opts = Options(rtol=1e-11, atol=1e-14)

    # K=2 directions: d/da and d/dc (pure parameter seeds)
    seeds = jnp.zeros((2, 1, 2))
    args_t = {"a": jnp.array([[1.0], [0.0]]), "c": jnp.array([[0.0], [1.0]])}
    sol = solve_radau(rhs, 0.0, 20.0, y0, args=p0, options=opts, mass=mass,
                      tangents=seeds, args_tangents=args_t, events=ev)
    assert int(sol.status[0]) == EVENT_TERMINATED

    eps = 1e-6
    for k, name in enumerate(("a", "c")):
        pp = dict(p0); pm = dict(p0)
        pp[name] = p0[name] + eps
        pm[name] = p0[name] - eps
        sp = solve_radau(rhs, 0.0, 20.0, y0, args=pp, options=opts,
                         mass=mass, events=ev)
        sm = solve_radau(rhs, 0.0, 20.0, y0, args=pm, options=opts,
                         mass=mass, events=ev)
        fd_y = (sp.y - sm.y) / (2 * eps)
        fd_t = (sp.t - sm.t) / (2 * eps)
        np.testing.assert_allclose(np.asarray(sol.sens[k]),
                                   np.asarray(fd_y), rtol=1e-4, atol=1e-7,
                                   err_msg=f"dy*/d{name}")
        np.testing.assert_allclose(np.asarray(sol.sens_t[k]),
                                   np.asarray(fd_t), rtol=1e-4, atol=1e-7,
                                   err_msg=f"dt*/d{name}")
    # the c-direction is the sharp check: y0(t*) ≡ c ⇒ dy0*/dc = 1 exactly,
    # and dt*/dc = 1/ẏ0* = M00/f0(t*, y*) — both zero under the old formula
    np.testing.assert_allclose(float(sol.sens[1, 0, 0]), 1.0, rtol=1e-6)


def test_ind_dense_tangents_with_terminal_event():
    """tangents + t_eval + events compose: sens_ys (and ys) carry dense
    values up to t* and NaN strictly past it — the static-shape analog of
    scipy's t_eval truncation. Analytic oracle: y' = −a·y gives
    yd(t) = e^{−a t}·seed at every sample before the event."""
    from janus_tpu.solve.events import Event
    from janus_tpu.solve import EVENT_TERMINATED

    a, c = 0.8, 0.5
    y0 = jnp.array([[2.0]])
    t_star = np.log(2.0 / c) / a                     # ≈ 1.7329
    grid = jnp.array([0.5, 1.0, 1.5, 2.5])
    ev = Event(lambda t, y, args: y[:, 0] - c, terminal=True)
    sol = solve_radau(lambda t, y, args: -a * y, 0.0, 10.0, y0,
                      options=Options(rtol=1e-10, atol=1e-13),
                      tangents=jnp.ones((1, 1, 1)), events=ev, t_eval=grid)
    assert int(sol.status[0]) == EVENT_TERMINATED
    np.testing.assert_allclose(float(sol.t[0]), t_star, rtol=1e-7)

    ys = np.asarray(sol.ys)[0]                       # [T, 1]
    sd = np.asarray(sol.sens_ys)[0, 0]               # [T, 1]
    tg = np.asarray(grid)
    alive = tg < t_star
    np.testing.assert_allclose(ys[alive, 0], 2.0 * np.exp(-a * tg[alive]),
                               rtol=1e-7)
    np.testing.assert_allclose(sd[alive, 0], np.exp(-a * tg[alive]),
                               rtol=1e-6)
    assert np.all(np.isnan(ys[~alive]))
    assert np.all(np.isnan(sd[~alive]))
