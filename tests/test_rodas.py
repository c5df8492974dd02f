"""RODAS4 oracle tests.

Reference analog: Hairer's public rodas.f vendored at
src/fortran/radau.f:532-940 (the reference's canonical stiff oracle).
Patterns per SURVEY.md §4: scipy cross-checks at matched tolerance, empirical
convergence-order verification of the published coefficient set, index-1 DAE
where the non-stiffly-accurate GRK4T degrades, dense output, events.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp as ss

from janus_tpu.solve import solve_ivp, Options, SUCCESS, EVENT_TERMINATED
from janus_tpu.solve.events import Event
from janus_tpu.models.problems import vdp_rhs, robertson_rhs, harmonic_rhs


def test_stiff_vdp_scipy_parity():
    mu = 1000.0
    ref = ss(lambda t, y: [y[1], mu * (1 - y[0] ** 2) * y[1] - y[0]],
             (0.0, 2.0), [2.0, 0.0], method="Radau", rtol=1e-10, atol=1e-13)
    sol = solve_ivp(vdp_rhs, (0.0, 2.0), jnp.array([[2.0, 0.0]]),
                    method="rodas", args=mu, rtol=1e-7, atol=1e-10)
    assert int(sol.status[0]) == SUCCESS
    np.testing.assert_allclose(sol.y[0], ref.y[:, -1], rtol=1e-5, atol=1e-8)
    assert int(sol.stats["nsteps"][0]) < 200


def test_convergence_order_4():
    """Fixed-step error must shrink ~h^4 — pins the published tableau.

    (An incorrect a_ij/c_ij entry would drop the observed order to <= 3.)
    """
    def f(t, y, args):
        return y * jnp.sin(t)[..., None]     # y' = y sin t, non-autonomous

    exact = float(np.exp(1.0 - np.cos(2.0)))
    errs = []
    for n in (20, 40, 80):
        h = 2.0 / n
        sol = solve_ivp(f, (0.0, 2.0), jnp.array([[1.0]]), method="rodas",
                        options=Options(h0=h, min_factor=1.0, max_factor=1.0,
                                        rtol=10.0, atol=10.0))
        errs.append(abs(float(sol.y[0, 0]) - exact))
    r1 = np.log2(errs[0] / errs[1])
    r2 = np.log2(errs[1] / errs[2])
    assert r1 > 3.6 and r2 > 3.6, (errs, r1, r2)


def test_index1_dae_beats_grk4t():
    """Index-1 DAE solved by RODAS; GRK4T (not stiffly accurate, no mass
    support) cannot take this problem at all — solve_ivp raises."""

    def dae(t, y, args):
        # y1' = -y1; 0 = y2 - y1**2  (mass = diag(1, 0))
        return jnp.stack([-y[..., 0], y[..., 1] - y[..., 0] ** 2], axis=-1)

    mass = jnp.diag(jnp.array([1.0, 0.0]))
    sol = solve_ivp(dae, (0.0, 1.0), jnp.array([[1.0, 1.0]]),
                    method="rodas", mass=mass, rtol=1e-8, atol=1e-11)
    assert int(sol.status[0]) == SUCCESS
    np.testing.assert_allclose(float(sol.y[0, 0]), np.exp(-1.0), rtol=1e-7)
    np.testing.assert_allclose(float(sol.y[0, 1]), np.exp(-2.0), rtol=1e-6)
    with pytest.raises(ValueError, match="mass"):
        solve_ivp(dae, (0.0, 1.0), jnp.array([[1.0, 1.0]]),
                  method="grk4t", mass=mass, rtol=1e-8, atol=1e-11)


def test_robertson():
    ref = ss(lambda t, y: [-0.04 * y[0] + 1e4 * y[1] * y[2],
                           0.04 * y[0] - 1e4 * y[1] * y[2] - 3e7 * y[1] ** 2,
                           3e7 * y[1] ** 2],
             (0.0, 100.0), [1.0, 0.0, 0.0], method="Radau",
             rtol=1e-10, atol=1e-14)
    sol = solve_ivp(robertson_rhs, (0.0, 100.0), jnp.array([[1.0, 0.0, 0.0]]),
                    method="rodas", rtol=1e-7, atol=1e-11)
    assert int(sol.status[0]) == SUCCESS
    np.testing.assert_allclose(sol.y[0], ref.y[:, -1], rtol=1e-4, atol=1e-9)


def test_dense_output_cubic():
    t_eval = jnp.linspace(0.0, 6.0, 31)
    sol = solve_ivp(harmonic_rhs, (0.0, 6.0), jnp.array([[1.0, 0.0]]),
                    method="rodas", args=1.0, rtol=1e-8, atol=1e-11,
                    t_eval=t_eval)
    assert int(sol.status[0]) == SUCCESS
    np.testing.assert_allclose(sol.ys[0, :, 0], np.cos(np.asarray(t_eval)),
                               atol=1e-5)


def test_events_terminal():
    ev = Event(lambda t, y, args: y[..., 0], terminal=True, direction=-1.0)
    sol = solve_ivp(harmonic_rhs, (0.0, 10.0), jnp.array([[1.0, 0.0]]),
                    method="rodas", args=1.0, rtol=1e-8, atol=1e-11,
                    events=ev)
    assert int(sol.status[0]) == EVENT_TERMINATED
    np.testing.assert_allclose(float(sol.event_t[0]), np.pi / 2, atol=1e-6)


def test_reverse_time():
    sol = solve_ivp(harmonic_rhs, (2.0, 0.0),
                    jnp.array([[np.cos(2.0), -np.sin(2.0)]]),
                    method="rodas", args=1.0, rtol=1e-8, atol=1e-11)
    assert int(sol.status[0]) == SUCCESS
    np.testing.assert_allclose(sol.y[0], [1.0, 0.0], atol=1e-6)


def test_heterogeneous_batch():
    mus = jnp.array([1.0, 100.0, 1000.0])
    y0 = jnp.tile(jnp.array([[2.0, 0.0]]), (3, 1))
    sol = solve_ivp(vdp_rhs, (0.0, 2.0), y0, method="rodas", args=mus,
                    rtol=1e-6, atol=1e-9)
    assert bool(jnp.all(sol.status == SUCCESS))
    for i, mu in enumerate(np.asarray(mus)):
        ref = ss(lambda t, y: [y[1], mu * (1 - y[0] ** 2) * y[1] - y[0]],
                 (0.0, 2.0), [2.0, 0.0], method="Radau",
                 rtol=1e-10, atol=1e-13)
        np.testing.assert_allclose(sol.y[i], ref.y[:, -1],
                                   rtol=5e-4, atol=1e-6)


# ---------- first-class IND tangents (solve_rodas(tangents=)) ----------
# The reference's solve_LUdual role on its Rosenbrock family
# (rosenbrock_torch_gmres): tangent increments reuse the step's factored
# E = M/(h*gamma) - J, with the exact dJ[delta]*k_i second-order terms
# (RODAS is not a W-method, so they are required for full tangent order).

def _ident_seeds(m, d):
    return jnp.stack([jnp.zeros((m, d)).at[:, j].set(1.0) for j in range(d)])


def test_rodas_ind_matches_jvp_and_fd():
    import jax
    m = 3
    y0 = jnp.tile(jnp.array([[2.0, 0.0]]), (m, 1))
    mus = jnp.array([30.0, 100.0, 300.0])
    opts = Options(rtol=1e-9, atol=1e-12)
    seeds = _ident_seeds(m, 2)

    sol = solve_ivp(vdp_rhs, (0.0, 1.0), y0, method="rodas", args=mus,
                    options=opts, tangents=seeds)
    assert bool(jnp.all(sol.status == SUCCESS))
    assert sol.sens.shape == (2, m, 2)

    def final(z):
        return solve_ivp(vdp_rhs, (0.0, 1.0), z, method="rodas", args=mus,
                         options=opts).y

    # IND (frozen step sequence) vs jvp (controller differentiated): agree
    # to O(tolerance-driven mesh error), not machine precision
    Jjvp = jnp.stack([jax.jvp(final, (y0,), (seeds[k],))[1]
                      for k in range(2)])
    np.testing.assert_allclose(np.asarray(sol.sens), np.asarray(Jjvp),
                               rtol=3e-4, atol=1e-6)

    eps = 1e-6
    for k in range(2):
        fd = (final(y0 + eps * seeds[k]) - final(y0 - eps * seeds[k])) \
            / (2 * eps)
        np.testing.assert_allclose(np.asarray(sol.sens[k]), np.asarray(fd),
                                   rtol=5e-4, atol=1e-5)


def test_rodas_ind_parameter_tangents():
    """args_tangents alone: d y(T)/d mu vs central FD."""
    m = 2
    y0 = jnp.tile(jnp.array([[2.0, 0.0]]), (m, 1))
    mus = jnp.array([50.0, 200.0])
    opts = Options(rtol=1e-9, atol=1e-12)

    sol = solve_ivp(vdp_rhs, (0.0, 1.0), y0, method="rodas", args=mus,
                    options=opts, args_tangents=jnp.ones((1, m)))
    assert bool(jnp.all(sol.status == SUCCESS))

    eps = 1e-4
    fp = solve_ivp(vdp_rhs, (0.0, 1.0), y0, method="rodas",
                   args=mus + eps, options=opts).y
    fm = solve_ivp(vdp_rhs, (0.0, 1.0), y0, method="rodas",
                   args=mus - eps, options=opts).y
    np.testing.assert_allclose(np.asarray(sol.sens[0]),
                               np.asarray((fp - fm) / (2 * eps)),
                               rtol=1e-3, atol=1e-7)


def test_rodas_ind_with_mass_dae():
    """Index-1 DAE y1' = -y1, 0 = y2 - y1: dy(T)/dy1(0) = e^-T in BOTH
    components; zero sensitivity to the determined algebraic variable."""
    mass = jnp.diag(jnp.array([1.0, 0.0]))

    def f(t, y, args):
        return jnp.stack([-y[..., 0], y[..., 1] - y[..., 0]], axis=-1)

    y0 = jnp.array([[1.0, 1.0]])
    sol = solve_ivp(f, (0.0, 1.5), y0, method="rodas", mass=mass,
                    options=Options(rtol=1e-10, atol=1e-13),
                    tangents=_ident_seeds(1, 2))
    assert int(sol.status[0]) == SUCCESS
    e = np.exp(-1.5)
    np.testing.assert_allclose(np.asarray(sol.sens[0, 0]), [e, e],
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(sol.sens[1, 0]), [0.0, 0.0],
                               atol=1e-8)


def test_rodas_ind_terminal_only_and_routing():
    """t_eval/events with tangents raise; dual_solve_ivp routes rodas
    through the fast path (sol.sens populated, no fallback warning)."""
    import warnings
    from janus_tpu.jet.core import Jet
    from janus_tpu.jet.solve import dual_solve_ivp

    y0 = jnp.array([[2.0, 0.0]])
    with pytest.raises(ValueError):
        solve_ivp(vdp_rhs, (0.0, 1.0), y0, method="rodas", args=5.0,
                  tangents=_ident_seeds(1, 2),
                  t_eval=jnp.linspace(0.0, 1.0, 5))

    y0j = Jet(y0, _ident_seeds(1, 2))
    with warnings.catch_warnings():
        warnings.simplefilter("error")       # a fallback warning = failure
        yT, _, sol = dual_solve_ivp(vdp_rhs, (0.0, 1.0), y0j, args=5.0,
                                    method="rodas", rtol=1e-8, atol=1e-11)
    assert yT.d.shape == (2, 1, 2)
    assert sol.sens is not None


def test_dense_mesh_interpolate():
    """dense=N stores the CONTRO cubic in the shared power basis:
    Solution.interpolate(ts) must equal the t_eval sampling path exactly
    (same polynomial, two evaluation routes), track scipy at tight tol,
    clamp beyond-span queries to the endpoint, and NaN on overflow."""
    y0 = jnp.array([[2.0, 0.0], [1.5, 0.3]])
    mu = jnp.array([100.0, 800.0])
    ts = jnp.linspace(0.1, 3.0, 17)
    kw = dict(method="rodas", args=mu, rtol=1e-8, atol=1e-11)
    s_d = solve_ivp(vdp_rhs, (0.0, 3.0), y0, dense=512, **kw)
    s_t = solve_ivp(vdp_rhs, (0.0, 3.0), y0, t_eval=ts, **kw)
    yi = s_d.interpolate(ts)
    assert np.all(np.asarray(s_d.status) == SUCCESS)
    np.testing.assert_allclose(np.asarray(yi), np.asarray(s_t.ys),
                               rtol=0, atol=1e-13)
    for i in range(2):
        r = ss(lambda t, y, m=float(mu[i]):
               [y[1], m * ((1 - y[0] ** 2) * y[1]) - y[0]],
               (0.0, 3.0), np.asarray(y0[i]), method="Radau",
               rtol=1e-10, atol=1e-13, t_eval=np.asarray(ts))
        np.testing.assert_allclose(np.asarray(yi[i]).T, r.y,
                                   rtol=0, atol=1e-8)
    ye = s_d.interpolate(jnp.array([3.0, 99.0]))   # endpoint + span clamp
    np.testing.assert_allclose(
        np.asarray(ye),
        np.broadcast_to(np.asarray(s_d.y)[:, None, :], ye.shape), atol=0)
    s_small = solve_ivp(vdp_rhs, (0.0, 3.0), y0, dense=4, **kw)
    assert bool(jnp.all(jnp.isnan(s_small.interpolate(ts))))
