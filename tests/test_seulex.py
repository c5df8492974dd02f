"""Deep-SEULEX tests: KMAXX ladder, theta-gated Jacobian reuse, stability
check, mass matrix, events, and the work-per-accuracy criterion vs radau.

Reference analog: src/python/seulexted.py (NR StepperSie batched):
nseq/cost ladder :53-87, theta/jac_redo gating :328, stability check :1020.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp as ss

# slow tier (re-tiered from the measured round-5 fast-tier survey:
# extrapolation-ladder compiles (570 s measured); fast-tier seulex signal lives in test_stiff_methods/test_method_zoo_linear)
pytestmark = pytest.mark.slow

from janus_tpu.solve import solve_ivp, Options, SUCCESS, EVENT_TERMINATED
from janus_tpu.solve.events import Event
from janus_tpu.models.problems import vdp_rhs, robertson_rhs, harmonic_rhs


def test_beats_radau_on_work_per_accuracy():
    """Stiff VdP at rtol 1e-7: SEULEX's high-order extrapolation takes far
    fewer steps AND less total modeled work than radau at matched accuracy
    (the reference's own cost model: f=1, jac=5, lu=1 units)."""
    mu = 1000.0
    ref = ss(lambda t, y: [y[1], mu * (1 - y[0] ** 2) * y[1] - y[0]],
             (0.0, 20.0), [2.0, 0.0], method="Radau", rtol=1e-12, atol=1e-14)
    res = {}
    for method in ("seulex", "radau"):
        sol = solve_ivp(vdp_rhs, (0.0, 20.0), jnp.array([[2.0, 0.0]]),
                        method=method, args=mu, rtol=1e-7, atol=1e-10)
        assert int(sol.status[0]) == SUCCESS
        err = np.max(np.abs(np.asarray(sol.y[0]) - ref.y[:, -1]))
        assert err < 1e-6, (method, err)
        s = sol.stats
        # LU work scales with the cube of the matrix size: radau5 factors one
        # DxD real + one 2Dx2D split-complex block (8 DxD units) per refresh;
        # its nlu counter ticks 2 per refresh -> 4.5 DxD units per tick.
        lu_units = 4.5 if method == "radau" else 1.0
        work = (int(s["nfev"][0]) + 5 * int(s["njev"][0])
                + lu_units * int(s["nlu"][0]))
        res[method] = dict(work=work, nsteps=int(s["nsteps"][0]))
    assert res["seulex"]["nsteps"] < 0.6 * res["radau"]["nsteps"], res
    assert res["seulex"]["work"] < res["radau"]["work"], res


def test_theta_gated_jacobian_reuse():
    """At loose tolerance (jac_redo = 1e-4) the theta gate must skip
    Jacobian refreshes on a healthy fraction of accepted steps."""
    mu = 1000.0
    sol = solve_ivp(vdp_rhs, (0.0, 20.0), jnp.array([[2.0, 0.0]]),
                    method="seulex", args=mu, rtol=1e-4, atol=1e-7)
    assert int(sol.status[0]) == SUCCESS
    njev, nacc = int(sol.stats["njev"][0]), int(sol.stats["naccept"][0])
    assert njev < nacc, (njev, nacc)


def test_high_order_reached_at_tight_tol():
    """Tight tolerance drives the ladder deep (order = k_targ+1 >= 5) —
    exercises levels the old 6-level ladder never had."""
    sol = solve_ivp(harmonic_rhs, (0.0, 10.0), jnp.array([[1.0, 0.0]]),
                    method="seulex", args=1.0, rtol=1e-11, atol=1e-13)
    assert int(sol.status[0]) == SUCCESS
    np.testing.assert_allclose(sol.y[0], [np.cos(10.0), -np.sin(10.0)],
                               atol=1e-9)
    assert int(sol.stats["order"][0]) >= 5


def test_stability_check_handles_explosive_start():
    """y' = y^2, blow-up at t=1: integrating to t=0.999 forces tiny h near
    the pole — the stability check + controller must survive (reference
    stability_check role, seulexted.py:1020)."""
    def f(t, y, args):
        return y * y

    sol = solve_ivp(f, (0.0, 0.999), jnp.array([[1.0]]), method="seulex",
                    rtol=1e-6, atol=1e-9)
    assert int(sol.status[0]) == SUCCESS
    np.testing.assert_allclose(float(sol.y[0, 0]), 1.0 / (1.0 - 0.999),
                               rtol=1e-4)


def test_mass_matrix_index1_dae():
    def dae(t, y, args):
        return jnp.stack([-y[..., 0], y[..., 1] - y[..., 0] ** 2], axis=-1)

    mass = jnp.diag(jnp.array([1.0, 0.0]))
    sol = solve_ivp(dae, (0.0, 1.0), jnp.array([[1.0, 1.0]]),
                    method="seulex", mass=mass, rtol=1e-8, atol=1e-11)
    assert int(sol.status[0]) == SUCCESS
    np.testing.assert_allclose(float(sol.y[0, 0]), np.exp(-1.0), rtol=1e-6)
    np.testing.assert_allclose(float(sol.y[0, 1]), np.exp(-2.0), rtol=1e-5)


def test_events_terminal():
    ev = Event(lambda t, y, args: y[..., 0], terminal=True, direction=-1.0)
    sol = solve_ivp(harmonic_rhs, (0.0, 10.0), jnp.array([[1.0, 0.0]]),
                    method="seulex", args=1.0, rtol=1e-8, atol=1e-11,
                    events=ev)
    assert int(sol.status[0]) == EVENT_TERMINATED
    np.testing.assert_allclose(float(sol.event_t[0]), np.pi / 2, atol=1e-4)


def test_robertson_long():
    ref = ss(lambda t, y: [-0.04 * y[0] + 1e4 * y[1] * y[2],
                           0.04 * y[0] - 1e4 * y[1] * y[2] - 3e7 * y[1] ** 2,
                           3e7 * y[1] ** 2],
             (0.0, 1e4), [1.0, 0.0, 0.0], method="Radau",
             rtol=1e-10, atol=1e-14)
    sol = solve_ivp(robertson_rhs, (0.0, 1e4), jnp.array([[1.0, 0.0, 0.0]]),
                    method="seulex", rtol=1e-7, atol=1e-12)
    assert int(sol.status[0]) == SUCCESS
    np.testing.assert_allclose(sol.y[0], ref.y[:, -1], rtol=2e-4, atol=1e-9)


def test_reverse_time():
    sol = solve_ivp(harmonic_rhs, (2.0, 0.0),
                    jnp.array([[np.cos(2.0), -np.sin(2.0)]]),
                    method="seulex", args=1.0, rtol=1e-8, atol=1e-11)
    assert int(sol.status[0]) == SUCCESS
    np.testing.assert_allclose(sol.y[0], [1.0, 0.0], atol=1e-6)


def test_heterogeneous_batch_ktarg_divergence():
    """Lanes with wildly different stiffness settle to different k_targ."""
    mus = jnp.array([1.0, 1000.0])
    y0 = jnp.tile(jnp.array([[2.0, 0.0]]), (2, 1))
    sol = solve_ivp(vdp_rhs, (0.0, 2.0), y0, method="seulex", args=mus,
                    rtol=1e-8, atol=1e-11)
    assert bool(jnp.all(sol.status == SUCCESS))
    for i, mu in enumerate(np.asarray(mus)):
        ref = ss(lambda t, y: [y[1], mu * (1 - y[0] ** 2) * y[1] - y[0]],
                 (0.0, 2.0), [2.0, 0.0], method="Radau",
                 rtol=1e-11, atol=1e-14)
        np.testing.assert_allclose(sol.y[i], ref.y[:, -1],
                                   rtol=1e-5, atol=1e-7)


def test_ind_tangents_match_jvp_and_fd():
    """First-class SEULEX IND tangents (the reference's seulexted dual
    architecture): y0 + parameter seeds vs jvp through the solve and FD
    re-solves on a stiff VdP batch."""
    import jax

    m = 2
    y0 = jnp.array([[2.0, 0.0], [1.7, 0.3]])
    mus = jnp.array([50.0, 200.0])
    opts = Options(rtol=1e-9, atol=1e-12)
    seeds = jnp.stack([jnp.zeros((m, 2)).at[:, 0].set(1.0),
                       jnp.zeros((m, 2)).at[:, 1].set(1.0),
                       jnp.zeros((m, 2))])
    dmu = jnp.stack([jnp.zeros(m), jnp.zeros(m), jnp.ones(m)])

    sol = solve_ivp(vdp_rhs, (0.0, 1.0), y0, method="seulex", args=mus,
                    options=opts, tangents=seeds, args_tangents=dmu)
    assert bool(jnp.all(sol.status == SUCCESS))
    assert sol.sens.shape == (3, m, 2)

    def final(z, mm):
        return solve_ivp(vdp_rhs, (0.0, 1.0), z, method="seulex", args=mm,
                         options=opts).y

    for k in range(3):
        # IND (frozen ladder/controller) vs full jvp: same variational ODE,
        # different consistent discretizations -> agree to O(step error)
        _, dy = jax.jvp(final, (y0, mus), (seeds[k], dmu[k]))
        np.testing.assert_allclose(np.asarray(sol.sens[k]), np.asarray(dy),
                                   rtol=5e-4, atol=1e-7)
        eps = 1e-6
        fd = (final(y0 + eps * seeds[k], mus + eps * dmu[k])
              - final(y0 - eps * seeds[k], mus - eps * dmu[k])) / (2 * eps)
        np.testing.assert_allclose(np.asarray(sol.sens[k]), np.asarray(fd),
                                   rtol=5e-4, atol=1e-6)


def test_ind_tangents_mass_matrix():
    """IND through the (M/h' − J) substeps with an invertible mass matrix."""
    import jax

    mass = jnp.array([[2.0, 0.3], [0.1, 1.5]])
    y0 = jnp.array([[1.0, 0.0]])

    def fm(t, y, a):
        return jnp.stack([y[:, 1], -a * y[:, 0] - 0.2 * y[:, 1]], axis=-1)

    opts = Options(rtol=1e-10, atol=1e-13)
    seeds = jnp.array([[[1.0, 0.0]], [[0.0, 1.0]]])
    sol = solve_ivp(fm, (0.0, 3.0), y0, method="seulex", args=1.7,
                    options=opts, mass=mass, tangents=seeds)
    assert bool(jnp.all(sol.status == SUCCESS))

    def final(z):
        return solve_ivp(fm, (0.0, 3.0), z, method="seulex", args=1.7,
                         options=opts, mass=mass).y

    for k in range(2):
        _, dy = jax.jvp(final, (y0,), (seeds[k],))
        np.testing.assert_allclose(np.asarray(sol.sens[k]), np.asarray(dy),
                                   rtol=1e-5, atol=1e-9)


def test_ind_tangents_terminal_mode_only():
    y0 = jnp.zeros((1, 2))
    seeds = jnp.zeros((1, 1, 2))
    with pytest.raises(ValueError, match="terminal-mode"):
        solve_ivp(vdp_rhs, (0.0, 1.0), y0, method="seulex",
                  args=jnp.ones(1), tangents=seeds,
                  t_eval=jnp.array([0.5]))
    with pytest.raises(ValueError, match="terminal-mode"):
        solve_ivp(vdp_rhs, (0.0, 1.0), y0, method="seulex",
                  args=jnp.ones(1), tangents=seeds,
                  events=Event(lambda t, y, a: y[:, 0], terminal=True))


def test_dual_solve_ivp_routes_seulex_to_ind():
    """The jet fast path now routes seulex terminal requests to the IND
    sweep (no fallback warning) and matches the transform path."""
    import warnings

    import jax
    from janus_tpu.jet import Jet
    from janus_tpu.jet.solve import dual_solve_ivp

    y0 = jnp.array([[2.0, 0.0]])
    seeds = jnp.array([[[1.0, 0.0]], [[0.0, 1.0]]])
    opts = Options(rtol=1e-9, atol=1e-12)
    with warnings.catch_warnings():
        warnings.simplefilter("error")       # any fallback warning fails
        yj, tj, sol = dual_solve_ivp(vdp_rhs, (0.0, 1.0), Jet(y0, seeds),
                                     method="seulex", args=100.0,
                                     options=opts)
    assert sol.sens is not None              # the IND path ran

    def final(z):
        return solve_ivp(vdp_rhs, (0.0, 1.0), z, method="seulex",
                         args=100.0, options=opts).y

    for k in range(2):
        _, dy = jax.jvp(final, (y0,), (seeds[k],))
        np.testing.assert_allclose(np.asarray(yj.d[k]), np.asarray(dy),
                                   rtol=5e-4, atol=1e-7)


def test_dense_mesh_interpolate():
    """dense=N stores the extrapolation interpolant in the shared power
    basis: Solution.interpolate(ts) must equal the t_eval sampling path
    exactly (same polynomial, two evaluation routes) on both the quartic
    (no mass) and quadratic (mass) branches, clamp beyond-span queries,
    and NaN on ring overflow."""
    y0 = jnp.array([[2.0, 0.0], [1.5, 0.3]])
    mu = jnp.array([100.0, 800.0])
    ts = jnp.linspace(0.1, 3.0, 17)
    kw = dict(method="seulex", args=mu, rtol=1e-8, atol=1e-11)
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
        # interpolant accuracy plateaus at its quartic O(h^5) (documented)
        np.testing.assert_allclose(np.asarray(yi[i]).T, r.y,
                                   rtol=0, atol=5e-5)
    ye = s_d.interpolate(jnp.array([3.0, 99.0]))
    np.testing.assert_allclose(
        np.asarray(ye),
        np.broadcast_to(np.asarray(s_d.y)[:, None, :], ye.shape), atol=0)
    assert bool(jnp.all(jnp.isnan(
        solve_ivp(vdp_rhs, (0.0, 3.0), y0, dense=4, **kw).interpolate(ts))))

    # mass branch (quadratic through y0/ymid/y1)
    M = jnp.array([[2.0, 0.0], [0.0, 2.0]])

    def rhs2(t, y, a):
        return 2.0 * harmonic_rhs(t, y, a)

    mkw = dict(method="seulex", args=1.0, mass=M, rtol=1e-8, atol=1e-11)
    sm = solve_ivp(rhs2, (0.0, 3.0), jnp.array([[1.0, 0.0]]), dense=256,
                   **mkw)
    smt = solve_ivp(rhs2, (0.0, 3.0), jnp.array([[1.0, 0.0]]), t_eval=ts,
                    **mkw)
    np.testing.assert_allclose(np.asarray(sm.interpolate(ts)),
                               np.asarray(smt.ys), rtol=0, atol=1e-13)
