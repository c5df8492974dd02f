"""Explicit solver integration tests vs scipy oracles at matched tolerances.

Pattern (iii) of the reference's correctness definition (SURVEY §4): oracle
comparison against scipy.integrate.solve_ivp (reference
examples/python/radau_test.py, dormand_prince_test.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp as scipy_solve

from janus_tpu.solve import solve_ivp, Options, SUCCESS
from janus_tpu.models.problems import harmonic_rhs, vdp_rhs


def scipy_vdp(mu, y0, t0, tf, rtol, atol, method="RK45", t_eval=None):
    return scipy_solve(
        lambda t, y: [y[1], mu * (1 - y[0] ** 2) * y[1] - y[0]],
        (t0, tf), y0, method=method, rtol=rtol, atol=atol, t_eval=t_eval)


@pytest.mark.parametrize("method", ["dopri5", "dopri853"])
def test_harmonic_vs_exact(method):
    m = 16
    omega = 2.0
    q0 = jnp.linspace(0.5, 1.5, m)
    y0 = jnp.stack([q0, jnp.zeros(m)], axis=-1)
    tf = 10.0
    sol = solve_ivp(harmonic_rhs, (0.0, tf), y0, method=method,
                    args=omega, rtol=1e-8, atol=1e-10)
    assert bool(jnp.all(sol.status == SUCCESS))
    exact_q = q0 * np.cos(omega * tf)
    exact_v = -q0 * omega * np.sin(omega * tf)
    np.testing.assert_allclose(sol.y[:, 0], exact_q, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(sol.y[:, 1], exact_v, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(sol.t, tf, rtol=1e-12)


@pytest.mark.parametrize("method,oracle", [("dopri5", "RK45"),
                                           ("dopri853", "DOP853")])
def test_vdp_nonstiff_vs_scipy(method, oracle):
    mu = 1.0
    y0 = np.array([2.0, 0.0])
    rtol, atol = 1e-7, 1e-9
    ref = scipy_vdp(mu, y0, 0.0, 10.0, rtol, atol, method=oracle)
    sol = solve_ivp(vdp_rhs, (0.0, 10.0), jnp.asarray(y0)[None, :],
                    method=method, args=mu, rtol=rtol, atol=atol)
    assert int(sol.status[0]) == SUCCESS
    np.testing.assert_allclose(sol.y[0], ref.y[:, -1], rtol=1e-5, atol=1e-6)
    # step counts within 2x of scipy's (sanity on the controller)
    assert int(sol.stats["nsteps"][0]) < 2 * ref.t.size + 50


@pytest.mark.parametrize("method", ["dopri5", "dopri853"])
def test_dense_output_grid(method):
    omega = 1.0
    y0 = jnp.array([[1.0, 0.0], [0.5, 0.0]])
    t_eval = jnp.linspace(0.0, 5.0, 21)
    sol = solve_ivp(harmonic_rhs, (0.0, 5.0), y0, method=method, args=omega,
                    rtol=1e-9, atol=1e-11, t_eval=t_eval)
    q_exact = np.asarray(y0)[:, :1] * np.cos(np.asarray(t_eval))[None, :]
    np.testing.assert_allclose(sol.ys[:, :, 0], q_exact, rtol=1e-6, atol=1e-7)
    assert not np.any(np.isnan(np.asarray(sol.ys)))


def test_reverse_time():
    """PosNeg/reverse integration (reference radaute_example_reverse.cpp): run
    forward then backward, recover the initial state."""
    omega = 1.3
    y0 = jnp.array([[1.0, 0.3]])
    fwd = solve_ivp(harmonic_rhs, (0.0, 4.0), y0, args=omega,
                    rtol=1e-10, atol=1e-12)
    back = solve_ivp(harmonic_rhs, (4.0, 0.0), fwd.y, args=omega,
                     rtol=1e-10, atol=1e-12)
    assert int(back.status[0]) == SUCCESS
    np.testing.assert_allclose(back.y, y0, rtol=1e-7, atol=1e-8)


def test_per_trajectory_tf():
    """Each trajectory may have its own final time."""
    omega = 1.0
    m = 4
    y0 = jnp.tile(jnp.array([[1.0, 0.0]]), (m, 1))
    tfs = jnp.array([1.0, 2.0, 3.0, 4.0])
    sol = solve_ivp(harmonic_rhs, (jnp.zeros(m), tfs), y0, args=omega,
                    rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(sol.t, tfs, rtol=1e-12)
    np.testing.assert_allclose(sol.y[:, 0], np.cos(np.asarray(tfs)),
                               rtol=1e-6)


def test_jit_and_batch_heterogeneous_mu():
    """Whole solve is jittable; heterogeneous stiffness across the batch."""
    mus = jnp.array([0.5, 1.0, 2.0, 5.0])
    y0 = jnp.tile(jnp.array([[2.0, 0.0]]), (4, 1))

    @jax.jit
    def run(y0, mus):
        return solve_ivp(vdp_rhs, (0.0, 5.0), y0, args=mus,
                         rtol=1e-7, atol=1e-9)

    sol = run(y0, mus)
    assert bool(jnp.all(sol.status == SUCCESS))
    for i, mu in enumerate(np.asarray(mus)):
        ref = scipy_vdp(float(mu), [2.0, 0.0], 0.0, 5.0, 1e-7, 1e-9)
        np.testing.assert_allclose(sol.y[i], ref.y[:, -1], rtol=1e-4,
                                   atol=1e-5)


def test_forward_sensitivity_jvp_through_solve():
    """Forward sensitivities by jax.jvp THROUGH the adaptive solve (the
    dual-number capability, reference RadauTedTest.SensitivityTest
    ode_solver_test.cpp:620-763) — FD-resolve oracle."""
    omega = 1.0
    tf = 2.0

    def final_q(q0):
        y0 = jnp.stack([q0, jnp.zeros_like(q0)], axis=-1)
        sol = solve_ivp(harmonic_rhs, (0.0, tf), y0, args=omega,
                        rtol=1e-10, atol=1e-12)
        return sol.y[:, 0]

    q0 = jnp.array([1.0, 0.7])
    primal, tangent = jax.jvp(final_q, (q0,), (jnp.ones(2),))
    # d q(T) / d q0 = cos(ω T)
    np.testing.assert_allclose(tangent, np.cos(tf) * np.ones(2), rtol=1e-6)


# ---------------------------------------------------------------------------
# dense= / quad= on the explicit family (scipy RK45/DOP853 dense_output role)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("method,tol", [("dopri5", 1e-13), ("dopri853", 1e-11)])
def test_dopri_dense_mesh_interpolate(method, tol):
    # the stored power-basis rows (Chebyshev-node re-expansion of the
    # quartic / degree-7 continuous extension) must reproduce the t_eval
    # sampling path to roundoff (dop853's re-expansion amplifies f64
    # roundoff by the Vandermonde condition — hence the looser band)
    y0 = jnp.array([[1.0, 0.0], [0.5, 0.2]])
    ts = jnp.linspace(0.0, 10.0, 37)
    sol = solve_ivp(harmonic_rhs, (0.0, 10.0), y0, method=method, args=1.0,
                    rtol=1e-9, atol=1e-12, dense=512)
    assert bool(jnp.all(sol.status == SUCCESS))
    yi = sol.interpolate(ts)
    ref = solve_ivp(harmonic_rhs, (0.0, 10.0), y0, method=method, args=1.0,
                    rtol=1e-9, atol=1e-12, t_eval=ts)
    np.testing.assert_allclose(np.asarray(yi), np.asarray(ref.ys),
                               rtol=0, atol=tol)
    np.testing.assert_allclose(np.asarray(yi[0, :, 0]),
                               np.cos(np.asarray(ts)), atol=5e-9)


@pytest.mark.parametrize("method", ["dopri5", "dopri853"])
def test_dopri_quad_analytic(method):
    # integral of cos^2 over [0, 10] = 5 + sin(20)/4
    y0 = jnp.array([[1.0, 0.0]])
    sol = solve_ivp(harmonic_rhs, (0.0, 10.0), y0, method=method, args=1.0,
                    rtol=1e-9, atol=1e-12,
                    quad=lambda t, y, a: y[:, 0] ** 2)
    assert int(sol.status[0]) == SUCCESS
    exact = 5.0 + np.sin(20.0) / 4.0
    np.testing.assert_allclose(float(sol.quad[0]), exact, rtol=1e-7)


def test_dopri_quad_event_truncation():
    # terminal event at x = 0 (t* = pi/2): q = integral of cos^2 to pi/2
    from janus_tpu.solve.events import Event
    ev = Event(lambda t, y, a: y[..., 0], terminal=True, direction=-1.0)
    sol = solve_ivp(harmonic_rhs, (0.0, 10.0), jnp.array([[1.0, 0.0]]),
                    method="dopri5", args=1.0, rtol=1e-9, atol=1e-12,
                    events=ev, quad=lambda t, y, a: y[:, 0] ** 2)
    np.testing.assert_allclose(float(sol.quad[0]), np.pi / 4.0, rtol=1e-6)
