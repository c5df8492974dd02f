"""Variable-order BDF/NDF (orders 1-5) oracle tests.

Reference analog: examples/python/bdf_torch.py:1-129 (orders 1-5 adaptive
prototype) and the vendored scipy BDF (examples/python/bdf_reference.py).
Oracle patterns per SURVEY.md §4: scipy cross-checks at matched tolerance,
order adaptation exercised, dense output and events on the BDF interpolant.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp as ss

from janus_tpu.solve import solve_ivp, Options, SUCCESS, EVENT_TERMINATED
from janus_tpu.solve.events import Event
from janus_tpu.models.problems import vdp_rhs, robertson_rhs, harmonic_rhs


def scipy_vdp(mu, tf, rtol, atol, method="BDF"):
    return ss(lambda t, y: [y[1], mu * (1 - y[0] ** 2) * y[1] - y[0]],
              (0.0, tf), [2.0, 0.0], method=method, rtol=rtol, atol=atol)


def test_stiff_vdp_scipy_parity():
    mu = 1000.0
    ref = scipy_vdp(mu, 2.0, 1e-10, 1e-13, method="Radau")
    sol = solve_ivp(vdp_rhs, (0.0, 2.0), jnp.array([[2.0, 0.0]]),
                    method="bdf", args=mu, rtol=1e-7, atol=1e-10)
    assert int(sol.status[0]) == SUCCESS
    np.testing.assert_allclose(sol.y[0], ref.y[:, -1], rtol=1e-4, atol=1e-6)
    # step count within ~1.5x of scipy's own BDF at the same tolerance
    sp = scipy_vdp(mu, 2.0, 1e-7, 1e-10, method="BDF")
    assert int(sol.stats["nsteps"][0]) < 1.5 * sp.t.size + 50


def test_order_adaptation_exercised():
    """On a long stiff VdP run the order controller must actually climb."""
    mu = 100.0
    sol = solve_ivp(vdp_rhs, (0.0, 50.0), jnp.array([[2.0, 0.0]]),
                    method="bdf", args=mu, rtol=1e-7, atol=1e-10)
    assert int(sol.status[0]) == SUCCESS
    assert int(sol.stats["order"][0]) >= 3
    # and pays far fewer steps than BDF2 at the same tolerance
    sol2 = solve_ivp(vdp_rhs, (0.0, 50.0), jnp.array([[2.0, 0.0]]),
                     method="bdf2", args=mu, rtol=1e-7, atol=1e-10)
    assert int(sol.stats["nsteps"][0]) < 0.7 * int(sol2.stats["nsteps"][0])


def test_robertson_long_horizon():
    y0 = jnp.array([[1.0, 0.0, 0.0]])
    ref = ss(lambda t, y: [-0.04 * y[0] + 1e4 * y[1] * y[2],
                           0.04 * y[0] - 1e4 * y[1] * y[2] - 3e7 * y[1] ** 2,
                           3e7 * y[1] ** 2],
             (0.0, 1e5), [1.0, 0.0, 0.0], method="Radau",
             rtol=1e-10, atol=1e-14)
    sol = solve_ivp(robertson_rhs, (0.0, 1e5), y0, method="bdf",
                    rtol=1e-7, atol=1e-12)
    assert int(sol.status[0]) == SUCCESS
    np.testing.assert_allclose(sol.y[0], ref.y[:, -1], rtol=2e-4, atol=1e-10)


def test_heterogeneous_batch():
    mus = jnp.array([1.0, 10.0, 100.0, 1000.0])
    y0 = jnp.tile(jnp.array([[2.0, 0.0]]), (4, 1))

    sol = solve_ivp(vdp_rhs, (0.0, 3.0), y0, method="bdf", args=mus,
                    rtol=1e-6, atol=1e-9)
    assert bool(jnp.all(sol.status == SUCCESS))
    for i, mu in enumerate(np.asarray(mus)):
        ref = scipy_vdp(float(mu), 3.0, 1e-10, 1e-13, method="Radau")
        np.testing.assert_allclose(sol.y[i], ref.y[:, -1],
                                   rtol=5e-4, atol=5e-6)


def test_dense_output():
    t_eval = jnp.linspace(0.0, 10.0, 41)
    sol = solve_ivp(harmonic_rhs, (0.0, 10.0), jnp.array([[1.0, 0.0]]),
                    method="bdf", args=1.0, rtol=1e-8, atol=1e-11,
                    t_eval=t_eval)
    assert int(sol.status[0]) == SUCCESS
    np.testing.assert_allclose(sol.ys[0, :, 0], np.cos(np.asarray(t_eval)),
                               atol=2e-5)


def test_events_terminal():
    # harmonic oscillator: x crosses zero at t = pi/2
    ev = Event(lambda t, y, args: y[..., 0], terminal=True, direction=-1.0)
    sol = solve_ivp(harmonic_rhs, (0.0, 10.0), jnp.array([[1.0, 0.0]]),
                    method="bdf", args=1.0, rtol=1e-8, atol=1e-11, events=ev)
    assert int(sol.status[0]) == EVENT_TERMINATED
    np.testing.assert_allclose(float(sol.event_t[0]), np.pi / 2, atol=1e-5)
    np.testing.assert_allclose(float(sol.t[0]), np.pi / 2, atol=1e-5)


def test_reverse_time():
    sol = solve_ivp(harmonic_rhs, (2.0, 0.0),
                    jnp.array([[np.cos(2.0), -np.sin(2.0)]]),
                    method="bdf", args=1.0, rtol=1e-8, atol=1e-11)
    assert int(sol.status[0]) == SUCCESS
    np.testing.assert_allclose(sol.y[0], [1.0, 0.0], atol=1e-5)


def test_classic_bdf_toggle():
    """ndf=False (classical BDF) must also integrate correctly."""
    from janus_tpu.solve.ndf import solve_bdf
    mu = 100.0
    ref = scipy_vdp(mu, 2.0, 1e-10, 1e-13, method="Radau")
    sol = solve_bdf(vdp_rhs, 0.0, 2.0, jnp.array([[2.0, 0.0]]), args=mu,
                    options=Options(rtol=1e-7, atol=1e-10), ndf=False)
    assert int(sol.status[0]) == SUCCESS
    np.testing.assert_allclose(sol.y[0], ref.y[:, -1], rtol=1e-4, atol=1e-6)


def test_analytic_jacobian_path():
    mu = 1000.0

    def jac(t, y, args):
        x, v = y[..., 0], y[..., 1]
        z = jnp.zeros_like(x)
        row0 = jnp.stack([z, jnp.ones_like(x)], axis=-1)
        row1 = jnp.stack([-2 * mu * x * v - 1.0, mu * (1 - x * x)], axis=-1)
        return jnp.stack([row0, row1], axis=-2)

    ref = scipy_vdp(mu, 2.0, 1e-10, 1e-13, method="Radau")
    sol = solve_ivp(vdp_rhs, (0.0, 2.0), jnp.array([[2.0, 0.0]]),
                    method="bdf", args=mu, rtol=1e-7, atol=1e-10, jac=jac)
    assert int(sol.status[0]) == SUCCESS
    np.testing.assert_allclose(sol.y[0], ref.y[:, -1], rtol=1e-4, atol=1e-6)
