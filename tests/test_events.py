"""Event detection tests: analytic crossing oracle, direction filters,
terminal vs recording events, both solver families.

Reference pattern: EventZeroFcn root-finding on dense output
(src/cpp/radaute_impl.hpp:2031-2185)."""

import jax.numpy as jnp
import numpy as np
import pytest

from janus_tpu.solve import solve_ivp, EVENT_TERMINATED, SUCCESS
from janus_tpu.solve.events import Event
from janus_tpu.models.problems import harmonic_rhs, vdp_rhs


@pytest.mark.parametrize("method", ["dopri5", "dopri853", "radau"])
def test_terminal_event_zero_crossing(method):
    """q(t) = cos(t) crosses zero at t = π/2 exactly."""
    omega = 1.0
    y0 = jnp.array([[1.0, 0.0], [1.0, 0.0]])

    def g(t, y, args):
        return y[:, 0]

    sol = solve_ivp(harmonic_rhs, (0.0, 10.0), y0, method=method, args=omega,
                    rtol=1e-10, atol=1e-12, events=Event(g, terminal=True))
    assert bool(jnp.all(sol.status == EVENT_TERMINATED))
    np.testing.assert_allclose(sol.event_t, np.pi / 2, rtol=1e-8)
    np.testing.assert_allclose(sol.t, np.pi / 2, rtol=1e-8)
    np.testing.assert_allclose(sol.event_y[:, 0], 0.0, atol=1e-9)
    assert bool(jnp.all(sol.event_idx == 0))


def test_direction_filter():
    """direction=+1 ignores the falling crossing at π/2, fires at 3π/2."""
    omega = 1.0
    y0 = jnp.array([[1.0, 0.0]])

    def g(t, y, args):
        return y[:, 0]

    sol = solve_ivp(harmonic_rhs, (0.0, 10.0), y0, args=omega,
                    rtol=1e-10, atol=1e-12,
                    events=Event(g, terminal=True, direction=+1.0))
    np.testing.assert_allclose(sol.event_t, 3 * np.pi / 2, rtol=1e-8)


def test_non_terminal_event_records_and_continues():
    omega = 1.0
    y0 = jnp.array([[1.0, 0.0]])

    def g(t, y, args):
        return y[:, 0]

    sol = solve_ivp(harmonic_rhs, (0.0, 10.0), y0, args=omega,
                    rtol=1e-10, atol=1e-12,
                    events=Event(g, terminal=False))
    assert int(sol.status[0]) == SUCCESS          # ran to tf
    np.testing.assert_allclose(sol.t, 10.0)
    np.testing.assert_allclose(sol.event_t, np.pi / 2, rtol=1e-8)  # first hit


def test_multiple_events_earliest_wins():
    omega = 1.0
    y0 = jnp.array([[1.0, 0.0]])

    def g1(t, y, args):          # crosses at 3π/2 (rising q)
        return y[:, 0] + 0.0001 - 1e-4  # == q, avoid alias

    def g2(t, y, args):          # v = -sin crosses zero at π (rising after)
        return y[:, 1] + 0.5     # -sin(t) = -0.5 → t = π/6 ≈ 0.5236

    sol = solve_ivp(harmonic_rhs, (0.0, 10.0), y0, args=omega,
                    rtol=1e-10, atol=1e-12,
                    events=[Event(g1, terminal=True),
                            Event(g2, terminal=True)])
    # g2 fires first at t = π/6
    assert int(sol.event_idx[0]) == 1
    np.testing.assert_allclose(sol.event_t[0], np.pi / 6, rtol=1e-7)


def test_event_per_lane_independent():
    """Different lanes terminate at different event times."""
    omega = 1.0
    y0 = jnp.array([[1.0, 0.0], [0.0, 1.0]])   # cos ; sin

    def g(t, y, args):
        return y[:, 0] - 0.5

    sol = solve_ivp(harmonic_rhs, (0.0, 10.0), y0, args=omega,
                    rtol=1e-10, atol=1e-12, events=Event(g, terminal=True))
    # lane0: cos(t) = 0.5 → t = π/3 ; lane1: sin(t) = 0.5 → t = π/6
    np.testing.assert_allclose(sol.event_t[0], np.pi / 3, rtol=1e-7)
    np.testing.assert_allclose(sol.event_t[1], np.pi / 6, rtol=1e-7)


def test_stiff_event_radau():
    """Event inside a stiff VdP integration."""
    mu = 100.0

    def g(t, y, args):
        return y[:, 0]           # x crosses zero

    sol = solve_ivp(vdp_rhs, (0.0, 200.0), jnp.array([[2.0, 0.0]]),
                    method="radau", args=mu, rtol=1e-8, atol=1e-11,
                    events=Event(g, terminal=True))
    assert int(sol.status[0]) == EVENT_TERMINATED
    np.testing.assert_allclose(sol.event_y[0, 0], 0.0, atol=1e-7)
    from scipy.integrate import solve_ivp as ss
    ev = lambda t, y: y[0]
    ev.terminal = True
    ref = ss(lambda t, y: [y[1], mu * (1 - y[0] ** 2) * y[1] - y[0]],
             (0, 200.0), [2.0, 0.0], method="Radau", rtol=1e-8, atol=1e-11,
             events=ev)
    np.testing.assert_allclose(sol.event_t[0], ref.t_events[0][0], rtol=1e-6)


@pytest.mark.parametrize("method", ["dopri5", "dopri853", "radau", "radaup",
                                    "bdf", "seulex", "rodas"])
def test_terminal_event_with_t_eval(method):
    """events= and t_eval= compose: samples up to t* are dense-output values,
    samples strictly past t* are NaN (scipy's t_eval truncation in static
    shapes), and lanes whose event never fires sample the whole grid."""
    omega = 1.0
    y0 = jnp.array([[1.0, 0.0], [1.0, 0.0]])
    thresh = jnp.array([0.0, -2.0])      # lane1: cos(t) never reaches -2

    def g(t, y, args):
        return y[:, 0] - thresh

    t_eval = jnp.linspace(0.0, 3.0, 13)
    sol = solve_ivp(harmonic_rhs, (0.0, 3.0), y0, method=method, args=omega,
                    rtol=1e-8, atol=1e-10, t_eval=t_eval,
                    events=Event(g, terminal=True))
    assert int(sol.status[0]) == EVENT_TERMINATED
    assert int(sol.status[1]) == SUCCESS
    # seulex locates the root on its quartic interpolant under big
    # extrapolation steps — coarser t* than the collocation methods
    ev_rtol = 5e-5 if method == "seulex" else 1e-6
    np.testing.assert_allclose(sol.event_t[0], np.pi / 2, rtol=ev_rtol)

    ts = np.asarray(t_eval)
    ys = np.asarray(sol.ys)
    exact = np.stack([np.cos(ts), -np.sin(ts)], axis=-1)
    # seulex's quartic interpolant under big extrapolation steps plateaus
    # around 1e-4 at this tolerance (both lanes; not an event artifact)
    dtol = 3e-4 if method == "seulex" else 5e-5
    # lane 0: valid (and accurate) up to t*, NaN strictly past it
    before = ts <= np.pi / 2
    np.testing.assert_allclose(ys[0, before], exact[before], atol=dtol)
    assert np.all(np.isnan(ys[0, ~before]))
    # lane 1 never fires: full grid, full accuracy
    np.testing.assert_allclose(ys[1], exact, atol=dtol)


def test_terminal_event_with_t_eval_reverse_time():
    """Same truncation semantics marching backward: samples at t < t* die."""
    omega = 1.0
    y0 = jnp.array([[1.0, 0.0]])         # at t0=3: integrate back toward 0

    def g(t, y, args):
        return t - 1.5                   # fires at t* = 1.5 on the way down

    t_eval = jnp.linspace(3.0, 0.0, 13)
    sol = solve_ivp(harmonic_rhs, (3.0, 0.0), y0, method="radau", args=omega,
                    rtol=1e-8, atol=1e-10, t_eval=t_eval,
                    events=Event(g, terminal=True))
    assert int(sol.status[0]) == EVENT_TERMINATED
    np.testing.assert_allclose(sol.event_t[0], 1.5, rtol=1e-6)
    ts = np.asarray(t_eval)
    ys = np.asarray(sol.ys)
    alive = ts >= 1.5
    assert np.all(np.isfinite(ys[0, alive]))
    assert np.all(np.isnan(ys[0, ~alive]))


@pytest.mark.parametrize("method", ["dopri5", "radau"])
def test_earlier_nonterminal_does_not_suppress_termination(method):
    """A non-terminal crossing just before a terminal one in the SAME
    accepted step must not eat the terminal crossing (scipy terminates at
    the earliest TERMINAL crossing regardless of earlier non-terminal ones;
    advisor round-3 finding)."""
    omega = 1.0
    y0 = jnp.array([[1.0, 0.0]])

    def g_term(t, y, args):
        return y[:, 0]                       # crosses at pi/2

    def g_rec(t, y, args):
        return y[:, 0] - 1e-3                # crosses ~1e-3 earlier in t

    sol = solve_ivp(harmonic_rhs, (0.0, 10.0), y0, method=method, args=omega,
                    rtol=1e-6, atol=1e-8,
                    events=[Event(g_rec, terminal=False),
                            Event(g_term, terminal=True)])
    assert int(sol.status[0]) == EVENT_TERMINATED
    np.testing.assert_allclose(sol.t[0], np.pi / 2, rtol=1e-5)
    # the terminal crossing is the recorded (truncation) event
    assert int(sol.event_idx[0]) == 1
    np.testing.assert_allclose(sol.event_t[0], np.pi / 2, rtol=1e-5)
